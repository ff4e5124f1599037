"""Native C++ runtime tests (built lazily with make; skipped if unbuildable)."""

import numpy as np
import pytest

from hite_tpu.native import runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native library unavailable")


def test_native_fasta_matches_python(tmp_path):
    import hite_tpu.io.fasta as pf

    path = str(tmp_path / "x.fa")
    with open(path, "w") as fh:
        fh.write(">chr1 desc here\nACGTNacgtRYK\nACGT\n>tig2\nTTTT\n")
    native = runtime.read_fasta(path)
    saved = pf._NATIVE_READER
    pf._NATIVE_READER = None
    try:
        py = pf.read_fasta(path)
    finally:
        pf._NATIVE_READER = saved
    assert list(native) == list(py)
    for k in py:
        assert (native[k] == py[k]).all()


def test_native_merge_intervals():
    m = runtime.merge_intervals(np.array([[5, 10], [0, 6], [20, 30], [29, 35]]))
    assert m.tolist() == [[0, 10], [20, 35]]
    m2 = runtime.merge_intervals(np.array([[0, 5], [7, 9]]), gap=2)
    assert m2.tolist() == [[0, 9]]


def test_fasta_io_uses_native_when_available(tmp_path):
    import hite_tpu.io.fasta as pf

    pf._NATIVE_READER = False  # force re-resolution
    path = str(tmp_path / "y.fa")
    with open(path, "w") as fh:
        fh.write(">a\nACGT\n")
    out = pf.read_fasta(path)
    assert pf.decode_seq(out["a"]) == "ACGT"
    assert pf._NATIVE_READER is not None


def test_native_fmea_chain_matches_python():
    import time

    from hite_tpu.native import runtime as native_rt
    from hite_tpu.ops.chain import chain_hsps_host_py

    if not native_rt.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    for n in (1, 7, 500, 20_000):
        # clustered HSPs along several diagonals, interleaved copies
        base_q = np.sort(rng.integers(0, 500_000, n))
        diag = rng.integers(0, 5, n) * 40_000 + rng.integers(-20, 20, n)
        qs = base_q
        qe = qs + rng.integers(30, 300, n)
        ss = qs + diag
        se = ss + (qe - qs)
        for T in (200, 2000):
            want = chain_hsps_host_py(qs, qe, ss, se, extend_threshold=T,
                                      min_len=80)
            got = native_rt.fmea_chain(qs, qe, ss, se, T, 80)
            assert got is not None
            # same multiset of chains (emit order may differ)
            w = sorted(map(tuple, want)); g = sorted(map(tuple, got))
            assert w == g, (n, T, len(w), len(g))


def test_native_fmea_chain_speed():
    from hite_tpu.native import runtime as native_rt

    if not native_rt.available():
        pytest.skip("native lib unavailable")
    import time

    from hite_tpu.ops.chain import chain_hsps_host_py

    rng = np.random.default_rng(1)
    n = 30_000
    qs = np.sort(rng.integers(0, 2_000_000, n))
    qe = qs + rng.integers(30, 300, n)
    ss = qs + rng.integers(0, 10, n) * 100_000
    se = ss + (qe - qs)
    t0 = time.perf_counter()
    native_rt.fmea_chain(qs, qe, ss, se, 2000, 80)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain_hsps_host_py(qs, qe, ss, se, extend_threshold=2000, min_len=80)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
