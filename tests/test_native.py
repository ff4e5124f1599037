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
