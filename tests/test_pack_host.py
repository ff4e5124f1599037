"""Host-side 2-bit packed genome storage (ops.pack2.PackedFlat).

Parity target: every host consumer of Genome.flat/masked (len, step-1
slice reads, masking writes, segment_view, device upload) behaves
identically packed and unpacked — the reference's >=2 GB genome tier
(`/root/reference/main.py:328-329`) maps to this storage mode.
"""

import numpy as np
import pytest

from hite_tpu.genome import Genome
from hite_tpu.ops.pack2 import PackedFlat


def _pair(seed=11, n=40_000):
    rng = np.random.default_rng(seed)
    seqs = {"chr1": rng.integers(0, 4, n).astype(np.uint8),
            "chr2": rng.integers(0, 5, n // 2).astype(np.uint8)}
    g8 = Genome.from_dict({k: v.copy() for k, v in seqs.items()})
    gp = Genome.from_dict({k: v.copy() for k, v in seqs.items()})
    gp.pack_host()
    return g8, gp


def test_packedflat_roundtrip_and_reads():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 5, 10_001).astype(np.uint8)
    pf = PackedFlat.from_uint8(codes)
    assert len(pf) == len(codes)
    assert np.array_equal(pf.unpack_all(), codes)
    for s, e in [(0, 7), (3, 3), (13, 997), (9990, 10_001), (0, 10_001)]:
        assert np.array_equal(pf[s:e], codes[s:e]), (s, e)
    assert pf[17] == codes[17]
    assert pf[-1] == codes[-1]
    # memory: 3 bits/bp vs 8
    assert pf.nbytes < 0.4 * codes.nbytes


def test_packedflat_mask_writes():
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 4, 4096).astype(np.uint8)
    ref = codes.copy()
    pf = PackedFlat.from_uint8(codes)
    for s, e in [(5, 6), (100, 103), (1000, 1200), (4090, 4096), (7, 7)]:
        ref[s:e] = 4
        pf[s:e] = 4
    pos = rng.integers(0, 4096, 50)
    ref[pos] = 4
    pf[pos] = 4
    assert np.array_equal(pf.unpack_all(), ref)
    with pytest.raises(ValueError):
        pf[0:4] = 1          # general writes are not supported by design


def test_genome_parity_packed_vs_uint8():
    g8, gp = _pair()
    assert len(gp.flat) == len(g8.flat)
    assert np.array_equal(gp.extract(100, 900, flank=50),
                          g8.extract(100, 900, flank=50))
    assert np.array_equal(gp.segment_view(8192), g8.segment_view(8192))
    d8, L8 = g8.device_flat_padded()
    dp, Lp = gp.device_flat_padded()
    assert L8 == Lp
    assert np.array_equal(np.asarray(d8), np.asarray(dp))

    for g in (g8, gp):
        g.mask_intervals([(500, 1500), (40_100, 40_130)])
        g.masked[np.array([7, 9, 11])] = 4
    assert np.array_equal(gp.segment_view(8192, use_masked=True),
                          g8.segment_view(8192, use_masked=True))
    d8m, _ = g8.device_flat_padded(use_masked=True)
    dpm, _ = gp.device_flat_padded(use_masked=True)
    assert np.array_equal(np.asarray(d8m), np.asarray(dpm))


def test_from_fasta_packed_flag(tmp_path):
    from hite_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(8)
    seq = rng.integers(0, 4, 5000).astype(np.uint8)
    path = str(tmp_path / "g.fa")
    write_fasta(path, {"c": seq})
    g = Genome.from_fasta(path, packed=True)
    assert isinstance(g.flat, PackedFlat)
    assert np.array_equal(g.extract(0, 5000), seq)
    g2 = Genome.from_fasta(path)          # below auto threshold: uint8
    assert isinstance(g2.flat, np.ndarray)


def test_pipeline_on_packed_genome():
    """End-to-end pipeline on a host-packed genome: every host consumer
    (tandem mask writes, segment_view, coarse slices, extract) must work
    against PackedFlat, and results must match the uint8 run."""
    import numpy as np

    from hite_tpu.config import AlignConfig, PipelineConfig
    from hite_tpu.genome import Genome
    from hite_tpu.pipeline.coarse import CoarseParams
    from hite_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(13)
    t = rng.integers(0, 4, 20).astype(np.uint8)
    while t[0] == 3 and t[1] == 2:
        t = rng.integers(0, 4, 20).astype(np.uint8)
    te = np.concatenate([t, rng.integers(0, 4, 460).astype(np.uint8),
                         (3 - t)[::-1]])
    bg = rng.integers(0, 4, 80_000).astype(np.uint8)
    for pos in (10_000, 30_000, 50_000, 70_000):
        copy = te.copy()
        muts = rng.random(len(copy)) < 0.02
        copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
        tsd = rng.integers(0, 4, 5).astype(np.uint8)
        bg[pos - 5 : pos] = tsd
        bg[pos + len(copy) : pos + len(copy) + 5] = tsd
        bg[pos : pos + len(copy)] = copy

    cfg = PipelineConfig(
        align=AlignConfig(fixed_extend_base_threshold=2000),
        te_type="tir", annotate=False)
    params = CoarseParams(seg_len=16_384)

    res8 = run_pipeline(Genome.from_dict({"chr1": bg.copy()}), cfg,
                        coarse_params=params)
    gp = Genome.from_dict({"chr1": bg.copy()})
    gp.pack_host()
    resp = run_pipeline(gp, cfg, coarse_params=params)
    lib8 = {k: v.tobytes() for k, v in res8.libs["merged"].items()}
    libp = {k: v.tobytes() for k, v in resp.libs["merged"].items()}
    assert lib8 and lib8 == libp
