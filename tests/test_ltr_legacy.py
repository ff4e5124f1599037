"""Legacy LTR path tests (--use_FiLTR 0): harvest seeds + retriever filters.

Reference parity targets: LTRharvest exact-repeat seeding (suffix-array
maximal repeats >= 30 bp) and LTR_retriever's strict TSD/motif requirement
(`/root/reference/main.py:186-242`, `module/Util.py:569-704`).
"""

import numpy as np

from hite_tpu.config import AlignConfig, PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.ltr import LTRRecord
from hite_tpu.pipeline.ltr_legacy import (
    harvest_exact_seeds, retriever_filter, run_legacy_ltr_detection)
from tests.test_ltr import _make_ltr_genome


def _cfg():
    return PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))


def test_legacy_detects_planted_elements():
    genome, starts, el_len, ltr_len = _make_ltr_genome()
    result = run_legacy_ltr_detection(genome, _cfg())
    assert len(result.records) >= 1, "legacy path found no LTR elements"
    matched = 0
    for r in result.records:
        for p in starts:
            if abs(r.start - p) <= 10 and abs(r.end - (p + el_len)) <= 10:
                matched += 1
                assert abs((r.lltr_end - r.lltr_start) - ltr_len) <= 10
                assert r.identity > 0.9
                # retriever filter guarantees structural evidence
                assert r.tsd_len == 5
    assert matched >= 1, [(r.start, r.end) for r in result.records]


def test_harvest_seeds_are_exact_repeats():
    """Seeds must come from EXACT repeats: two copies of a shared block
    with a mismatch every 20 bp (95% identity, chainable by the FiLTR
    generator) must yield no long exact seed; identical copies must."""
    rng = np.random.default_rng(51)
    bg = rng.integers(0, 4, 40_000).astype(np.uint8)
    block = rng.integers(0, 4, 300).astype(np.uint8)
    noisy = block.copy()
    noisy[::20] = (noisy[::20] + 1) % 4     # break every exact run at <=20bp
    bg[10_000:10_300] = block
    bg[13_000:13_300] = noisy
    g_noisy = Genome.from_dict({"chr1": bg})
    seeds = harvest_exact_seeds(g_noisy, _cfg(), seed_len=30)
    near = [s for s in seeds if abs(s[0] - 10_000) < 400]
    assert not near, near

    bg2 = bg.copy()
    bg2[13_000:13_300] = block              # exact second copy
    g_exact = Genome.from_dict({"chr1": bg2})
    seeds2 = harvest_exact_seeds(g_exact, _cfg(), seed_len=30)
    near2 = [s for s in seeds2 if abs(s[0] - 10_000) < 400
             and abs((s[2] - s[0]) - 3000) < 200]
    assert near2, seeds2


def test_retriever_filter_requires_tsd_or_motif():
    rng = np.random.default_rng(52)
    bg = rng.integers(0, 4, 4_000).astype(np.uint8)
    # record A: TG...CA motif at its ends, no TSD; near-identical LTR pair
    bg[1750:2000] = bg[1000:1250]
    bg[1000], bg[1001] = 3, 2
    bg[1998], bg[1999] = 1, 0
    # record B (2500..3400): identical LTR pair but NO motif and no TSD
    bg[3200:3400] = bg[2500:2700]
    bg[2500], bg[2501] = 0, 0
    bg[3398], bg[3399] = 3, 3
    bg[2494:2500] = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    bg[3400:3406] = np.array([3, 2, 1, 0, 3, 2], np.uint8)
    genome = Genome.from_dict({"chr1": bg})
    rec_a = LTRRecord(1000, 2000, 1000, 1250, 1750, 2000, 0.95, 1e6)
    rec_b = LTRRecord(2500, 3400, 2500, 2700, 3200, 3400, 0.95, 1e6)
    kept = retriever_filter(genome, [rec_a, rec_b])
    assert rec_a in kept and rec_b not in kept


def test_retriever_filter_rejects_misaligned_termini():
    """LTR_retriever's boundary-agreement check (`Util.py:697-704`,
    ltrharvest -vic): a HIGH-IDENTITY pair whose reported boundaries are
    shifted into the flanks aligns at an internal offset, not
    end-to-end, and must be rejected even though TSD/motif look fine."""
    rng = np.random.default_rng(53)
    bg = rng.integers(0, 4, 6_000).astype(np.uint8)
    ltr = rng.integers(0, 4, 250).astype(np.uint8)
    ltr[0], ltr[1], ltr[-2], ltr[-1] = 3, 2, 1, 0
    # true element: LTRs at 1000..1250 and 2750..3000
    bg[1000:1250] = ltr
    bg[2750:3000] = ltr
    genome = Genome.from_dict({"chr1": bg})

    good = LTRRecord(1000, 3000, 1000, 1250, 2750, 3000, 0.98, 1e5,
                     tsd_len=5)
    # boundaries shifted 60 bp into the left flank / right interior: the
    # underlying repeat is still there (high identity on the overlap)
    # but lLTR-vs-rLTR only aligns at an internal 60 bp offset
    shifted = LTRRecord(940, 2940, 940, 1190, 2690, 2940, 0.98, 1e5,
                        tsd_len=5)
    kept = retriever_filter(genome, [good, shifted])
    assert good in kept and shifted not in kept


def test_pipeline_routes_legacy_path():
    """run_pipeline with use_filtr=False must route through the legacy
    module (structural-only) and still produce a well-formed result."""
    from hite_tpu.config import LTRConfig
    from hite_tpu.pipeline.run import run_pipeline

    genome, starts, el_len, _ = _make_ltr_genome(n_elements=3)
    cfg = PipelineConfig(
        align=AlignConfig(fixed_extend_base_threshold=2000),
        ltr=LTRConfig(use_filtr=False),
        te_type="ltr", annotate=False)
    result = run_pipeline(genome, cfg)
    assert result.ltr is not None
    hits = [r for r in result.ltr.records
            if any(abs(r.start - p) <= 10 for p in starts)]
    assert hits, [(r.start, r.end) for r in result.ltr.records]
