"""Non-LTR (SINE/LINE) module end-to-end test."""

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover
from hite_tpu.pipeline.non_ltr import run_non_ltr_detection


def _make_sine_genome():
    rng = np.random.default_rng(21)
    body = rng.integers(0, 4, 280).astype(np.uint8)
    tail = np.zeros(14, np.uint8)                   # polyA tail
    te = np.concatenate([body, tail])
    bg = rng.integers(0, 4, 100_000).astype(np.uint8)
    starts = [12_000, 30_000, 48_000, 66_000, 71_000, 90_000]
    for pos in starts:
        copy = te.copy()
        muts = rng.random(len(copy) - 14) < 0.01    # keep the tail clean
        copy[:-14][muts] = (copy[:-14][muts] + rng.integers(1, 4, muts.sum())) % 4
        tsd = rng.integers(0, 4, 12).astype(np.uint8)   # 12bp TSD
        bg[pos - 12 : pos] = tsd
        bg[pos + len(copy) : pos + len(copy) + 12] = tsd
        bg[pos : pos + len(copy)] = copy
    return Genome.from_dict({"chr1": bg}), starts, len(te)


@pytest.mark.slow
def test_non_ltr_end_to_end():
    genome, starts, te_len = _make_sine_genome()
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    cands = coarse_discover(genome, cfg.align,
                            CoarseParams(seg_len=16_384, pair_batch=8))
    assert len(cands) >= 1
    result = run_non_ltr_detection(genome, cands, cfg)
    assert len(result.accepted) >= 1, "planted SINE family not detected"
    matched = any(
        any(abs(int(a_s) - p) <= 15 and abs(int(a_e) - (p + te_len)) <= 20
            for p in starts)
        for a_s, a_e in result.accepted.intervals)
    assert matched, (result.accepted.intervals, starts)
    assert result.accepted.meta["te_type"][0] == "SINE"
