"""End-to-end TIR module test on a synthetic genome with planted elements."""

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import synthetic_genome
from hite_tpu.io.fasta import decode_seq
from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover
from hite_tpu.pipeline.tir import run_tir_detection, make_tir_judge
from hite_tpu.utils import intervals as iv


def make_tir_te(rng, core_len=500, tir_len=20):
    while True:
        tir = rng.integers(0, 4, tir_len).astype(np.uint8)
        if not (tir[0] == 3 and tir[1] == 2):  # avoid LTR-like TG start
            break
    core = rng.integers(0, 4, core_len).astype(np.uint8)
    rc = (3 - tir)[::-1].astype(np.uint8)
    te = np.concatenate([tir, core, rc])
    return "".join("ACGTN"[c] for c in te)


@pytest.fixture(scope="module")
def tir_genome():
    rng = np.random.default_rng(11)
    tir_te = make_tir_te(rng)
    plain = "".join("ACGTN"[c] for c in rng.integers(0, 4, 400))
    genome, ins = synthetic_genome(
        100_000, [tir_te, plain], [8, 6], seed=5, mutation_rate=0.01,
        tsd_lens=[5, 0],
    )
    return genome, ins, len(tir_te)


def test_tir_end_to_end(tir_genome):
    genome, ins, te_len = tir_genome
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=16_384, pair_batch=8)
    cands = coarse_discover(genome, cfg.align, params)
    assert len(cands) >= 2

    result = run_tir_detection(genome, cands, cfg)
    assert len(result.accepted) >= 1, "planted TIR family not detected"

    planted_tir = np.array([[s, e] for ti, s, e in ins if ti == 0])
    planted_plain = np.array([[s, e] for ti, s, e in ins if ti == 1])

    # at least one accepted interval matches a planted TIR copy closely
    matched = False
    for a_s, a_e in result.accepted.intervals:
        for p_s, p_e in planted_tir:
            if abs(int(a_s) - p_s) <= 10 and abs(int(a_e) - p_e) <= 10:
                matched = True
    assert matched, (result.accepted.intervals, planted_tir)

    # the plain repeat family (no TIR/TSD) must not be called TIR
    if len(result.accepted) > 0:
        cov = iv.coverage_fraction(planted_plain, result.accepted.intervals)
        assert (cov < 0.5).all(), cov

    # consensus sequence resembles the planted TE
    assert any(abs(len(c) - te_len) < 30 for c in result.consensus)
