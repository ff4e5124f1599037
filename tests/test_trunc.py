"""Long-copy truncation in the family MSA engine (Util.py:8116-8124).

Families whose frames exceed 2 x long_copy_trunc are analyzed as
head+tail concatenations: the matrix width collapses to the 1024 bucket
regardless of element length, while boundary calls and judge verdicts
match the untruncated analysis.
"""

import dataclasses

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import synthetic_genome
from hite_tpu.pipeline.boundary_adjust import (
    _prep_family, adjust_candidate, analyze_family,
)
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.pipeline.tir import make_tir_judge


def _long_tir_genome(core_len):
    rng = np.random.default_rng(23)
    tir = rng.integers(0, 4, 20).astype(np.uint8)
    tir[0] = 0  # avoid TG start
    core = rng.integers(0, 4, core_len).astype(np.uint8)
    te = np.concatenate([tir, core, (3 - tir)[::-1]])
    te_str = "".join("ACGTN"[c] for c in te)
    genome, ins = synthetic_genome(
        80_000, [te_str], [8], seed=3, mutation_rate=0.01, tsd_lens=[5])
    return genome, ins, len(te)


def _family(genome, ins, cfg):
    s, e = ins[0][1], ins[0][2]
    finder = CopyFinder(GenomeIndex(genome, cfg.align))
    copies = finder.find_copies([genome.extract(s, e)], min_coverage=0.9,
                                max_copies=cfg.msa.max_copies)[0]
    assert len(copies) >= 6
    return (s, e), copies


def test_trunc_matrix_width_and_verdict_match_full():
    genome, ins, te_len = _long_tir_genome(3000)
    cfg = PipelineConfig()
    interval, copies = _family(genome, ins, cfg)

    full_msa = dataclasses.replace(cfg.msa, long_copy_trunc=1 << 20)
    prep_t = _prep_family(genome, interval, copies, cfg.msa)
    prep_f = _prep_family(genome, interval, copies, full_msa)
    assert prep_t[8] == 512 and prep_t[6] == 1024       # trunc_at, width
    assert prep_f[8] == 0 and prep_f[6] >= 4096
    # 30kb-class families collapse ~30x; here 4096 -> 1024
    assert prep_f[6] // prep_t[6] >= 4

    judge = make_tir_judge(plant=True)
    res_t = adjust_candidate(genome, interval, copies, cfg.msa, judge,
                             min_copies=5)
    res_f = adjust_candidate(genome, interval, copies, full_msa, judge,
                             min_copies=5)
    assert res_t.accepted and res_f.accepted
    assert abs(res_t.start - res_f.start) <= 5
    assert abs(res_t.end - res_f.end) <= 5
    # stitched consensus spans the full element
    assert abs(len(res_t.consensus) - te_len) <= 0.02 * te_len


def test_trunc_analysis_boundaries_map_back():
    genome, ins, te_len = _long_tir_genome(2500)
    cfg = PipelineConfig()
    interval, copies = _family(genome, ins, cfg)
    fa, center_start = analyze_family(genome, interval, copies, cfg.msa)
    assert fa.trunc_at == 512
    assert fa.left_found and fa.right_found
    # matrix is the two 512-halves
    assert fa.M.shape[1] == 1024
    # right boundary sits in the tail half and maps to the planted end
    mapped_end = center_start + fa.right_pos + fa.trunc_gap
    assert abs(mapped_end - interval[1]) <= 60
