"""Planted-truth accuracy floors on the bench substrate (VERDICT r3 #2).

The reference's primary quality metric is base-level sensitivity /
precision / F1 of the produced library's annotation against a curated
truth (`module/lib_evaluation.py:157-168`).  bench.py computes the same
numbers against the planted truth on every perf run; this test pins
floors on a small clean substrate so a regression in any discovery /
verification / library stage fails CI rather than just lowering an
unasserted number.
"""

import numpy as np

from bench import accuracy_metrics, build_bench_genome
from hite_tpu.config import AlignConfig, PipelineConfig
from hite_tpu.pipeline.coarse import CoarseParams
from hite_tpu.pipeline.run import run_pipeline


def test_bench_substrate_accuracy_floors(tmp_path):
    # 2 Mbp = the bench's safety-phase substrate at its real TE density
    # (~6%).  Shrinking the genome further while keeping enough copies
    # per family raises density past ~15%, where same-family neighbors
    # fall inside the MSA frame flanks and flank-homology legitimately
    # stops breaking at boundaries — a hard-case regime (measured: 600 kb
    # => Helitron/SINE modules reject everything), not the clean floor.
    genome, truth = build_bench_genome(2_000_000)
    assert len(truth["intervals"]) > 50
    assert len(truth["families"]) == 11      # 3 TIR + 2 Hel + 2 SINE + 4 LTR

    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=131_072, pair_batch=16, stride=4,
                          max_hits=4)
    result = run_pipeline(genome, cfg, out_dir=str(tmp_path),
                          coarse_params=params)
    acc = accuracy_metrics(genome, result, truth, cfg)
    # clean substrate floors: every planted family has >=8 near-identical
    # copies (except LTR at 4), so the library must recover essentially
    # all planted bases, and the annotation must not invent repeats
    assert acc["sensitivity"] >= 0.90, acc
    assert acc["precision"] >= 0.90, acc
    assert acc["F1"] >= 0.90, acc


def test_hard_substrate_shape():
    """hard=True plants the adversarial cases (nested, truncated, solo
    LTR, tandem arrays) with a consistent truth table."""
    genome, truth = build_bench_genome(600_000, hard=True)
    _g2, clean = build_bench_genome(600_000, hard=False)
    assert len(truth["intervals"]) > len(clean["intervals"]) + 20
    assert set(truth["classes"]) == {"TIR", "Helitron", "SINE", "LTR"}
    iv = truth["intervals"]
    assert (iv[:, 1] > iv[:, 0]).all()
    assert iv.min() >= 0 and iv.max() <= len(genome.flat)
    # same family consensi: the hard cases reuse the clean families
    assert truth["families"].keys() == clean["families"].keys()
