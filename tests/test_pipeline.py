"""Full-pipeline end-to-end test: all four TE classes on one synthetic genome.

This is the framework's analog of the reference's demo acceptance test
(README.md:146-160): run the whole pipeline and check the six expected
output files exist and contain the planted families.
"""

import os

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import encode_seq, read_fasta
from hite_tpu.pipeline.coarse import CoarseParams
from hite_tpu.pipeline.run import run_pipeline
from hite_tpu.utils import intervals as iv


def _build_genome():
    rng = np.random.default_rng(99)
    bg = rng.integers(0, 4, 260_000).astype(np.uint8)

    def plant(te, starts, tsd=0, host_at=False):
        for pos in starts:
            copy = te.copy()
            muts = rng.random(len(copy)) < 0.01
            copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
            if tsd:
                t = rng.integers(0, 4, tsd).astype(np.uint8)
                bg[pos - tsd : pos] = t
                bg[pos + len(copy) : pos + len(copy) + tsd] = t
            if host_at:
                bg[pos - 1] = 0
                bg[pos + len(copy)] = 3
            bg[pos : pos + len(copy)] = copy

    # TIR element: 20bp TIR termini + 5bp TSD
    tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    while tir_t[0] == 3 and tir_t[1] == 2:
        tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    tir_te = np.concatenate([tir_t, rng.integers(0, 4, 460).astype(np.uint8),
                             (3 - tir_t)[::-1]])
    tir_starts = [10_000, 35_000, 60_000, 85_000, 110_000, 135_000]
    plant(tir_te, tir_starts, tsd=5)

    # Helitron: LCV head + CTAGT tail, A|T host site
    hel_te = np.concatenate([
        encode_seq("TCTCTACTA"), rng.integers(0, 4, 700).astype(np.uint8),
        encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")])
    hel_starts = [20_000, 48_000, 75_000, 98_000]
    plant(hel_te, hel_starts, host_at=True)

    # SINE: 280bp + polyA tail + 12bp TSD
    sine_te = np.concatenate([rng.integers(0, 4, 280).astype(np.uint8),
                              np.zeros(14, np.uint8)])
    sine_starts = [15_000, 42_000, 67_000, 91_000, 118_000, 142_000]
    plant(sine_te, sine_starts, tsd=12)

    # LTR element: 250bp TG..CA LTRs + 2.2kb interior + 5bp TSD
    ltr_t = rng.integers(0, 4, 250).astype(np.uint8)
    ltr_t[0], ltr_t[1], ltr_t[-2], ltr_t[-1] = 3, 2, 1, 0
    ltr_te = np.concatenate([ltr_t, rng.integers(0, 4, 2200).astype(np.uint8),
                             ltr_t])
    ltr_starts = [160_000, 200_000, 240_000 - len(ltr_te) - 1000]
    plant(ltr_te, ltr_starts, tsd=5)

    genome = Genome.from_dict({"chr1": bg})
    planted = {
        "tir": np.array([[s, s + len(tir_te)] for s in tir_starts]),
        "helitron": np.array([[s, s + len(hel_te)] for s in hel_starts]),
        "non_ltr": np.array([[s, s + len(sine_te)] for s in sine_starts]),
        "ltr": np.array([[s, s + len(ltr_te)] for s in ltr_starts]),
    }
    return genome, planted


def test_pipeline_clean_stage_drops_redundant_contig(tmp_path):
    """Stage 0 genome cleaning (reference genome_clean.py at main.py:435-441):
    a contig >=95% covered by a longer contig never enters discovery."""
    from hite_tpu.utils.log import STAGE_TIMES

    rng = np.random.default_rng(5)
    big = rng.integers(0, 4, 40_000).astype(np.uint8)
    dup = big[1_000:11_000].copy()
    genome = Genome.from_dict({"c1": big, "c2": dup})
    cfg = PipelineConfig(te_type="tir",
                         align=AlignConfig(fixed_extend_base_threshold=2000))

    # opt-out first (STAGE_TIMES is a process-global accumulator)
    STAGE_TIMES.clear()
    run_pipeline(genome, cfg.replace(clean_genome=False),
                 coarse_params=CoarseParams(seg_len=16_384, pair_batch=16))
    assert "pipeline.clean" not in STAGE_TIMES

    STAGE_TIMES.clear()
    result = run_pipeline(genome, cfg, out_dir=str(tmp_path / "o"),
                          coarse_params=CoarseParams(seg_len=16_384,
                                                     pair_batch=16))
    # the redundant contig was dropped before discovery: the clean stage ran
    # and no accepted TE can live past the surviving contig
    assert "pipeline.clean" in result.metrics["stage_times"]
    for s, e in (result.tir.accepted.intervals if result.tir else []):
        assert e <= 40_000 + 64


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    genome, planted = _build_genome()
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    out = str(tmp_path / "out")
    result = run_pipeline(genome, cfg, out_dir=out,
                          coarse_params=CoarseParams(seg_len=32_768,
                                                     pair_batch=16))

    # the six reference acceptance outputs exist
    for f in ("confident_tir.fa", "confident_helitron.fa",
              "confident_non_ltr.fa", "confident_other.fa",
              "confident_ltr_cut.fa.cons", "confident_TE.cons.fa"):
        assert os.path.exists(os.path.join(out, f)), f

    merged = read_fasta(os.path.join(out, "confident_TE.cons.fa"))
    assert len(merged) >= 3, list(merged)

    # every planted class was detected
    assert len(result.tir.accepted) >= 1
    assert len(result.helitron.accepted) >= 1
    assert len(result.non_ltr.accepted) >= 1
    assert len(result.ltr.records) >= 1

    # detected intervals actually cover planted loci
    for key, res_iv in (
        ("tir", result.tir.accepted.intervals),
        ("helitron", result.helitron.accepted.intervals),
        ("non_ltr", result.non_ltr.accepted.intervals),
        ("ltr", result.ltr.intact_intervals),
    ):
        cov = iv.coverage_fraction(res_iv, planted[key])
        assert (cov > 0.9).any(), (key, res_iv, planted[key])

    # intact LTR list written with insertion times
    lines = open(os.path.join(out, "intact_LTR.list")).readlines()
    assert len(lines) >= 2
