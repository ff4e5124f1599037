"""Library evaluation (BM_HiTE equivalent).

Re-implements `module/lib_evaluation.py`: align both the curated ("gold")
library and the test library to the genome, then score base-level overlap:
TP = genome bases covered by both annotations (with >= coverage_threshold
reciprocal overlap at the hit level in the reference; base-level here,
which the reference's 100kb-segment binning approximates), FP = test-only,
FN = gold-only.  Reports sensitivity, precision and F1 = 2TP/(2TP+FP+FN)
(`lib_evaluation.py:157-168`).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.annotate import annotate_genome
from hite_tpu.pipeline.copies import GenomeIndex
from hite_tpu.utils import intervals as iv
from hite_tpu.utils.log import logger


def _hits_to_flat_intervals(genome: Genome, hits) -> np.ndarray:
    out = []
    name_to_start = {n: int(s) for n, s in zip(genome.names, genome.starts)}
    for h in hits:
        base = name_to_start[h.contig]
        out.append((base + h.start - 1, base + h.end))
    return np.array(out, np.int64).reshape(-1, 2)


def evaluate_library(
    genome: Genome,
    test_lib: Dict[str, np.ndarray],
    gold_lib: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
) -> Dict[str, float]:
    """Base-level TP/FP/FN/sensitivity/precision/F1 of test vs gold."""
    gindex = gindex or GenomeIndex(genome, cfg.align)
    test_hits = annotate_genome(genome, test_lib, cfg, gindex)
    gold_hits = annotate_genome(genome, gold_lib, cfg, gindex)
    test_iv = iv.merge(_hits_to_flat_intervals(genome, test_hits))
    gold_iv = iv.merge(_hits_to_flat_intervals(genome, gold_hits))

    gold_bp = iv.total_length(gold_iv)
    test_bp = iv.total_length(test_iv)
    # TP = |test ∩ gold| via coverage of gold by test
    if len(gold_iv) and len(test_iv):
        cov = iv.coverage_fraction(gold_iv, test_iv)
        tp = int(np.sum(cov * (gold_iv[:, 1] - gold_iv[:, 0])))
    else:
        tp = 0
    fn = gold_bp - tp
    fp = test_bp - tp
    sens = tp / gold_bp if gold_bp else 0.0
    prec = tp / test_bp if test_bp else 0.0
    f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    metrics = dict(TP=tp, FP=fp, FN=fn, sensitivity=sens, precision=prec, F1=f1)
    logger.info("BM_HiTE: %s", metrics)
    return metrics
