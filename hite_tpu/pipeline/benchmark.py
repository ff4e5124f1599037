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


# Species -> curated Repbase-derived library filename, as shipped by the
# reference (`module/benchmarking.py:176-206`).  The libraries themselves are
# Repbase data and are NOT vendored; callers point `library_dir` at a
# directory containing them (e.g. the reference checkout's `library/`).
SPECIES_LIBS: Dict[str, str] = {
    "dmel": "drorep.ref",
    "rice": "oryrep.ref",
    "cb": "cbrrep.ref",
    "zebrafish": "zebrep.no_ltr.ref",
    "maize": "maize.ref",
    "ath": "athrep.ref",
    "xentr": "xentr.ref",
    "chicken": "chicken.ref",
    "zebrafinch": "zebrafinch.ref",
    "mouse": "mouse.ref",
    "human": "human.ref",
    "test": "test.ref",
}


def species_library_path(species: str,
                         library_dir: Optional[str] = None) -> Optional[str]:
    """Resolve a --species name to its curated library FASTA path.

    Returns None when the species is unknown or the file is absent; direct
    file paths pass through unchanged (reference benchmarking.py registry).
    """
    import os

    if os.path.exists(species):
        return species
    fname = SPECIES_LIBS.get(species)
    if fname is None:
        return None
    for base in filter(None, (library_dir,
                              os.environ.get("HITE_TPU_LIBRARY_DIR"))):
        cand = os.path.join(base, fname)
        if os.path.exists(cand):
            return cand
    return None


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

    # per-coverage-threshold metrics (reference prints 0.8/0.95/0.99,
    # lib_evaluation.py:79-90 + README.md:380-390): an interval counts
    # only when reciprocally covered >= t
    at_cov = {}
    for t in (0.8, 0.95, 0.99):
        if len(gold_iv) and len(test_iv):
            gcov = iv.coverage_fraction(gold_iv, test_iv)
            tcov = iv.coverage_fraction(test_iv, gold_iv)
            tp_t = int(np.sum((gcov >= t) * (gold_iv[:, 1] - gold_iv[:, 0])))
            tp_test = int(np.sum((tcov >= t) *
                                 (test_iv[:, 1] - test_iv[:, 0])))
        else:
            tp_t = tp_test = 0
        fn_t = gold_bp - tp_t
        fp_t = test_bp - tp_test
        at_cov[str(t)] = dict(
            TP=tp_t, FP=fp_t, FN=fn_t,
            sensitivity=tp_t / gold_bp if gold_bp else 0.0,
            precision=tp_test / test_bp if test_bp else 0.0,
            F1=(2 * tp_t / (2 * tp_t + fp_t + fn_t)
                if (2 * tp_t + fp_t + fn_t) else 0.0))
    metrics["at_coverage"] = at_cov
    logger.info("BM_HiTE: %s", metrics)
    return metrics


def evaluate_edta(
    genome: Genome,
    test_lib: Dict[str, np.ndarray],
    gold_lib: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
) -> Dict[str, float]:
    """BM_EDTA: base-level confusion matrix including true negatives.

    Native equivalent of EDTA's `lib-test.pl -cat Total` protocol as the
    reference drives it (`module/benchmarking.py:79-119`: RepeatMasker the
    genome with both libraries, then compare masked-base sets): TP = bases
    masked by both annotations, FN = gold-only, FP = test-only, TN = the
    rest of the genome; reports sensitivity, specificity, accuracy,
    precision, FDR and F1.
    """
    gindex = gindex or GenomeIndex(genome, cfg.align)
    test_hits = annotate_genome(genome, test_lib, cfg, gindex)
    gold_hits = annotate_genome(genome, gold_lib, cfg, gindex)
    test_iv = iv.merge(_hits_to_flat_intervals(genome, test_hits))
    gold_iv = iv.merge(_hits_to_flat_intervals(genome, gold_hits))
    genome_bp = genome.size
    gold_bp = iv.total_length(gold_iv)
    test_bp = iv.total_length(test_iv)
    if len(gold_iv) and len(test_iv):
        cov = iv.coverage_fraction(gold_iv, test_iv)
        tp = int(np.sum(cov * (gold_iv[:, 1] - gold_iv[:, 0])))
    else:
        tp = 0
    fn = gold_bp - tp
    fp = test_bp - tp
    tn = max(0, genome_bp - gold_bp - fp)
    metrics = dict(
        TP=tp, FN=fn, FP=fp, TN=tn,
        sensitivity=tp / (tp + fn) if (tp + fn) else 0.0,
        specificity=tn / (tn + fp) if (tn + fp) else 0.0,
        accuracy=(tp + tn) / genome_bp if genome_bp else 0.0,
        precision=tp / (tp + fp) if (tp + fp) else 0.0,
        FDR=fp / (tp + fp) if (tp + fp) else 0.0,
        F1=2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0,
    )
    logger.info("BM_EDTA: %s", metrics)
    return metrics


def family_level_metrics(
    test_lib: Dict[str, np.ndarray],
    gold_lib: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    perfect_cov: float = 0.95,
    good_cov: float = 0.95,
    present_cov: float = 0.8,
) -> Dict[str, int]:
    """BM_RM2-style family-level counts (RepeatModeler2 protocol,
    `bin/get_family_summary_paper.sh`, `module/benchmarking.py:44-52`):

    perfect — one test family reciprocally covers >= perfect_cov of a gold
    family; good — one test family covers >= good_cov of the gold family
    (one-way); present — the union of test families covers >= present_cov.
    """
    from hite_tpu.pipeline.libcluster import _all_pairs_hits
    from hite_tpu.utils import intervals as iv_mod

    gold_names = list(gold_lib.keys())
    test_names = list(test_lib.keys())
    pool = [gold_lib[n] for n in gold_names] + [test_lib[n] for n in test_names]
    hits = _all_pairs_hits(pool, cfg.align)
    ng = len(gold_names)
    lens = np.array([len(s) for s in pool])

    perfect = good = present = 0
    for g in range(ng):
        # spans of g covered by mappings of test entries onto g, and
        # per-test-entry one-way coverage
        union_spans: List = []
        best_oneway = 0.0
        best_recip = 0.0
        for t in range(ng, len(pool)):
            t_spans = [(os_, oe) for (j, _a, _b, os_, oe, _n) in hits[t]
                       if j == g]
            if not t_spans:
                continue
            cov_g = iv_mod.total_length(np.array(t_spans)) / max(lens[g], 1)
            union_spans.extend(t_spans)
            best_oneway = max(best_oneway, cov_g)
            # reciprocal: how much of the test entry maps onto g
            g_spans = [(os_, oe) for (j, _a, _b, os_, oe, _n) in hits[g]
                       if j == t]
            cov_t = (iv_mod.total_length(np.array(g_spans)) / max(lens[t], 1)
                     if g_spans else 0.0)
            best_recip = max(best_recip, min(cov_g, cov_t))
        union_cov = (iv_mod.total_length(np.array(union_spans)) / max(lens[g], 1)
                     if union_spans else 0.0)
        if best_recip >= perfect_cov:
            perfect += 1
        elif best_oneway >= good_cov:
            good += 1
        elif union_cov >= present_cov:
            present += 1
    metrics = dict(perfect=perfect, good=good, present=present,
                   total=ng, missing=ng - perfect - good - present)
    logger.info("BM_RM2: %s", metrics)
    return metrics
