"""Homology-based non-LTR detection against a curated library.

Re-implements `module/judge_Other_transposons.py`: align every entry of a
curated non-LTR library (`library/non_LTR.lib` in the reference) to the
genome with query coverage >= 0.95 and keep the longest genomic copy per
entry (`:48-77`).  When no curated library is configured/available the
stage is a no-op (the reference ships the library as a data asset).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import read_fasta
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.utils.log import logger, stage_timer


def run_other_detection(
    genome: Genome,
    cfg: PipelineConfig,
    lib_path: Optional[str] = None,
    gindex: Optional[GenomeIndex] = None,
) -> Dict[str, np.ndarray]:
    """Returns {entry_name#Class: longest genomic copy codes}."""
    if lib_path is None or not os.path.exists(lib_path):
        logger.info("other: no curated non-LTR library available, skipping")
        return {}
    lib = read_fasta(lib_path)
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)
    with stage_timer("other.map"):
        copies = finder.find_copies(list(lib.values()), min_coverage=0.95,
                                    max_copies=8)
    out: Dict[str, np.ndarray] = {}
    for name, hits in zip(lib.keys(), copies):
        if not hits:
            continue
        best = max(hits, key=lambda h: h.end - h.start)
        key = name if "#" in name else f"{name}#Unknown"
        out[key] = genome.extract(best.start, best.end)
    logger.info("other: %d curated entries recovered", len(out))
    return out
