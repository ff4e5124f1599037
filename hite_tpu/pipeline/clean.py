"""Genome cleaning: redundant-contig removal + contig renaming.

Re-implements `module/genome_clean.py`: rename contigs to Chr{N}
(`:87-93`), self-align the assembly (minimap2 -x asm5 of <10Mb contigs,
`:15-19,95-98`), and drop contigs >= 95% covered by a longer contig
(`:22-26`).  Here the self-alignment rides the shared seed/chain kernels
via the library-clustering coverage machinery.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.utils.log import logger, stage_timer


def clean_genome(
    seqs: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    coverage: float = 0.95,
    max_self_align_len: int = 10_000_000,
    rename: bool = True,
) -> Tuple[Genome, Dict[str, str]]:
    """Drop redundant contigs; returns (cleaned genome, name map)."""
    from hite_tpu.pipeline.libcluster import _all_pairs_hits
    from hite_tpu.utils import intervals as iv

    names = list(seqs.keys())
    lens = np.array([len(seqs[n]) for n in names])
    small = [i for i in range(len(names)) if lens[i] <= max_self_align_len]

    drop = set()
    if len(small) > 1:
        with stage_timer("clean.self_align"):
            pool = [seqs[names[i]] for i in small]
            hits = _all_pairs_hits(pool, cfg.align)
        # contig j is redundant when spans of j covered by longer contigs'
        # mappings reach the coverage threshold
        for j in range(len(pool)):
            spans = []
            for a, hs in enumerate(hits):
                if a == j:
                    continue
                spans.extend([(os_, oe) for (t, _x, _y, os_, oe, _n) in hs
                              if t == j and lens[small[a]] >= lens[small[j]]])
            if spans:
                cov = iv.total_length(np.array(spans)) / max(lens[small[j]], 1)
                if cov >= coverage:
                    drop.add(small[j])
    kept = [n for i, n in enumerate(names) if i not in drop]
    if drop:
        logger.info("clean_genome: dropped %d redundant contigs", len(drop))

    name_map: Dict[str, str] = {}
    cleaned: Dict[str, np.ndarray] = {}
    for i, n in enumerate(kept):
        new = f"Chr{i + 1}" if rename else n
        name_map[n] = new
        cleaned[new] = seqs[n]
    return Genome.from_dict(cleaned), name_map
