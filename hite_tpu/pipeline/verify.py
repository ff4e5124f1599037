"""Shared family verification: copies -> clustering -> boundary rounds.

Common scaffolding of the TIR / Helitron / non-LTR modules (the reference
repeats this orchestration in each `judge_*_transposons.py`): retrieve
genome-wide copies for gated candidates, group candidates into families by
copy overlap, then iterate the dynamic-boundary-adjustment engine on each
family representative with a type-specific judge.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.boundary_adjust import (
    AdjustResult, Judge, adjust_candidate,
)
from hite_tpu.pipeline.candidates import CandidateSet
from hite_tpu.pipeline.cluster import cluster_by_copies
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.utils.log import logger, stage_timer


@dataclass
class ModuleResult:
    """Output of one TE-class detection module."""

    accepted: CandidateSet
    consensus: List[np.ndarray]
    low_copy: CandidateSet
    copy_counts: List[int] = field(default_factory=list)


def empty_result() -> ModuleResult:
    empty = CandidateSet(intervals=np.zeros((0, 2), np.int64))
    return ModuleResult(accepted=empty, consensus=[], low_copy=empty)


def verify_families(
    genome: Genome,
    gated: np.ndarray,
    cfg: PipelineConfig,
    judge: Judge,
    *,
    min_copies: int,
    stage: str,
    gindex: Optional[GenomeIndex] = None,
    min_coverage: float = 0.9,
) -> ModuleResult:
    """Run the shared verification pipeline on gated candidate intervals."""
    if len(gated) == 0:
        return empty_result()
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)

    with stage_timer(f"{stage}.copies"):
        copy_sets = finder.find_copies(
            [genome.extract(s, e) for s, e in gated],
            min_coverage=min_coverage, max_copies=cfg.msa.max_copies)
    groups = cluster_by_copies(copy_sets)
    members: dict = {}
    for i, g in enumerate(groups):
        members.setdefault(int(g), []).append(i)
    logger.info("%s: %d families from %d candidates", stage, len(members),
                len(gated))

    accepted: List[Tuple[int, int]] = []
    consensus: List[np.ndarray] = []
    copy_counts: List[int] = []
    low_copy: List[Tuple[int, int]] = []

    with stage_timer(f"{stage}.boundary_adjust"):
        # batched first-round analysis for every family's primary member
        ordered_members = {
            g: sorted(idxs, key=lambda i: (-len(copy_sets[i]),
                                           -(gated[i, 1] - gated[i, 0])))
            for g, idxs in members.items()
        }
        primaries = [idxs[0] for idxs in ordered_members.values()
                     if len(copy_sets[idxs[0]]) >= min_copies]
        from hite_tpu.pipeline.boundary_adjust import analyze_families_batched

        batch_items = [((int(gated[i, 0]), int(gated[i, 1])), copy_sets[i])
                       for i in primaries]
        first_round = dict(zip(
            primaries,
            analyze_families_batched(genome, batch_items, cfg.msa)
            if batch_items else []))

        for g, idxs in ordered_members.items():
            family_done = False
            family_low: Optional[Tuple[int, int]] = None
            for attempt, rep in enumerate(idxs[:3]):
                interval = (int(gated[rep, 0]), int(gated[rep, 1]))
                copies = copy_sets[rep]
                result: Optional[AdjustResult] = None
                for _round in range(cfg.msa.boundary_rounds):
                    pre = first_round.get(rep) if _round == 0 else None
                    result = adjust_candidate(genome, interval, copies,
                                              cfg.msa, judge, min_copies,
                                              precomputed=pre)
                    if not result.accepted:
                        break
                    new_interval = (result.start, result.end)
                    if new_interval == interval:
                        break
                    interval = new_interval
                    copies = finder.find_copies(
                        [genome.extract(*interval)],
                        min_coverage=min_coverage,
                        max_copies=cfg.msa.max_copies)[0]
                if result is None:
                    continue
                if result.low_copy:
                    family_low = family_low or interval
                elif result.accepted and \
                        result.end - result.start >= cfg.library.min_te_len:
                    accepted.append((result.start, result.end))
                    consensus.append(result.consensus)
                    copy_counts.append(result.copy_count)
                    family_done = True
                    break
            if not family_done and family_low is not None:
                low_copy.append(family_low)

    return ModuleResult(
        accepted=CandidateSet(np.array(accepted, np.int64).reshape(-1, 2)),
        consensus=consensus,
        low_copy=CandidateSet(np.array(low_copy, np.int64).reshape(-1, 2)),
        copy_counts=copy_counts,
    )
