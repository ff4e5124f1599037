"""Helitron detection module.

Re-implements `module/judge_Helitron_transposons.py` (SURVEY.md §2.A):
coarse candidates are scanned in both orientations with the LCV terminal
banks (HelitronScanner scanHead/scanTail -> pairends -> draw, replaced by
`ops.lcv`), paired head+tail hits excise helitron candidates, then the
shared verification engine iterates MSA boundary adjustment with the
Helitron judge (`judge_boundary_v6` `Util.py:9821-10159`): the consensus
must carry an 'ATC'-context 5' head within its first bases and a
CTAGT/CTAAT/CTGGT/CTGAT 3' tail, and Helitrons need only >=2 copies.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import encode_seq, revcomp as np_revcomp
from hite_tpu.ops.lcv import default_banks, lcv_scores
from hite_tpu.ops.tandem import tandem_fraction
from hite_tpu.pipeline.boundary_adjust import FamilyAnalysis
from hite_tpu.pipeline.candidates import bucket_iter, pad_rows, pad_seqs
from hite_tpu.pipeline.copies import GenomeIndex
from hite_tpu.pipeline.verify import ModuleResult, empty_result, verify_families
from hite_tpu.utils.log import logger, stage_timer

TAIL_MOTIFS = [encode_seq(m) for m in ("CTAGT", "CTAAT", "CTGGT", "CTGAT")]
HEAD_MOTIF = encode_seq("ATC")


def _contains(hay: np.ndarray, needle: np.ndarray) -> bool:
    n = len(needle)
    if len(hay) < n:
        return False
    for i in range(len(hay) - n + 1):
        if (hay[i : i + n] == needle).all():
            return True
    return False


def make_helitron_judge():
    """Judge: homology boundaries + ATC head / CTRRT tail motifs."""

    def judge(fa: FamilyAnalysis) -> Tuple[bool, int, int]:
        cons = fa.cons
        L = len(cons)
        best = None
        for dl in range(-5, 6):
            for dr in range(-5, 6):
                bl = fa.left_pos + dl
                br = fa.right_pos + dr
                if bl < 0 or br > L or br - bl < 30:
                    continue
                # head window reaches 2bp outside: Helitrons insert at an
                # A|T host site, so the consensus 'A' just left of the
                # boundary completes the ATC context (judge_boundary_v6
                # extends the boundary before the motif check)
                head = cons[max(bl - 2, 0) : bl + 10]
                tail = cons[br - 10 : br]
                if (head >= 4).any() or (tail >= 4).any():
                    continue
                if not _contains(head, HEAD_MOTIF):
                    continue
                if not any(_contains(tail, m) for m in TAIL_MOTIFS):
                    continue
                score = abs(dl) + abs(dr)
                if best is None or score < best[0]:
                    best = (score, bl, br)
        if best is None:
            return False, fa.left_pos, fa.right_pos
        return True, best[1], best[2]

    return judge


def lcv_gate(
    genome: Genome,
    intervals: np.ndarray,
    cfg: PipelineConfig,
) -> np.ndarray:
    """Head+tail LCV pairing gate; returns trimmed candidate intervals."""
    hcfg = cfg.helitron
    head_bank, tail_bank = default_banks()
    out: List[Tuple[int, int]] = []
    lens = intervals[:, 1] - intervals[:, 0]
    flank = 50

    for width, idxs in bucket_iter(range(len(intervals)), lens + 2 * flank):
        seqs = [genome.extract(intervals[i, 0], intervals[i, 1], flank)
                for i in idxs]
        mat, slens = pad_seqs(seqs, width, n_rows=pad_rows(len(seqs)))
        fwd = jnp.asarray(mat)
        rev = jnp.asarray(np.stack([np_revcomp(r) for r in mat]))
        for orient, arr in ((0, fwd), (1, rev)):
            h_sc, _h_w = lcv_scores(arr, head_bank, tile=min(width, 2048))
            t_sc, t_w = lcv_scores(arr, tail_bank, tile=min(width, 2048))
            h_sc = np.asarray(h_sc)
            t_sc = np.asarray(t_sc)
            t_w = np.asarray(t_w)
            for bi, i in enumerate(idxs):
                L = int(slens[bi]) if bi < len(seqs) else 0
                if L == 0:
                    continue
                heads = np.nonzero(h_sc[bi, :L] >= hcfg.min_score_head)[0]
                tails = np.nonzero(t_sc[bi, :L] >= hcfg.min_score_tail)[0]
                if len(heads) == 0 or len(tails) == 0:
                    continue
                # pair the best-scoring head with the farthest valid tail
                h = int(heads[np.argmax(h_sc[bi, heads])])
                valid_t = tails[(tails > h + 50)
                                & (tails < h + hcfg.head_tail_max_gap)]
                if len(valid_t) == 0:
                    continue
                t = int(valid_t[np.argmax(t_sc[bi, valid_t])])
                end = t + int(t_w[bi, t])
                # map back to genome coordinates
                ci, local = genome.contig_of(np.array([intervals[i, 0]]))
                lf = min(flank, int(local[0]))
                if orient == 0:
                    g_s = int(intervals[i, 0]) - lf + h
                    g_e = int(intervals[i, 0]) - lf + end
                else:
                    g_e = int(intervals[i, 0]) - lf + (L - h)
                    g_s = int(intervals[i, 0]) - lf + (L - end)
                if g_e - g_s >= cfg.library.min_te_len:
                    out.append((g_s, g_e))
    return np.array(out, np.int64).reshape(-1, 2)


def run_helitron_detection(
    genome: Genome,
    coarse_intervals: np.ndarray,
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
) -> ModuleResult:
    if len(coarse_intervals) == 0:
        return empty_result()

    with stage_timer("helitron.tandem_filter"):
        seqs = [genome.extract(s, e) for s, e in coarse_intervals]
        mat, lens = pad_seqs(seqs, n_rows=pad_rows(len(seqs)))
        frac = np.asarray(tandem_fraction(jnp.asarray(mat), jnp.asarray(lens)))
        frac = frac[: len(coarse_intervals)]
        coarse_intervals = coarse_intervals[frac < cfg.tandem.tandem_region_cutoff]

    with stage_timer("helitron.lcv_gate"):
        gated = lcv_gate(genome, coarse_intervals, cfg)
    logger.info("helitron: %d/%d candidates pass LCV head+tail gate",
                len(gated), len(coarse_intervals))
    return verify_families(
        genome, gated, cfg, make_helitron_judge(),
        min_copies=cfg.msa.min_copy_helitron, stage="helitron", gindex=gindex)
