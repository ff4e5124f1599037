"""Dynamic boundary adjustment engine (flank_region_align_v5 equivalent).

Re-implements the decision core of the reference's shared TIR/Helitron/
non-LTR verification engine (`flank_region_align_v5`, `Util.py:8032-8299`):
fetch full-length copies of a candidate, extend them with flanking genome
context, build a family alignment matrix, and let per-column homology
statistics decide whether the candidate is a real TE and where its exact
boundaries lie.  Candidates with too few copies go to the low-copy pool
for structural/domain rescue (`Util.py:8178-8287`).

TPU-native: the per-family mafft+python-scan of the reference becomes one
jitted device call per (rows, length) shape bucket — anchor-projection MSA
(`ops.msa`) + column stats + windowed boundary search (`ops.boundary`).
Type-specific judges (TIR/Helitron/non-LTR) consume the returned matrix
and consensus on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hite_tpu.config import MSAConfig
from hite_tpu.genome import Genome
from hite_tpu.ops.boundary import (
    adaptive_threshold, column_stats, consensus, search_boundary,
)
from hite_tpu.ops.msa import project_to_center
from hite_tpu.pipeline.candidates import bucket_for, pad_seqs
from hite_tpu.pipeline.copies import CopyHit
from hite_tpu.utils.log import count


@dataclass
class FamilyAnalysis:
    """Device results for one candidate family, pulled to host."""

    M: np.ndarray               # [R, L] alignment matrix (0-3,4 N,5 gap)
    homo: np.ndarray            # [L] homologous columns
    cons: np.ndarray            # [L] majority consensus (5 = gap-majority)
    left_found: bool
    left_pos: int
    right_found: bool
    right_pos: int


@dataclass
class AdjustResult:
    accepted: bool
    start: int                  # adjusted flat genome coords
    end: int
    copy_count: int
    low_copy: bool
    consensus: Optional[np.ndarray] = None


def _analyze_core(center, copies_mat, lens, anchor_l, anchor_r, *,
                  radius=50, int_window=20, ext_window=10):
    M = project_to_center(center, copies_mat, lens)
    thr = adaptive_threshold(jnp.sum(lens > 0))
    stats = column_stats(M, thr)
    left = search_boundary(stats.homo, anchor_l, side="left", radius=radius,
                           int_window=int_window, ext_window=ext_window)
    right = search_boundary(stats.homo, anchor_r, side="right", radius=radius,
                            int_window=int_window, ext_window=ext_window)
    cons, support = consensus(M)
    return M, stats.homo, cons, left, right


_analyze = functools.partial(
    jax.jit, static_argnames=("radius", "int_window", "ext_window")
)(_analyze_core)


@functools.partial(jax.jit, static_argnames=("radius", "int_window", "ext_window"))
def _analyze_batch(centers, copies_mats, lens, anchors_l, anchors_r, *,
                   radius=50, int_window=20, ext_window=10):
    """vmapped family analysis: centers [F, W], copies [F, R, W], ..."""
    fn = functools.partial(_analyze_core, radius=radius,
                           int_window=int_window, ext_window=ext_window)
    return jax.vmap(fn)(centers, copies_mats, lens, anchors_l, anchors_r)


def _prep_family(
    genome: Genome,
    interval: Tuple[int, int],
    copies: Sequence[CopyHit],
    cfg: MSAConfig,
):
    """Host-side family prep: (c_pad, mat, lens, anchor_l, anchor_r,
    center_start, width, R_bucket)."""
    s, e = int(interval[0]), int(interval[1])
    flank = cfg.frame_flank
    center = genome.extract(s, e, flank)
    # actual left flank obtained after contig clipping:
    ci, local = genome.contig_of(np.array([s]))
    c_start = int(genome.starts[int(ci[0])])
    left_flank = min(flank, s - c_start)
    center_start = s - left_flank
    anchor_l = left_flank
    anchor_r = left_flank + (e - s)

    copy_seqs = [genome.extract(h.start, h.end, flank) for h in copies]
    from hite_tpu.io.fasta import revcomp as np_revcomp
    copy_seqs = [np_revcomp(cs) if h.strand == 1 else cs
                 for cs, h in zip(copy_seqs, copies)]
    R_bucket = max(4, 1 << (len(copy_seqs) - 1).bit_length()) if copy_seqs else 4
    width = bucket_for(len(center))
    mat, lens = pad_seqs(copy_seqs, width, n_rows=R_bucket)
    c_pad = np.full(width, 4, np.uint8)
    c_pad[: len(center)] = center
    return c_pad, mat, lens, anchor_l, anchor_r, center_start, width, R_bucket


def analyze_family(
    genome: Genome,
    interval: Tuple[int, int],
    copies: Sequence[CopyHit],
    cfg: MSAConfig,
) -> Tuple[FamilyAnalysis, int]:
    """Build + analyze the family matrix; returns (analysis, center_start)."""
    c_pad, mat, lens, anchor_l, anchor_r, center_start, _w, _r = _prep_family(
        genome, interval, copies, cfg)
    M, homo, cons, left, right = _analyze(
        jnp.asarray(c_pad), jnp.asarray(mat), jnp.asarray(lens),
        jnp.int32(anchor_l), jnp.int32(anchor_r))
    fa = FamilyAnalysis(
        M=np.asarray(M), homo=np.asarray(homo), cons=np.asarray(cons),
        left_found=bool(left.found), left_pos=int(left.pos),
        right_found=bool(right.found), right_pos=int(right.pos),
    )
    return fa, center_start


def analyze_families_batched(
    genome: Genome,
    items: Sequence[Tuple[Tuple[int, int], Sequence[CopyHit]]],
    cfg: MSAConfig,
) -> List[Tuple[FamilyAnalysis, int]]:
    """Bucketed batched analysis of many families in few device calls."""
    preps = [_prep_family(genome, iv, cp, cfg) for iv, cp in items]
    out: List[Optional[Tuple[FamilyAnalysis, int]]] = [None] * len(items)
    buckets: dict = {}
    for i, p in enumerate(preps):
        buckets.setdefault((p[7], p[6]), []).append(i)   # (R_bucket, width)
    for (rb, width), idxs in buckets.items():
        # family dim padded to pow2: an unpadded F recompiles the analyze
        # program for EVERY distinct bucket occupancy — at 775 families on
        # the 100 Mbp run this was a compile storm (~1 remote compile per
        # 2-4 min, tens of variants), not an execution cost
        F = len(idxs)
        Fp = max(4, 1 << (F - 1).bit_length())
        centers = np.full((Fp,) + preps[idxs[0]][0].shape, 4, np.uint8)
        mats = np.full((Fp,) + preps[idxs[0]][1].shape, 4, np.uint8)
        lens = np.zeros((Fp,) + preps[idxs[0]][2].shape, np.int32)
        al = np.zeros(Fp, np.int32)
        ar = np.zeros(Fp, np.int32)
        for b, i in enumerate(idxs):
            centers[b] = preps[i][0]
            mats[b] = preps[i][1]
            lens[b] = preps[i][2]
            al[b] = preps[i][3]
            ar[b] = preps[i][4]
        M, homo, cons, left, right = _analyze_batch(
            jnp.asarray(centers), jnp.asarray(mats), jnp.asarray(lens),
            jnp.asarray(al), jnp.asarray(ar))
        M = np.asarray(M)
        homo = np.asarray(homo)
        cons = np.asarray(cons)
        lf = np.asarray(left.found)
        lp = np.asarray(left.pos)
        rf = np.asarray(right.found)
        rp = np.asarray(right.pos)
        for b, i in enumerate(idxs):
            fa = FamilyAnalysis(
                M=M[b], homo=homo[b], cons=cons[b],
                left_found=bool(lf[b]), left_pos=int(lp[b]),
                right_found=bool(rf[b]), right_pos=int(rp[b]))
            out[i] = (fa, preps[i][5])
    return out  # type: ignore[return-value]


# A judge inspects the analysis and returns (accept, bl, br) in center coords.
Judge = Callable[[FamilyAnalysis], Tuple[bool, int, int]]


def adjust_candidate(
    genome: Genome,
    interval: Tuple[int, int],
    copies: Sequence[CopyHit],
    cfg: MSAConfig,
    judge: Judge,
    min_copies: int,
    precomputed: Optional[Tuple[FamilyAnalysis, int]] = None,
) -> AdjustResult:
    """One round of boundary adjustment for one candidate."""
    n = len(copies)
    if n < min_copies:
        count("boundary.low_copy")
        return AdjustResult(accepted=False, start=int(interval[0]),
                            end=int(interval[1]), copy_count=n, low_copy=True)
    fa, center_start = precomputed or analyze_family(
        genome, interval, copies, cfg)
    if not (fa.left_found and fa.right_found):
        count("boundary.not_found")
        return AdjustResult(accepted=False, start=int(interval[0]),
                            end=int(interval[1]), copy_count=n, low_copy=False)
    ok, bl, br = judge(fa)
    if not ok or br - bl < 30:
        count("boundary.judge_reject")
        return AdjustResult(accepted=False, start=int(interval[0]),
                            end=int(interval[1]), copy_count=n, low_copy=False)
    count("boundary.accepted")
    cons = fa.cons[bl:br]
    cons = cons[cons < 4]  # drop gap/N columns for the consensus readout
    return AdjustResult(accepted=True, start=center_start + bl,
                        end=center_start + br, copy_count=n,
                        low_copy=False, consensus=cons.astype(np.uint8))
