"""Column statistics + homology boundary search on MSA matrices.

Array-op reimplementation of the reference's dynamic-boundary-adjustment
judges (`judge_boundary_v5` `Util.py:9145-9480`, `search_boundary_homo_v3`
`:8887-9143`, `judge_boundary_v6` `:9821-10159`, `judge_boundary_v9`
`:9483-9720`): given an [R, L] alignment matrix, per-column base counts
decide which columns are homologous; sliding homology windows around the
expected boundary locate where family homology starts/stops; a majority
consensus is read out between the boundaries; and TSD/motif refinements
adjust the final ends per TE type.

Matrix codes: 0-3 bases, 4 N, 5 gap (see ops.msa).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class ColumnStats(NamedTuple):
    counts: jnp.ndarray      # int32 [L, 6] per-column code counts
    present: jnp.ndarray     # int32 [L] rows with a base (0-3) in the column
    valid: jnp.ndarray       # bool [L] gap fraction <= 1/2 (reference rule)
    homo: jnp.ndarray        # bool [L] one base >= threshold of present rows
    ratio: jnp.ndarray       # float [L] max base fraction


def adaptive_threshold(n_rows: jnp.ndarray) -> jnp.ndarray:
    """Row-count-adaptive homology threshold (judge_boundary_v5 :9240-9245)."""
    return jnp.where(n_rows <= 5, 0.95, jnp.where(n_rows <= 10, 0.9, 0.7))


def column_stats(M: jnp.ndarray, threshold: jnp.ndarray | float,
                 row_ok: jnp.ndarray | None = None) -> ColumnStats:
    """Per-column statistics of an [R, L] matrix.

    `row_ok` (bool [R]) marks REAL rows: batched family analyses pad the
    row axis to the batch maximum with all-N rows, and counting those as
    gap rows poisoned the gap-fraction validity rule (a genuine 8-copy
    family inside a 64-row batch had every column judged invalid — a
    whole Helitron family vanished from the 8 Mbp hard bench this way).
    """
    R, L = M.shape
    oh = jax.nn.one_hot(M.astype(jnp.int32), 6, dtype=jnp.int32)  # [R, L, 6]
    if row_ok is not None:
        oh = oh * row_ok.astype(jnp.int32)[:, None, None]
        n_rows = jnp.sum(row_ok.astype(jnp.int32))
    else:
        n_rows = R
    counts = jnp.sum(oh, axis=0)                                   # [L, 6]
    present = jnp.sum(counts[:, :4], axis=1)
    gaps = counts[:, 5] + counts[:, 4]
    valid = gaps <= n_rows // 2
    max_base = jnp.max(counts[:, :4], axis=1)
    ratio = max_base / jnp.maximum(present, 1)
    homo = valid & (ratio >= threshold) & (present >= 2)
    return ColumnStats(counts=counts, present=present, valid=valid,
                       homo=homo, ratio=ratio)


def _window_frac(homo: jnp.ndarray, window: int) -> jnp.ndarray:
    """frac[c] = mean(homo[c : c + window]) (right-aligned windows)."""
    h = jnp.concatenate([homo.astype(jnp.float32),
                         jnp.zeros((window,), jnp.float32)])
    c = jnp.cumsum(h)
    c = jnp.concatenate([jnp.zeros((1,)), c])
    L = homo.shape[0]
    idx = jnp.arange(L)
    return (c[idx + window] - c[idx]) / window


class BoundaryCall(NamedTuple):
    found: jnp.ndarray    # bool — a clean homology transition exists
    pos: jnp.ndarray      # int32 boundary column (start of element side)


def search_boundary(
    homo: jnp.ndarray,
    anchor: jnp.ndarray,
    *,
    side: str,
    radius: int = 50,
    int_window: int = 20,
    ext_window: int = 10,
    int_min: float = 0.8,
    ext_max: float = 0.4,
    fp_window: int = 40,
    fp_max: float = 0.7,
) -> BoundaryCall:
    """Locate the homology boundary near `anchor` on one side.

    side='left':  element extends to the right of the boundary; internal
    window [b, b+int_window) must be homologous, external window
    [b-ext_window, b) must not.  side='right': mirrored (boundary is the
    exclusive element end).  A far-external window that is still
    homologous marks a false positive (homology continues outside —
    `search_boundary_homo_v3`'s FP rule), reported as found=False.
    """
    L = homo.shape[0]
    if side == "right":
        # mirror: right boundary at b in original = left boundary at L-b
        mirrored = search_boundary(
            homo[::-1], L - anchor, side="left", radius=radius,
            int_window=int_window, ext_window=ext_window, int_min=int_min,
            ext_max=ext_max, fp_window=fp_window, fp_max=fp_max)
        return BoundaryCall(found=mirrored.found, pos=L - mirrored.pos)

    int_frac = _window_frac(homo, int_window)                 # [b, b+w)
    ext_cum = jnp.concatenate([jnp.zeros((1,)),
                               jnp.cumsum(homo.astype(jnp.float32))])

    def win_mean(lo, hi):
        lo = jnp.clip(lo, 0, L)
        hi = jnp.clip(hi, 0, L)
        return (ext_cum[hi] - ext_cum[lo]) / jnp.maximum(hi - lo, 1)

    cand = jnp.arange(L)
    ext_frac = win_mean(cand - ext_window, cand)
    ok = (int_frac >= int_min) & (ext_frac <= ext_max)
    near = jnp.abs(cand - anchor) <= radius
    score = jnp.where(ok & near, jnp.abs(cand - anchor), 10**6)
    best = jnp.argmin(score)
    found = score[best] < 10**6
    # false-positive rule: homology persisting well outside the boundary
    far_ext = win_mean(best - ext_window - fp_window, best - ext_window)
    found = found & (far_ext <= fp_max)
    return BoundaryCall(found=found, pos=best)


@jax.jit
def consensus(M: jnp.ndarray,
              row_ok: jnp.ndarray | None = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Majority base per column; returns (codes [L] with gap-majority
    columns marked 5, and per-column support fraction).  `row_ok` masks
    batch-padding rows (see column_stats) — without it an 8-copy family
    padded into a 64-row batch reads back an ALL-GAP consensus."""
    R, L = M.shape
    oh = jax.nn.one_hot(M.astype(jnp.int32), 6, dtype=jnp.int32)
    if row_ok is not None:
        oh = oh * row_ok.astype(jnp.int32)[:, None, None]
    counts = jnp.sum(oh, axis=0)
    base = jnp.argmax(counts[:, :4], axis=1).astype(jnp.uint8)
    present = jnp.sum(counts[:, :4], axis=1)
    gapish = counts[:, 5] + counts[:, 4]
    cons = jnp.where(gapish > present, jnp.uint8(5), base)
    support = jnp.max(counts[:, :4], axis=1) / jnp.maximum(present, 1)
    return cons, support


def row_tsd_votes(
    M: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    sizes: Sequence[int] = (2, 3, 4, 5, 6, 8, 9, 10, 11),
    mismatch_min_len: int = 8,
) -> jnp.ndarray:
    """Count rows whose flanks carry a TSD at boundaries [left, right).

    For each row, compares the `s` bases immediately left of `left` with the
    `s` bases at/after `right` (the reference's per-copy TSD test inside
    `judge_boundary_v5` :9356-9411).  Returns int32 [len(sizes)] vote counts.
    """
    R, L = M.shape
    max_s = max(sizes)
    lwin = jax.lax.dynamic_slice(
        M, (0, jnp.clip(left - max_s, 0, L - max_s)), (R, max_s))
    rwin = jax.lax.dynamic_slice(
        M, (0, jnp.clip(right, 0, L - max_s)), (R, max_s))
    votes = []
    for s in sizes:
        l = lwin[:, max_s - s :]
        r = rwin[:, :s]
        ok = (l < 4) & (r < 4)
        mm = jnp.sum((l != r) | ~ok, axis=1)
        tol = 1 if s >= mismatch_min_len else 0
        votes.append(jnp.sum(mm <= tol))
    return jnp.stack(votes)
