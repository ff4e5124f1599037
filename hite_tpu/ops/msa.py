"""Anchor-projection batched MSA (device kernel).

Replaces the reference's thousands of per-family mafft runs
(`flank_region_align_v5` -> `run_find_members_v8` -> `mafft --preservecase`,
`Util.py:8032-8299`, `10407-10437`; SURVEY.md §3.3 "HOT LOOP 4").

TPU-native design: HiTE only consumes the MSA through *per-column homology
statistics in the coordinate system of the family consensus* (sparse
insertion columns are removed before judging, `remove_sparse_col_in_align_file`
`Util.py:10344-10405`).  So instead of a progressive alignment we project
every copy directly onto the center sequence's coordinates:

  1. exact k-mer matches (copy, center) -> anchor pairs via the sorted
     center index;
  2. the dominant diagonal band per copy selects the true alignment chain
     (mode over quantized diagonals, computed by one sort + run-length);
  3. per-position offsets are forward/backward filled between anchors
     (piecewise-constant indel model) — flank regions, which have no
     anchors, extrapolate with the nearest element offset, exactly
     reproducing mafft's behavior of dragging unrelated flank context into
     the columns beyond the element boundary;
  4. a scatter writes each copy base into its center column; unwritten
     columns are gaps.

Result: [R, L_center] code matrix (0-3 bases, 4 N, 5 gap) per family,
static shapes, vmappable over family batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes
from hite_tpu.ops.kmer import build_index, lookup

# plain Python ints, NOT jnp scalars (see ops/terminal.NEG)
GAP = 5
INT32_MAX = 2**31 - 1


def _mode_of_valid(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Most frequent value per row of [R, N] (invalid entries excluded)."""
    v = jnp.where(valid, vals, INT32_MAX)
    s = jax.lax.sort(v, dimension=-1)
    R, N = s.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    prev = jnp.concatenate([jnp.full((R, 1), -(2**31), jnp.int32), s[:, :-1]], axis=1)
    brk = s != prev
    run_start = jax.lax.cummax(jnp.where(brk, idx, -1), axis=1)
    run_len = idx - run_start + 1
    run_len = jnp.where(s == INT32_MAX, 0, run_len)
    best = jnp.argmax(run_len, axis=1)
    return jnp.take_along_axis(s, best[:, None], 1)[:, 0]


def _forward_fill(vals: jnp.ndarray, valid: jnp.ndarray):
    """Per-row forward fill of valid entries; returns (filled, had_prev)."""
    R, N = vals.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    last_valid = jax.lax.cummax(jnp.where(valid, idx, -1), axis=1)
    had = last_valid >= 0
    filled = jnp.take_along_axis(vals, jnp.clip(last_valid, 0, N - 1), 1)
    return filled, had


@functools.partial(jax.jit, static_argnames=(
    "k", "max_hits", "diag_band", "diag_tol"))
def project_to_center(
    center: jnp.ndarray,
    copies: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    k: int = 8,
    max_hits: int = 4,
    diag_band: int = 16,
    diag_tol: int = 64,
) -> jnp.ndarray:
    """Project copies [R, Lc] onto center [Lq] coordinates.

    lens: int32 [R] true copy lengths (rows padded with N).
    Returns uint8 [R, Lq] alignment matrix (0-3 base, 4 N, 5 gap).
    """
    Lq = center.shape[-1]
    R, Lc = copies.shape
    A = Lc - k + 1

    idx = build_index(center, k)
    km = kmer_codes(copies, k)                      # [R, A]
    spos, valid = lookup(idx, km.reshape(-1), max_hits)
    spos = spos.reshape(R, A, max_hits)
    valid = valid.reshape(R, A, max_hits)

    qpos = jax.lax.broadcasted_iota(jnp.int32, (1, A, 1), 1)
    diag = spos - qpos                              # [R, A, H]
    db = jnp.where(valid, (diag + Lc) // diag_band, INT32_MAX)
    mode_db = _mode_of_valid(db.reshape(R, -1), valid.reshape(R, -1))  # [R]
    target = mode_db * diag_band - Lc + diag_band // 2

    dist = jnp.abs(diag - target[:, None, None])
    dist = jnp.where(valid, dist, INT32_MAX)
    best_h = jnp.argmin(dist, axis=2)               # [R, A]
    best_dist = jnp.take_along_axis(dist, best_h[:, :, None], 2)[:, :, 0]
    anchor_ok = best_dist <= diag_tol
    anchor_s = jnp.take_along_axis(spos, best_h[:, :, None], 2)[:, :, 0]
    off = anchor_s - qpos[:, :, 0]                  # [R, A]

    # Neighbor-consensus veto: a random k-mer occasionally matches the
    # center within diag_tol (P ~ L/4^k per position); a single such junk
    # anchor would forward-fill a wrong offset over the rest of the row.
    # Keep an anchor only if it agrees (within a small jitter) with its
    # previous OR next valid anchor.
    jitter = 8

    def _shifted_fill(o, ok):
        o1 = jnp.concatenate([jnp.zeros((R, 1), o.dtype), o[:, :-1]], axis=1)
        ok1 = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.bool_), ok[:, :-1]], axis=1)
        return _forward_fill(o1, ok1)

    prev_off, had_prev0 = _shifted_fill(off, anchor_ok)
    nxt, had_nxt = _shifted_fill(off[:, ::-1], anchor_ok[:, ::-1])
    next_off, had_next0 = nxt[:, ::-1], had_nxt[:, ::-1]
    agree_prev = had_prev0 & (jnp.abs(off - prev_off) <= jitter)
    agree_next = had_next0 & (jnp.abs(off - next_off) <= jitter)
    lonely = anchor_ok & ~(agree_prev | agree_next) & (had_prev0 | had_next0)
    anchor_ok = anchor_ok & ~lonely

    off_ff, had_prev = _forward_fill(off, anchor_ok)
    # backward fill the head (positions before the first anchor)
    off_bf, _ = _forward_fill(off[:, ::-1], anchor_ok[:, ::-1])
    off_bf = off_bf[:, ::-1]
    off_q = jnp.where(had_prev, off_ff, off_bf)     # [R, A]

    # extend the offset map to all Lc positions (tail reuses last offset)
    tail = jnp.repeat(off_q[:, -1:], Lc - A, axis=1)
    off_all = jnp.concatenate([off_q, tail], axis=1)  # [R, Lc]

    q_all = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
    col = q_all + off_all
    in_range = (col >= 0) & (col < Lq) & (q_all < lens[:, None])
    col = jnp.where(in_range, col, Lq)              # Lq = dropped by scatter

    rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
    M = jnp.full((R, Lq + 1), GAP, jnp.uint8)
    M = M.at[rows.reshape(-1), col.reshape(-1)].set(
        copies.reshape(-1).astype(jnp.uint8), mode="drop"
    )
    # rows with no usable anchors at all stay fully gap
    any_anchor = jnp.any(anchor_ok, axis=1)
    M = jnp.where(any_anchor[:, None], M, GAP)
    return M[:, :Lq]
