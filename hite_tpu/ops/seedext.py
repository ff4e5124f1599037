"""Seed matching + HSP extraction for one segment pair (device kernel).

Replaces the blastn shard-pair alignment of the reference's coarse-boundary
hot loop (`Util.py:4740-4748`, SURVEY.md §3.2 "HOT LOOP 1").  Instead of a
Smith-Waterman per seed, HSPs are recovered as dense runs of co-diagonal
seed matches: all (qpos, spos) seed pairs are sorted by (diagonal band,
qpos) with one `lax.sort`, and maximal runs with bounded qpos gaps become
HSPs.  For the coarse stage this is decision-equivalent to blastn HSPs —
downstream FMEA chaining tolerates gaps of 2000-4000 bp, and boundaries are
later refined by MSA column statistics, so +-diag_band quantization is
within the pipeline's slack (coords are rounded to 10 bp anyway,
`Util.py:4566`).

Everything is static-shape: vmap over a batch of segment pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.kmer import KmerIndex, lookup

INT32_MAX = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


def _segment_fill(values: jnp.ndarray, brk: jnp.ndarray) -> jnp.ndarray:
    """Per-row forward fill of `values` from positions where brk is True.

    Equivalent to values[run_start[i]] without the gather: an associative
    scan whose combine keeps the rightmost marked value.
    """

    def combine(a, b):
        v_a, s_a = a
        v_b, s_b = b
        return jnp.where(s_b, v_b, v_a), s_a | s_b

    filled, _ = jax.lax.associative_scan(
        combine, (jnp.where(brk, values, 0), brk), axis=1)
    return filled


class HSPs(NamedTuple):
    """A static-size batch of HSPs (half-open, segment-local coordinates).

    Subject coordinates are in the coordinate system of the index that was
    searched (reverse-complement coords for minus-strand search; callers
    convert via `rc_to_forward`).
    """

    qs: jnp.ndarray      # int32 [M]
    qe: jnp.ndarray      # int32 [M]
    ss: jnp.ndarray      # int32 [M]
    se: jnp.ndarray      # int32 [M]
    nseeds: jnp.ndarray  # int32 [M]
    valid: jnp.ndarray   # bool  [M]


def pair_hsps(
    q_kmers: jnp.ndarray,
    subj_index: KmerIndex,
    *,
    k: int,
    stride: int = 2,
    max_hits: int = 8,
    diag_band: int = 32,
    run_gap: int = 96,
    min_seeds: int = 4,
    min_hsp_len: int = 30,
    max_hsps: int = 2048,
    exclude_self: jnp.ndarray | bool = False,
    tile_entries: int = 32_768,
) -> HSPs:
    """Extract HSPs between a query segment and an indexed subject segment.

    q_kmers:    int32 [Qk] rolling k-mer codes of the query (-1 = invalid).
    subj_index: sorted KmerIndex of the subject (forward or revcomp).
    exclude_self: scalar bool — drop qpos == spos seed matches (self pair).

    Seed entries are sorted per query TILE (tile_entries seed slots each):
    many small batched sorts vectorize far better on TPU than one global
    sort, and runs split at a tile edge are re-joined downstream by FMEA
    chaining (gap tolerance >> tile span).
    """
    from hite_tpu.ops.kmer import BUCKET_BASES

    Qk = q_kmers.shape[-1]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (Qk // stride, 1), 0).squeeze(-1) * stride
    qk = q_kmers[qpos]

    shift = 2 * (k - BUCKET_BASES) if k > BUCKET_BASES else None
    spos, valid = lookup(subj_index, qk, max_hits, bucket_shift=shift)  # [Q, H]
    qpos_b = jnp.broadcast_to(qpos[:, None], spos.shape)
    excl = jnp.asarray(exclude_self, dtype=jnp.bool_)
    valid = valid & ~(excl & (qpos_b == spos))

    n_subj = subj_index.codes.shape[-1]
    diag = qpos_b - spos
    dbin = (diag + n_subj) // diag_band

    # Pack (diagonal band, query index) into ONE int32 sort key: dbin needs
    # <= ceil(log2((Qk + n_subj) / diag_band)) bits and the strided query
    # index the rest — one single-key sort of (key, spos) beats a 2-key
    # 4-operand sort.  Falls back to unpacked keys when it doesn't fit.
    Q = qpos_b.shape[0]
    n_dbins = (Qk + n_subj) // diag_band + 2
    packed_ok = n_dbins * Q < 2**31
    qidx = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
    qidx = jnp.broadcast_to(qidx, spos.shape)

    # Tile the (query-major) seed list and sort each tile independently:
    # many small batched sorts vectorize better than one global sort.
    n_total = spos.shape[0] * spos.shape[1]
    T = min(tile_entries, n_total)
    n_tiles = (n_total + T - 1) // T
    pad = n_tiles * T - n_total

    def tiled(a, fill):
        flat = a.reshape(-1)
        if pad:
            flat = jnp.concatenate([flat, jnp.full((pad,), fill, flat.dtype)])
        return flat.reshape(n_tiles, T)

    if packed_ok:
        key = dbin * Q + qidx
        t_key = tiled(jnp.where(valid, key, INT32_MAX), INT32_MAX)
        t_spos = tiled(spos, 0)
        s_key, s_spos = jax.lax.sort((t_key, t_spos), dimension=1, num_keys=1)
        s_valid = s_key != INT32_MAX
        safe_key = jnp.where(s_valid, s_key, 0)
        s_dbin = safe_key // Q
        s_qpos = jnp.where(s_valid, (safe_key % Q) * stride, INT32_MAX)
    else:
        t_dbin = tiled(jnp.where(valid, dbin, INT32_MAX), INT32_MAX)
        t_qpos = tiled(jnp.where(valid, qpos_b, INT32_MAX), INT32_MAX)
        t_spos = tiled(spos, 0)
        t_valid = tiled(valid.astype(jnp.int32), 0)
        s_dbin, s_qpos, s_spos, s_valid = jax.lax.sort(
            (t_dbin, t_qpos, t_spos, t_valid), dimension=1, num_keys=2
        )
        s_valid = s_valid.astype(jnp.bool_)

    # Run segmentation within each tile: a new run starts on diagonal-band
    # change or a qpos gap larger than run_gap.
    neg1 = jnp.full((n_tiles, 1), -1, jnp.int32)
    prev_dbin = jnp.concatenate([neg1, s_dbin[:, :-1]], axis=1)
    prev_qpos = jnp.concatenate([neg1, s_qpos[:, :-1]], axis=1)
    brk = (s_dbin != prev_dbin) | (s_qpos - prev_qpos > run_gap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, T), 1)
    run_start = jax.lax.cummax(jnp.where(brk, idx, -1), axis=1)

    nxt_brk = jnp.concatenate(
        [brk[:, 1:], jnp.ones((n_tiles, 1), jnp.bool_)], axis=1)
    is_end = s_valid & nxt_brk

    # run-start values via segmented forward fill (associative scan) — much
    # cheaper on TPU than a 2D take_along_axis gather
    start_q = _segment_fill(s_qpos, brk)
    start_s = _segment_fill(s_spos, brk)
    nseeds = idx - run_start + 1
    qs, qe = start_q, s_qpos + k
    # Within a run (same diagonal band, qpos ascending) spos ascends too,
    # up to diag_band of drift; take the run's span.
    ss = jnp.minimum(start_s, s_spos)
    se = jnp.maximum(start_s, s_spos) + k

    good = is_end & (nseeds >= min_seeds) & (qe - qs >= min_hsp_len)

    # two-stage compaction: per-tile nonzero over T slots (cheap, vmapped),
    # then a global nonzero over n_tiles * per_tile survivors
    per_tile = max(32, max_hsps // max(n_tiles, 1))
    per_tile = min(per_tile, 256)

    def tile_compact(g):
        (s,) = jnp.nonzero(g, size=per_tile, fill_value=T - 1)
        cnt = jnp.sum(g)
        v = jax.lax.broadcasted_iota(jnp.int32, (per_tile, 1), 0).squeeze(-1) < cnt
        return s, v

    sel_t, valid_t = jax.vmap(tile_compact)(good)        # [n_tiles, per_tile]

    def take_t(a):
        return jnp.take_along_axis(a, sel_t, axis=1)

    qs2, qe2 = take_t(qs), take_t(qe)
    ss2, se2 = take_t(ss), take_t(se)
    ns2 = take_t(nseeds)

    gf = valid_t.reshape(-1)
    n2 = gf.shape[0]
    (sel,) = jnp.nonzero(gf, size=max_hsps, fill_value=n2 - 1)
    count = jnp.sum(gf)
    out_valid = jax.lax.broadcasted_iota(jnp.int32, (max_hsps, 1), 0).squeeze(-1) < count
    take = lambda a: jnp.where(out_valid, a.reshape(-1)[sel], 0)
    return HSPs(qs=take(qs2), qe=take(qe2), ss=take(ss2), se=take(se2),
                nseeds=take(ns2), valid=out_valid)


def rc_to_forward(ss: jnp.ndarray, se: jnp.ndarray, subj_len: int):
    """Convert half-open subject spans from revcomp to forward coordinates."""
    return subj_len - se, subj_len - ss
