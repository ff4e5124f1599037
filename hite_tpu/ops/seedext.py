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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.kmer import INVALID_CODE, KmerIndex, lookup

INT32_MAX = jnp.int32(2**31 - 1)


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
) -> HSPs:
    """Extract HSPs between a query segment and an indexed subject segment.

    q_kmers:    int32 [Qk] rolling k-mer codes of the query (-1 = invalid).
    subj_index: sorted KmerIndex of the subject (forward or revcomp).
    exclude_self: scalar bool — drop qpos == spos seed matches (self pair).
    """
    Qk = q_kmers.shape[-1]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (Qk // stride, 1), 0).squeeze(-1) * stride
    qk = q_kmers[qpos]

    spos, valid = lookup(subj_index, qk, max_hits)      # [Q, H]
    qpos_b = jnp.broadcast_to(qpos[:, None], spos.shape)
    excl = jnp.asarray(exclude_self, dtype=jnp.bool_)
    valid = valid & ~(excl & (qpos_b == spos))

    n_subj = subj_index.codes.shape[-1]
    diag = qpos_b - spos
    dbin = (diag + n_subj) // diag_band

    # Sort all seed entries by (diagonal band, query position).
    flat_dbin = jnp.where(valid, dbin, INT32_MAX).reshape(-1)
    flat_qpos = jnp.where(valid, qpos_b, INT32_MAX).reshape(-1)
    flat_spos = spos.reshape(-1)
    flat_valid = valid.reshape(-1).astype(jnp.int32)
    s_dbin, s_qpos, s_spos, s_valid = jax.lax.sort(
        (flat_dbin, flat_qpos, flat_spos, flat_valid), num_keys=2
    )
    n = s_dbin.shape[0]
    s_valid = s_valid.astype(jnp.bool_)

    # Run segmentation: a new run starts on diagonal-band change or a qpos
    # gap larger than run_gap.
    prev_dbin = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_dbin[:-1]])
    prev_qpos = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_qpos[:-1]])
    brk = (s_dbin != prev_dbin) | (s_qpos - prev_qpos > run_gap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    run_start = jax.lax.cummax(jnp.where(brk, idx, -1))

    nxt_brk = jnp.concatenate([brk[1:], jnp.ones((1,), jnp.bool_)])
    is_end = s_valid & nxt_brk

    start_q = s_qpos[jnp.clip(run_start, 0, n - 1)]
    start_s = s_spos[jnp.clip(run_start, 0, n - 1)]
    nseeds = idx - run_start + 1
    qs, qe = start_q, s_qpos + k
    # Within a run (same diagonal band, qpos ascending) spos ascends too,
    # up to diag_band of drift; take the run's span.
    ss = jnp.minimum(start_s, s_spos)
    se = jnp.maximum(start_s, s_spos) + k

    good = is_end & (nseeds >= min_seeds) & (qe - qs >= min_hsp_len)
    (sel,) = jnp.nonzero(good, size=max_hsps, fill_value=n - 1)
    count = jnp.sum(good)
    out_valid = jax.lax.broadcasted_iota(jnp.int32, (max_hsps, 1), 0).squeeze(-1) < count
    take = lambda a: jnp.where(out_valid, a[sel], 0)
    return HSPs(qs=take(qs), qe=take(qe), ss=take(ss), se=take(se),
                nseeds=take(nseeds), valid=out_valid)


def rc_to_forward(ss: jnp.ndarray, se: jnp.ndarray, subj_len: int):
    """Convert half-open subject spans from revcomp to forward coordinates."""
    return subj_len - se, subj_len - ss
