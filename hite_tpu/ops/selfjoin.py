"""Whole-genome k-mer self-join: gather-free seed discovery (device kernel).

Replaces the all-vs-all segment-pair seed lookup of the coarse stage
(reference blastn shard grid, `Util.py:4740-4748`, SURVEY.md §3.2 HOT LOOP 1)
with a single global join: every k-mer of the genome (forward and reverse-
complement) is sorted ONCE by code, and seed matches are simply neighboring
entries within a run of equal codes.  Two properties make this the right
TPU formulation:

1. **Zero gathers.** The measured bottleneck of the per-pair design was the
   bucketed binary-search lookup (~83%% of kernel time: 12 gather steps per
   query into an HBM-resident sorted array).  Here matches are emitted by D
   shifted elementwise comparisons of the code-sorted array — pure VPU work —
   and the only non-elementwise ops are two `lax.sort`s (measured 86 ms for
   16M keys on v5e, vs ~1.1 s for the gathers they replace).

2. **O(N·D) instead of O(pairs · Q).** The per-pair grid re-scanned each
   segment against every other; the self-join touches each genome position
   exactly once per window offset, independent of segment count, and a
   position in an m-copy repeat pairs with its <=D nearest copies in genome
   order (every copy is still covered — chains only need one partner).

Window semantics: within a run of equal codes the entry positions are
ascending (stable sort), so pair (i, i+d) always has qpos < spos, covering
the strict upper triangle of the classic dot plot exactly once.  The
reverse-complement strand is joined in the same pass by concatenating the
rc k-mer list at virtual offset L: (fwd, rc) pairs are cross-strand matches
and (rc, rc) pairs — mirror images of (fwd, fwd) — are masked out.

The downstream stays as in `ops.seedext`: a second sort by (diagonal band,
qpos) groups co-diagonal seeds, runs with bounded qpos gaps become HSPs, and
FMEA chaining merges HSPs into repeat candidates — done exactly, on the
host, over the (small) compacted HSP list (`ops.chain.chain_hsps_host`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes, revcomp

INT32_MAX = jnp.int32(2**31 - 1)


class JoinHSPs(NamedTuple):
    """HSPs in virtual flat coordinates (subject >= L means rc strand).

    All half-open base coordinates.  qs/qe always lie on the forward genome;
    ss/se >= L index the reverse-complement copy at virtual offset L and are
    mapped back by the caller (fwd span = (2L - se, 2L - ss)).
    """

    qs: jnp.ndarray      # int32 [M]
    qe: jnp.ndarray
    ss: jnp.ndarray
    se: jnp.ndarray
    nseeds: jnp.ndarray
    valid: jnp.ndarray   # bool [M]


def _fill_from_marks(values: jnp.ndarray, marks: jnp.ndarray) -> jnp.ndarray:
    """1-D forward fill of `values` from positions where marks is True."""

    def combine(a, b):
        v_a, s_a = a
        v_b, s_b = b
        return jnp.where(s_b, v_b, v_a), s_a | s_b

    filled, _ = jax.lax.associative_scan(
        combine, (jnp.where(marks, values, 0), marks))
    return filled


@partial(jax.jit, static_argnames=(
    "k", "window", "diag_band", "run_gap", "min_seeds", "min_hsp_len",
    "max_hsps"))
def selfjoin_hsps(
    flat: jnp.ndarray,
    *,
    k: int,
    window: int = 4,
    diag_band: int = 32,
    run_gap: int = 96,
    min_seeds: int = 4,
    min_hsp_len: int = 30,
    max_hsps: int = 16_384,
) -> JoinHSPs:
    """All-genome repeat seed HSPs from one code sort + D shifted compares.

    flat: uint8 [L] genome codes (A0 C1 G2 T3, N/masked=4).  N windows never
    match (kmer code -1 -> sorted to the invalid tail).
    """
    L = flat.shape[-1]
    km_f = kmer_codes(flat, k)
    km_r = kmer_codes(revcomp(flat), k)
    padk = jnp.full((k - 1,), -1, jnp.int32)
    codes = jnp.concatenate([km_f, padk, km_r, padk])          # [2L]
    codes = jnp.where(codes < 0, INT32_MAX, codes)
    n = codes.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    codes_s, pos_s = jax.lax.sort((codes, pos), num_keys=1)

    # Emit pairs (i, i+d): same code, first element on the forward strand
    # (qpos < L kills the mirror rc-rc duplicates), and non-trivial
    # separation (diag >= k on same-strand pairs = not a self-overlap).
    qv_parts, sv_parts, ok_parts = [], [], []
    for d in range(1, window + 1):
        eq = (codes_s[:-d] == codes_s[d:]) & (codes_s[:-d] != INT32_MAX)
        qv = pos_s[:-d]
        sv = pos_s[d:]
        ok = eq & (qv < L) & ((sv >= L) | (sv - qv >= k))
        padlen = n - qv.shape[0]
        pad_i = jnp.zeros((padlen,), jnp.int32)
        pad_b = jnp.zeros((padlen,), jnp.bool_)
        qv_parts.append(jnp.concatenate([qv, pad_i]))
        sv_parts.append(jnp.concatenate([sv, pad_i]))
        ok_parts.append(jnp.concatenate([ok, pad_b]))
    qv = jnp.concatenate(qv_parts)                              # [W*2L]
    sv = jnp.concatenate(sv_parts)
    ok = jnp.concatenate(ok_parts)

    # Group co-diagonal seeds: global 2-key int32 sort by (diag band, qpos).
    dbin = (sv - qv) // diag_band
    s_dbin, s_qpos, s_spos, s_ok = jax.lax.sort(
        (jnp.where(ok, dbin, INT32_MAX), jnp.where(ok, qv, INT32_MAX),
         sv, ok.astype(jnp.int32)),
        num_keys=2,
    )
    valid = s_ok.astype(jnp.bool_)

    m = s_qpos.shape[0]
    prev_dbin = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_dbin[:-1]])
    prev_qpos = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_qpos[:-1]])
    brk = (s_dbin != prev_dbin) | (s_qpos - prev_qpos > run_gap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)
    run_start = jax.lax.cummax(jnp.where(brk, idx, -1))
    start_q = _fill_from_marks(s_qpos, brk)
    start_s = _fill_from_marks(s_spos, brk)
    nseeds = idx - run_start + 1
    qs, qe = start_q, s_qpos + k
    ss = jnp.minimum(start_s, s_spos)
    se = jnp.maximum(start_s, s_spos) + k

    nxt_brk = jnp.concatenate([brk[1:], jnp.ones((1,), jnp.bool_)])
    is_end = valid & nxt_brk
    good = is_end & (nseeds >= min_seeds) & (qe - qs >= min_hsp_len)

    # Two-stage compaction: per-tile nonzero, then global.
    T = min(32_768, m)
    n_tiles = (m + T - 1) // T
    padm = n_tiles * T - m

    def tiled(a, fill):
        if padm:
            a = jnp.concatenate([a, jnp.full((padm,), fill, a.dtype)])
        return a.reshape(n_tiles, T)

    g_t = tiled(good, False)
    per_tile = max(32, min(512, max_hsps // max(n_tiles, 1)))

    def tile_compact(g):
        (s,) = jnp.nonzero(g, size=per_tile, fill_value=T - 1)
        cnt = jnp.sum(g)
        v = jax.lax.broadcasted_iota(
            jnp.int32, (per_tile, 1), 0).squeeze(-1) < cnt
        return s, v

    sel_t, valid_t = jax.vmap(tile_compact)(g_t)

    def take_t(a):
        return jnp.take_along_axis(tiled(a, 0), sel_t, axis=1)

    qs2, qe2, ss2, se2, ns2 = map(take_t, (qs, qe, ss, se, nseeds))
    gf = valid_t.reshape(-1)
    n2 = gf.shape[0]
    (sel,) = jnp.nonzero(gf, size=max_hsps, fill_value=n2 - 1)
    count = jnp.sum(gf)
    out_valid = jax.lax.broadcasted_iota(
        jnp.int32, (max_hsps, 1), 0).squeeze(-1) < count
    take = lambda a: jnp.where(out_valid, a.reshape(-1)[sel], 0)
    return JoinHSPs(qs=take(qs2), qe=take(qe2), ss=take(ss2), se=take(se2),
                    nseeds=take(ns2), valid=out_valid)
