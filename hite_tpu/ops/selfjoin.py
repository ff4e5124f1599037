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

Compile-time discipline (measured on the axon v5e tunnel): `lax.sort`
compiles in 20-50 s even at 16M keys, but scan-family ops (associative_scan
/ cummax / cumsum) blow up superlinearly with array size — an
associative_scan over 16M took >25 min to compile.  So every scan here runs
on a FIXED-SIZE prefix of the sorted seed stream (`max_seed_pairs`):
invalid entries carry INT32_MAX keys and sort to the tail, so truncating
the sorted stream keeps exactly the first `max_seed_pairs` real seed pairs
(grouped by diagonal band, i.e. runs stay contiguous).  The scan section
therefore compiles once per budget — never per genome size — and the
persistent compile cache makes it free across processes.  `n_pairs`
reports the pre-truncation count so callers can warn on saturation.
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
    n_pairs: jnp.ndarray  # int32 [] seed pairs before the budget cut


@partial(jax.jit, static_argnames=(
    "k", "window", "diag_band", "run_gap", "min_seeds", "min_hsp_len",
    "max_hsps", "max_seed_pairs"))
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
    max_seed_pairs: int = 1 << 20,
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
    n_pairs = jnp.sum(ok.astype(jnp.int32))

    # Group co-diagonal seeds: global 2-key int32 sort by (diag band, qpos);
    # invalid entries carry INT32_MAX keys and sort to the tail, so the
    # fixed-size prefix below holds the first `max_seed_pairs` real pairs.
    dbin = (sv - qv) // diag_band
    s_dbin, s_qpos, s_spos = jax.lax.sort(
        (jnp.where(ok, dbin, INT32_MAX), jnp.where(ok, qv, INT32_MAX), sv),
        num_keys=2,
    )
    S = min(max_seed_pairs, s_qpos.shape[0])
    s_dbin, s_qpos, s_spos = s_dbin[:S], s_qpos[:S], s_spos[:S]
    valid = s_dbin != INT32_MAX

    # Run detection on the fixed-size prefix (compiles once per budget).
    prev_dbin = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_dbin[:-1]])
    prev_qpos = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_qpos[:-1]])
    brk = (s_dbin != prev_dbin) | (s_qpos - prev_qpos > run_gap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).squeeze(-1)
    run_start = jax.lax.cummax(jnp.where(brk, idx, -1))
    start_q = jnp.take(s_qpos, run_start)
    start_s = jnp.take(s_spos, run_start)
    nseeds = idx - run_start + 1
    qs, qe = start_q, s_qpos + k
    ss = jnp.minimum(start_s, s_spos)
    se = jnp.maximum(start_s, s_spos) + k

    nxt_brk = jnp.concatenate([brk[1:], jnp.ones((1,), jnp.bool_)])
    is_end = valid & nxt_brk
    good = is_end & (nseeds >= min_seeds) & (qe - qs >= min_hsp_len)

    (sel,) = jnp.nonzero(good, size=max_hsps, fill_value=S - 1)
    count = jnp.sum(good)
    out_valid = jax.lax.broadcasted_iota(
        jnp.int32, (max_hsps, 1), 0).squeeze(-1) < count
    take = lambda a: jnp.where(out_valid, jnp.take(a, sel), 0)
    return JoinHSPs(qs=take(qs), qe=take(qe), ss=take(ss), se=take(se),
                    nseeds=take(nseeds), valid=out_valid, n_pairs=n_pairs)


@partial(jax.jit, static_argnames=(
    "k", "window", "diag_band", "run_gap", "min_seeds", "min_hsp_len",
    "max_hsps", "max_seed_pairs"))
def selfjoin_hsps_packed(flat: jnp.ndarray, **kw) -> jnp.ndarray:
    """`selfjoin_hsps` packed into ONE int32 [6, max_hsps] device array:
    rows qs, qe, ss, se, valid, n_pairs (broadcast).  One host fetch
    instead of seven — the axon tunnel pays a round trip per transfer,
    which dominated the measured coarse stage (selfjoin compute is ~0.1 s
    at 2Mbp; the un-batched fetches were ~0.7 s)."""
    hs = selfjoin_hsps(flat, **kw)
    return jnp.stack([hs.qs, hs.qe, hs.ss, hs.se,
                      hs.valid.astype(jnp.int32),
                      jnp.full_like(hs.qs, hs.n_pairs)])
