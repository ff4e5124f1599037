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

INT32_MAX = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


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


@partial(jax.jit, static_argnames=("k", "window", "diag_band"))
def selfjoin_sorted(
    flat: jnp.ndarray,
    *,
    k: int,
    window: int = 4,
    diag_band: int = 32,
):
    """Stage 1: k-mer sorts + diag-sorted seed stream + exact pair count.

    flat: uint8 [L] genome codes (A0 C1 G2 T3, N/masked=4).  N windows never
    match (kmer code -1 -> sorted to the invalid tail).  Returns device
    arrays (s_dbin, s_qpos, s_spos, n_pairs): the (diag band, qpos)-sorted
    seed stream with invalid entries at the tail, plus the number of real
    seed pairs — so the caller can size the stage-2 scan (budget_slices)
    BEFORE running it, with only one scalar fetch in between.
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
    # invalid entries carry INT32_MAX keys and sort to the tail, so a
    # fixed-size prefix holds the first `max_seed_pairs` real pairs.
    dbin = (sv - qv) // diag_band
    s_dbin, s_qpos, s_spos = jax.lax.sort(
        (jnp.where(ok, dbin, INT32_MAX), jnp.where(ok, qv, INT32_MAX), sv),
        num_keys=2,
    )
    return s_dbin, s_qpos, s_spos, n_pairs


@partial(jax.jit, static_argnames=(
    "k", "run_gap", "min_seeds", "min_hsp_len", "max_hsps",
    "max_seed_pairs", "budget_slices"))
def selfjoin_scan(
    s_dbin: jnp.ndarray,
    s_qpos: jnp.ndarray,
    s_spos: jnp.ndarray,
    n_pairs: jnp.ndarray,
    *,
    k: int,
    run_gap: int = 96,
    min_seeds: int = 4,
    min_hsp_len: int = 30,
    max_hsps: int = 16_384,
    max_seed_pairs: int = 1 << 20,
    budget_slices: int = 1,
) -> JoinHSPs:
    """Stage 2: run detection + HSP compaction on the sorted seed stream.

    Processes `budget_slices` consecutive budget-sized slices (vmapped for
    slices > 1): each slice's run detection is independent — a run crossing
    a slice boundary splits into two HSPs, which downstream FMEA chaining
    re-merges (extend_threshold >> run_gap).  Compiles once per
    (budget, slices); callers round slices up to a power of two so only
    log2 variants ever compile.
    """
    K = budget_slices
    S = min(max_seed_pairs, s_qpos.shape[0])
    quota = max(1, max_hsps // K)

    def one_slice(s_dbin, s_qpos, s_spos):
        valid = s_dbin != INT32_MAX
        prev_dbin = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), s_dbin[:-1]])
        prev_qpos = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), s_qpos[:-1]])
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

        (sel,) = jnp.nonzero(good, size=quota, fill_value=S - 1)
        count = jnp.sum(good)
        out_valid = jax.lax.broadcasted_iota(
            jnp.int32, (quota, 1), 0).squeeze(-1) < count
        take = lambda a: jnp.where(out_valid, jnp.take(a, sel), 0)
        return (take(qs), take(qe), take(ss), take(se), take(nseeds),
                out_valid)

    if K == 1:
        # fast path: the batched (vmapped) scan section compiles AND runs
        # markedly worse even at K=1 on this toolchain (batched cummax),
        # so the common case stays unbatched
        qs, qe, ss, se, nseeds, out_valid = one_slice(
            s_dbin[:S], s_qpos[:S], s_spos[:S])
        return JoinHSPs(qs=qs, qe=qe, ss=ss, se=se, nseeds=nseeds,
                        valid=out_valid, n_pairs=n_pairs)

    total = min(K * S, s_qpos.shape[0])
    pad = K * S - total
    if pad:
        padv = jnp.full((pad,), INT32_MAX, jnp.int32)
        s_dbin = jnp.concatenate([s_dbin[:total], padv]).reshape(K, S)
        s_qpos = jnp.concatenate([s_qpos[:total], padv]).reshape(K, S)
        s_spos = jnp.concatenate([s_spos[:total], padv]).reshape(K, S)
    else:
        s_dbin = s_dbin[:total].reshape(K, S)
        s_qpos = s_qpos[:total].reshape(K, S)
        s_spos = s_spos[:total].reshape(K, S)
    qs, qe, ss, se, nseeds, out_valid = jax.vmap(one_slice)(
        s_dbin, s_qpos, s_spos)
    flat_ = lambda a: a.reshape(-1)
    return JoinHSPs(qs=flat_(qs), qe=flat_(qe), ss=flat_(ss), se=flat_(se),
                    nseeds=flat_(nseeds), valid=flat_(out_valid),
                    n_pairs=n_pairs)


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
    budget_slices: int = 1,
) -> JoinHSPs:
    """All-genome repeat seed HSPs (stage1 + stage2 convenience wrapper)."""
    s_dbin, s_qpos, s_spos, n_pairs = selfjoin_sorted(
        flat, k=k, window=window, diag_band=diag_band)
    return selfjoin_scan(
        s_dbin, s_qpos, s_spos, n_pairs, k=k, run_gap=run_gap,
        min_seeds=min_seeds, min_hsp_len=min_hsp_len, max_hsps=max_hsps,
        max_seed_pairs=max_seed_pairs, budget_slices=budget_slices)


@partial(jax.jit, static_argnames=(
    "k", "run_gap", "min_seeds", "min_hsp_len", "max_hsps",
    "max_seed_pairs", "budget_slices"))
def selfjoin_scan_packed(s_dbin, s_qpos, s_spos, n_pairs,
                         **kw) -> jnp.ndarray:
    """`selfjoin_scan` packed into ONE int32 [6, max_hsps-ish] device
    array: rows qs, qe, ss, se, valid, n_pairs (broadcast).  One host
    fetch instead of seven — the axon tunnel pays a round trip per
    transfer, which dominated the measured coarse stage (selfjoin compute
    is ~0.1 s at 2Mbp; the un-batched fetches were ~0.7 s)."""
    hs = selfjoin_scan(s_dbin, s_qpos, s_spos, n_pairs, **kw)
    return jnp.stack([hs.qs, hs.qe, hs.ss, hs.se,
                      hs.valid.astype(jnp.int32),
                      jnp.full_like(hs.qs, hs.n_pairs)])
