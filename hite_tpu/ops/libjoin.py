"""Library-vs-genome k-mer sort-merge join: gather-free copy retrieval.

Replaces the per-segment bucketed-lookup copy mapper (the minimap2
equivalent, reference `get_full_length_copies_minimap2` `Util.py:7933-8030`,
SURVEY.md §3.3 HOT LOOP 3) with ONE global join per call, the same way
`ops.selfjoin` replaced the coarse stage's blastn grid:

1. **One sorted stream.** Genome k-mers (forward + reverse-complement at
   virtual offset L, exactly the selfjoin convention) and candidate k-mers
   (all candidates concatenated with a single N separator) are sorted
   together by (code, tag, pos) with candidate entries tagged to sort FIRST
   within each equal-code run.

2. **Forward-fill pairing.** Within the code-sorted stream, every genome
   entry pairs with its run's last `fill_w` candidate entries, found by
   `fill_w` chained `cummax` fills (no segmented scan, no per-query binary
   search): `j1 = cummax(is_cand ? idx : -1)` is the classic last-marker
   fill, and each further fill chases `j_{w+1} = cummax(is_cand ?
   shift(j_w) : -1)`.  A pair is real iff the filled partner's code equals
   the genome entry's code (same run).  Runs whose genome occupancy exceeds
   `max_occ` stop pairing (minimap2's high-frequency-seed mask equivalent).

3. **The proven downstream.** Pairs (cand, qpos, spos) are sorted by
   (cand, diag band, qpos); co-diagonal runs become HSPs in a budget-sliced
   scan (`libjoin_scan`, the grouped twin of `ops.selfjoin.selfjoin_scan`);
   exact FMEA chaining per (candidate, strand) happens on the host over the
   compacted HSP list (`ops.chain.chain_hsps_host`, native C++).

Why this is the right TPU shape: the superseded path paid 12 binary-search
gather steps + H hit-gathers per query k-mer *per genome segment* — measured
as ~560 s of a 1960 s 8Mbp pipeline run (DESIGN.md stage map).  Here the
only non-elementwise ops are two `lax.sort`s (~0.1 s at 16M keys on v5e)
and budget-sized cummax/take fills, independent of segment count.

Compile-time discipline (see ops/selfjoin.py): scan-family ops never touch
genome-sized arrays directly — the fill runs vmapped over fixed
`slice_size` slices of the sorted stream (slice count is static given the
input shapes), and the HSP scan runs on a fixed `max_seed_pairs` prefix of
the pair stream with power-of-two `budget_slices`.  Slice borders can drop
the tail of one code run each; a candidate has hundreds of k-mer entries,
so losing a handful at borders is inside the chain gap tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes, revcomp

INT32_MAX = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


def _pow2_ceil(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length() if n > 1 else 1


@partial(jax.jit, static_argnames=(
    "k", "diag_band", "fill_w", "max_occ", "slice_size", "slice_quota"))
def libjoin_pairs(
    flat: jnp.ndarray,
    cand_flat: jnp.ndarray,
    cand_id: jnp.ndarray,
    *,
    k: int,
    diag_band: int = 32,
    fill_w: int = 2,
    max_occ: int = 1024,
    slice_size: int = 1 << 20,
    slice_quota: int = 1 << 19,
):
    """Stage 1: sorted (cand, dbin, qpos, spos) seed-pair stream + counts.

    flat:      uint8 [L] genome codes (A0 C1 G2 T3, N/masked=4).
    cand_flat: uint8 [P] all candidates concatenated, one N between them.
    cand_id:   int32 [P] candidate index at each concatenated position
               (value at separator/pad positions is irrelevant — any k-mer
               window containing an N is invalid).

    Returns (s_cand, s_dbin, s_qpos, s_spos, counts) device arrays: the
    (cand, diag band, qpos)-sorted pair stream with invalid entries at the
    tail, and counts = int32 [2] (total real pairs, pairs actually emitted
    after per-slice quotas) so the caller can size the stage-2 scan and
    warn on quota saturation with one fetch.  qpos is in concatenated
    candidate coordinates; spos is virtual (>= L means the rc strand,
    forward span = (2L - se, 2L - ss), the selfjoin convention).
    """
    L = flat.shape[-1]
    km_f = kmer_codes(flat, k)
    km_r = kmer_codes(revcomp(flat), k)
    padk = jnp.full((k - 1,), -1, jnp.int32)
    g_codes = jnp.concatenate([km_f, padk, km_r, padk])          # [2L]
    ck = kmer_codes(cand_flat, k)                                # [Pk]
    Pk = ck.shape[0]
    cid = cand_id[:Pk].astype(jnp.int32)

    n = 2 * L + Pk
    code = jnp.concatenate([g_codes, ck])
    code = jnp.where(code < 0, INT32_MAX, code)
    tag = jnp.concatenate([jnp.ones((2 * L,), jnp.int32),
                           jnp.zeros((Pk,), jnp.int32)])
    gid = jnp.concatenate([jnp.full((2 * L,), -1, jnp.int32), cid])
    pos = jnp.concatenate([
        jax.lax.broadcasted_iota(jnp.int32, (2 * L, 1), 0).squeeze(-1),
        jax.lax.broadcasted_iota(jnp.int32, (Pk, 1), 0).squeeze(-1)])
    # candidates-first within runs; explicit pos key = deterministic order
    # (genome entries ascend in genome order, so `max_occ` caps the run's
    # FIRST occurrences, like minimap2 keeping low-frequency seeds)
    code, tag, pos, gid = jax.lax.sort((code, tag, pos, gid), num_keys=3)

    S = min(slice_size, _pow2_ceil(n))
    K = -(-n // S)
    pad = K * S - n
    if pad:
        code = jnp.concatenate([code, jnp.full((pad,), INT32_MAX, jnp.int32)])
        tag = jnp.concatenate([tag, jnp.ones((pad,), jnp.int32)])
        pos = jnp.concatenate([pos, jnp.zeros((pad,), jnp.int32)])
        gid = jnp.concatenate([gid, jnp.full((pad,), -1, jnp.int32)])
    code = code.reshape(K, S)
    tag = tag.reshape(K, S)
    pos = pos.reshape(K, S)
    gid = gid.reshape(K, S)
    q = min(slice_quota, fill_w * S)

    # per-fill compaction quotas: every scan-family op (cummax, the cumsum
    # inside nonzero) stays at length S — one [fill_w*S] nonzero would put
    # the cumsum in the compile-blowup regime (DESIGN.md).  Fill 0 (the
    # run's last candidate) carries most pairs in the common 1-sharer case,
    # so it gets half the slice quota; the rest share the other half.
    if fill_w == 1:
        quotas = [q]
    else:
        q0 = q // 2
        qw = max(1, (q - q0) // (fill_w - 1))
        quotas = [q0] + [qw] * (fill_w - 1)

    def one_slice(code, tag, pos, gid):
        idx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).squeeze(-1)
        is_cand = (tag == 0) & (code != INT32_MAX)
        fills = [jax.lax.cummax(jnp.where(is_cand, idx, -1))]
        for _ in range(1, fill_w):
            prev = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), fills[-1][:-1]])
            fills.append(jax.lax.cummax(jnp.where(is_cand, prev, -1)))
        # genome ordinal within the run (1-based after the cand block)
        ord1 = idx - fills[0]
        base_ok = (~is_cand) & (code != INT32_MAX) & (ord1 <= max_occ)
        outs = []
        count = jnp.int32(0)
        emitted = jnp.int32(0)
        for jw, qw_ in zip(fills, quotas):
            jc = jnp.clip(jw, 0, S - 1)
            ok = base_ok & (jw >= 0) & (jnp.take(code, jc) == code)
            cw = jnp.sum(ok.astype(jnp.int32))
            count = count + cw
            emitted = emitted + jnp.minimum(cw, qw_)
            (sel,) = jnp.nonzero(ok, size=qw_, fill_value=0)
            keep = jax.lax.broadcasted_iota(
                jnp.int32, (qw_, 1), 0).squeeze(-1) < cw
            outs.append((jnp.where(keep, jnp.take(gid, jc)[sel], INT32_MAX),
                         jnp.where(keep, jnp.take(pos, jc)[sel], INT32_MAX),
                         jnp.where(keep, pos[sel], 0)))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]),
                jnp.concatenate([o[2] for o in outs]),
                count, emitted)

    p_cand, p_qpos, p_spos, counts, emits = jax.vmap(one_slice)(
        code, tag, pos, gid)
    n_total = jnp.sum(counts)
    n_emit = jnp.sum(emits)
    p_cand = p_cand.reshape(-1)
    p_qpos = p_qpos.reshape(-1)
    p_spos = p_spos.reshape(-1)
    valid = p_cand != INT32_MAX
    dbin = jnp.where(valid, (p_spos - p_qpos) // diag_band, INT32_MAX)
    s_cand, s_dbin, s_qpos, s_spos = jax.lax.sort(
        (p_cand, dbin, p_qpos, p_spos), num_keys=4)
    return s_cand, s_dbin, s_qpos, s_spos, jnp.stack([n_total, n_emit])


@partial(jax.jit, static_argnames=("k",))
def libjoin_genome_sorted(flat: jnp.ndarray, *, k: int):
    """One-time genome-side preparation for INDEXED joins.

    Returns (g_code, g_pos, g_ord): the two-strand genome k-mer stream
    (forward + revcomp at virtual offset L, the `libjoin_pairs`
    convention) sorted by (code, pos), plus each entry's 0-based
    occurrence ordinal within its equal-code run.  The genome side of
    every `libjoin_pairs` call is IDENTICAL across calls — re-sorting
    the 2L-element stream per copy-retrieval wave dominated the
    boundary_adjust stages (~86% of their wall in the round-5 profile);
    amortizing it here turns each wave into candidate-sized work
    (`libjoin_pairs_indexed`).
    """
    km_f = kmer_codes(flat, k)
    km_r = kmer_codes(revcomp(flat), k)
    padk = jnp.full((k - 1,), -1, jnp.int32)
    g_codes = jnp.concatenate([km_f, padk, km_r, padk])          # [2L]
    n = g_codes.shape[0]
    code = jnp.where(g_codes < 0, INT32_MAX, g_codes)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    code, pos = jax.lax.sort((code, pos), num_keys=2)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), code[:-1]])
    run_start = jax.lax.cummax(jnp.where(code != prev, idx, -1))
    return code, pos, idx - run_start


@partial(jax.jit, static_argnames=(
    "k", "diag_band", "fill_w", "max_occ", "slice_size", "slice_quota"))
def libjoin_pairs_indexed(
    g_code: jnp.ndarray,
    g_pos: jnp.ndarray,
    g_ord: jnp.ndarray,
    cand_flat: jnp.ndarray,
    cand_id: jnp.ndarray,
    *,
    k: int,
    diag_band: int = 32,
    fill_w: int = 2,
    max_occ: int = 1024,
    slice_size: int = 1 << 20,
    slice_quota: int = 1 << 19,
):
    """`libjoin_pairs` against a pre-sorted genome stream (same contract).

    The joint (genome + candidate) sort is replaced by: sort the
    candidate k-mers alone (tiny), then binary-search each genome
    entry's equal-code candidate run bound (`searchsorted`, log2(Pk)
    vectorized steps into a VMEM-resident array).  Pair emission keeps
    `libjoin_pairs`' exact semantics — every genome occurrence (first
    `max_occ` per code run) pairs with its run's last `fill_w`
    candidate entries — so the emitted pair SET is identical when no
    per-slice quota saturates, and the (cand, dbin, qpos, spos) output
    sort makes downstream order deterministic either way.
    """
    ck = kmer_codes(cand_flat, k)                                # [Pk]
    Pk = ck.shape[0]
    cid = cand_id[:Pk].astype(jnp.int32)
    ccode = jnp.where(ck < 0, INT32_MAX, ck)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (Pk, 1), 0).squeeze(-1)
    ccode, cpos, ccid = jax.lax.sort((ccode, cpos, cid), num_keys=2)

    n = g_code.shape[0]
    hi = jnp.searchsorted(ccode, g_code, side="right").astype(jnp.int32)
    base_ok = (g_code != INT32_MAX) & (g_ord < max_occ)

    S = min(slice_size, _pow2_ceil(n))
    K = -(-n // S)
    pad = K * S - n

    def padded(a, padv):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), padv, a.dtype)])
        return a.reshape(K, S)

    code_s = padded(g_code, INT32_MAX)
    pos_s = padded(g_pos, 0)
    hi_s = padded(hi, 0)
    ok_s = padded(base_ok, False)

    q = min(slice_quota, fill_w * S)
    if fill_w == 1:
        quotas = [q]
    else:
        q0 = q // 2
        qw = max(1, (q - q0) // (fill_w - 1))
        quotas = [q0] + [qw] * (fill_w - 1)

    def one_slice(code, pos, hi, ok):
        outs = []
        count = jnp.int32(0)
        emitted = jnp.int32(0)
        for w, qw_ in enumerate(quotas):
            j = hi - 1 - w
            jc = jnp.clip(j, 0, Pk - 1)
            okw = ok & (j >= 0) & (jnp.take(ccode, jc) == code)
            cw = jnp.sum(okw.astype(jnp.int32))
            count = count + cw
            emitted = emitted + jnp.minimum(cw, qw_)
            (sel,) = jnp.nonzero(okw, size=qw_, fill_value=0)
            keep = jax.lax.broadcasted_iota(
                jnp.int32, (qw_, 1), 0).squeeze(-1) < cw
            outs.append((jnp.where(keep, jnp.take(ccid, jc)[sel], INT32_MAX),
                         jnp.where(keep, jnp.take(cpos, jc)[sel], INT32_MAX),
                         jnp.where(keep, pos[sel], 0)))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]),
                jnp.concatenate([o[2] for o in outs]),
                count, emitted)

    p_cand, p_qpos, p_spos, counts, emits = jax.vmap(
        one_slice, in_axes=(0, 0, 0, 0))(code_s, pos_s, hi_s, ok_s)
    n_total = jnp.sum(counts)
    n_emit = jnp.sum(emits)
    p_cand = p_cand.reshape(-1)
    p_qpos = p_qpos.reshape(-1)
    p_spos = p_spos.reshape(-1)
    valid = p_cand != INT32_MAX
    dbin = jnp.where(valid, (p_spos - p_qpos) // diag_band, INT32_MAX)
    s_cand, s_dbin, s_qpos, s_spos = jax.lax.sort(
        (p_cand, dbin, p_qpos, p_spos), num_keys=4)
    return s_cand, s_dbin, s_qpos, s_spos, jnp.stack([n_total, n_emit])


@partial(jax.jit, static_argnames=(
    "k", "run_gap", "min_seeds", "min_hsp_len", "max_hsps",
    "max_seed_pairs", "budget_slices"))
def libjoin_scan_packed(
    s_cand: jnp.ndarray,
    s_dbin: jnp.ndarray,
    s_qpos: jnp.ndarray,
    s_spos: jnp.ndarray,
    *,
    k: int,
    run_gap: int = 96,
    min_seeds: int = 4,
    min_hsp_len: int = 30,
    max_hsps: int = 1 << 15,
    max_seed_pairs: int = 1 << 20,
    budget_slices: int = 1,
) -> jnp.ndarray:
    """Stage 2: co-diagonal run detection, grouped by candidate.

    The grouped twin of `ops.selfjoin.selfjoin_scan`: runs additionally
    break when the candidate id changes, and the candidate id rides along
    into the output.  Packed into ONE int32 [8, max_hsps] array (rows
    cand, qs, qe, ss, se, nseeds, valid, total-HSP-count broadcast — so
    the caller can detect quota saturation) = one host fetch.
    """
    K = budget_slices
    S = min(max_seed_pairs, s_qpos.shape[0])
    quota = max(1, max_hsps // K)

    def one_slice(s_cand, s_dbin, s_qpos, s_spos):
        valid = s_cand != INT32_MAX
        shift1 = lambda a: jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), a[:-1]])
        brk = ((s_cand != shift1(s_cand)) | (s_dbin != shift1(s_dbin))
               | (s_qpos - shift1(s_qpos) > run_gap))
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
        return (take(s_cand), take(qs), take(qe), take(ss), take(se),
                take(nseeds), out_valid, count)

    if K == 1:
        cand, qs, qe, ss, se, nseeds, out_valid, n_good = one_slice(
            s_cand[:S], s_dbin[:S], s_qpos[:S], s_spos[:S])
    else:
        total = min(K * S, s_qpos.shape[0])
        pad = K * S - total

        def slc(a, padv):
            a = a[:total]
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,), padv, jnp.int32)])
            return a.reshape(K, S)

        cand, qs, qe, ss, se, nseeds, out_valid, n_good = jax.vmap(one_slice)(
            slc(s_cand, INT32_MAX), slc(s_dbin, INT32_MAX),
            slc(s_qpos, INT32_MAX), slc(s_spos, 0))
        cand, qs, qe, ss, se, nseeds = (
            a.reshape(-1) for a in (cand, qs, qe, ss, se, nseeds))
        out_valid = out_valid.reshape(-1)
        n_good = jnp.sum(n_good)
    return jnp.stack([cand, qs, qe, ss, se, nseeds,
                      out_valid.astype(jnp.int32),
                      jnp.full_like(cand, n_good)])
