"""FMEA chain merging of HSPs (device kernel).

Re-implements the decision core of the reference's FMEA algorithm
(`get_longest_repeats_v4`, `Util.py:4122-4400`; variants `FMEA_new:12340`):
HSPs between a query and subject are greedily chained along the query,
tolerating gaps up to `fixed_extend_base_threshold` on BOTH query and
subject, and each chain's query/subject extents become repeat candidates.

TPU-native formulation: HSPs are sorted by query start with one `lax.sort`,
then a single `lax.scan` merges each HSP into the running chain when both
gaps are within tolerance, emitting the closed chain otherwise.  Static
shapes throughout; vmap over segment-pair batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.seedext import HSPs

INT32_MAX = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


class Chains(NamedTuple):
    qs: jnp.ndarray      # int32 [C]
    qe: jnp.ndarray
    ss: jnp.ndarray
    se: jnp.ndarray
    nseeds: jnp.ndarray
    valid: jnp.ndarray   # bool [C]


def chain_hsps(
    hsps: HSPs,
    *,
    extend_threshold: int,
    max_chains: int = 512,
    min_len: int = 80,
    group: jnp.ndarray | None = None,
) -> Chains:
    """Greedy-merge sorted HSPs into chains (one subject, one strand).

    extend_threshold: max tolerated gap on query AND subject between
    consecutive chained HSPs (reference's fixed_extend_base_threshold,
    adaptive 2000-4000 bp, `Util.py:14641-14654`).

    group: optional int32 [M] subject-group id per HSP (e.g. the library
    entry an HSP lands in when the subject is a concatenated multi-sequence
    index) — HSPs are sorted by (group, qs) and never chain across groups.
    """
    n = hsps.qs.shape[-1]
    g = group if group is not None else jnp.zeros_like(hsps.qs)
    g = jnp.where(hsps.valid, g, INT32_MAX)
    qkey = jnp.where(hsps.valid, hsps.qs, INT32_MAX)
    g, qs, qe, ss, se, nseeds, valid_i = jax.lax.sort(
        (g, qkey, hsps.qe, hsps.ss, hsps.se, hsps.nseeds,
         hsps.valid.astype(jnp.int32)),
        num_keys=2,
    )
    valid = valid_i.astype(jnp.bool_)

    T = jnp.int32(extend_threshold)

    def step(carry, x):
        cqs, cqe, css, cse, cn, cg, active = carry
        xqs, xqe, xss, xse, xn, xg, xvalid = x
        q_ok = (xqs - cqe) <= T
        # subject-side tolerance: next HSP's subject span must sit within
        # threshold of the chain's subject extent and not jump backwards
        # past tolerance (co-linear up to T, mirroring FMEA's two-sided gap).
        s_ok = (jnp.abs(xss - cse) <= T) & (xse >= css)
        mergeable = active & xvalid & q_ok & s_ok & (xg == cg)
        # Emit the closed chain when we can't merge and a chain is active.
        emit = active & xvalid & ~mergeable
        emitted = (cqs, cqe, css, cse, cn, emit)
        new_carry = jax.tree.map(
            lambda cur, new: jnp.where(mergeable, cur, new),
            (cqs, jnp.maximum(cqe, xqe), jnp.minimum(css, xss),
             jnp.maximum(cse, xse), cn + xn, cg, active),
            (xqs, xqe, xss, xse, xn, xg, xvalid | active),
        )
        # If x is invalid, keep the carry untouched.
        new_carry = jax.tree.map(
            lambda new, cur: jnp.where(xvalid, new, cur),
            new_carry,
            (cqs, cqe, css, cse, cn, cg, active),
        )
        return new_carry, emitted

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    carry, emitted = jax.lax.scan(step, init, (qs, qe, ss, se, nseeds, g, valid))

    e_qs, e_qe, e_ss, e_se, e_n, e_valid = emitted
    # Append the final open chain.
    f_qs, f_qe, f_ss, f_se, f_n, _f_g, f_active = carry
    e_qs = jnp.concatenate([e_qs, f_qs[None]])
    e_qe = jnp.concatenate([e_qe, f_qe[None]])
    e_ss = jnp.concatenate([e_ss, f_ss[None]])
    e_se = jnp.concatenate([e_se, f_se[None]])
    e_n = jnp.concatenate([e_n, f_n[None]])
    e_valid = jnp.concatenate([e_valid, f_active[None]])

    good = e_valid & ((e_qe - e_qs) >= min_len)
    (sel,) = jnp.nonzero(good, size=max_chains, fill_value=n)
    count = jnp.sum(good)
    out_valid = jax.lax.broadcasted_iota(jnp.int32, (max_chains, 1), 0).squeeze(-1) < count
    take = lambda a: jnp.where(out_valid, a[jnp.clip(sel, 0, n)], 0)
    return Chains(qs=take(e_qs), qe=take(e_qe), ss=take(e_ss), se=take(e_se),
                  nseeds=take(e_n), valid=out_valid)


def chain_hsps_host(
    qs: "np.ndarray",
    qe: "np.ndarray",
    ss: "np.ndarray",
    se: "np.ndarray",
    *,
    extend_threshold: int,
    min_len: int = 80,
    diag_tol: int = 0,
) -> "np.ndarray":
    """Exact FMEA greedy chaining on the host (numpy), multiple open chains.

    Mirrors the reference's semantics more closely than the single-carry
    device scan: HSPs are walked in query order and merged into ANY open
    chain whose query gap and subject gap are both within
    `extend_threshold` (the reference first clusters HSPs by subject gap,
    then chains along the query — `Util.py:4176-4313`); interleaved copies
    therefore chain independently instead of breaking each other.

    Intended for the (small, compacted) HSP output of the global self-join
    kernel, where chaining on-device would need a long sequential scan.
    Returns int64 [C, 4] chains as (qs, qe, ss, se).

    Dispatches to the native C++ implementation (`native/chain.cc`) when
    the host library is available; this Python loop is the oracle and
    fallback (tests assert they agree).
    """
    import numpy as np

    if len(qs) == 0:
        return np.zeros((0, 4), dtype=np.int64)

    try:
        from hite_tpu.native import runtime as native_rt

        out = native_rt.fmea_chain(qs, qe, ss, se, extend_threshold, min_len,
                                   diag_tol=diag_tol)
        if out is not None:
            return out
    except Exception:
        pass
    return chain_hsps_host_py(qs, qe, ss, se,
                              extend_threshold=extend_threshold,
                              min_len=min_len, diag_tol=diag_tol)


def chain_hsps_host_py(
    qs: "np.ndarray",
    qe: "np.ndarray",
    ss: "np.ndarray",
    se: "np.ndarray",
    *,
    extend_threshold: int,
    min_len: int = 80,
    diag_tol: int = 0,
) -> "np.ndarray":
    """Pure-Python FMEA chaining (the oracle for native/chain.cc)."""
    import numpy as np

    if len(qs) == 0:
        return np.zeros((0, 4), dtype=np.int64)
    order = np.argsort(qs, kind="stable")
    qs, qe, ss, se = (np.asarray(a, dtype=np.int64)[order]
                      for a in (qs, qe, ss, se))
    T = int(extend_threshold)
    closed: list = []
    # open chains as parallel python lists (few survive pruning at a time)
    o_qs: list = []
    o_qe: list = []
    o_ss: list = []
    o_se: list = []
    for i in range(len(qs)):
        x_qs, x_qe, x_ss, x_se = qs[i], qe[i], ss[i], se[i]
        merged = False
        j = 0
        while j < len(o_qs):
            if x_qs - o_qe[j] > T:           # too far behind: close it
                closed.append((o_qs[j], o_qe[j], o_ss[j], o_se[j]))
                o_qs.pop(j); o_qe.pop(j); o_ss.pop(j); o_se.pop(j)
                continue
            diag_ok = (diag_tol <= 0
                       or abs((x_ss - x_qs) - (o_se[j] - o_qe[j]))
                       <= diag_tol)
            if (not merged and diag_ok and abs(x_ss - o_se[j]) <= T
                    and x_se >= o_ss[j]):
                o_qe[j] = max(o_qe[j], x_qe)
                o_ss[j] = min(o_ss[j], x_ss)
                o_se[j] = max(o_se[j], x_se)
                merged = True
            j += 1
        if not merged:
            o_qs.append(x_qs); o_qe.append(x_qe)
            o_ss.append(x_ss); o_se.append(x_se)
    closed.extend(zip(o_qs, o_qe, o_ss, o_se))
    out = np.array(closed, dtype=np.int64).reshape(-1, 4)
    return out[(out[:, 1] - out[:, 0]) >= min_len]
