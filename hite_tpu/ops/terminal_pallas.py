"""Pallas TPU kernel: batched Smith-Waterman anti-diagonal DP in VMEM.

The hot structural-scanning primitive (ITR/LTR terminal detection, LTR
terminal refinement, protein-domain confirmation — `ops.terminal`
`batched_local_align`) as an on-chip kernel: all DP planes live in VMEM
scratch, the anti-diagonal wavefront is a `fori_loop` of elementwise ops +
lane rolls (no gathers — TPU has no vector gather), and per-cell running
bests are reduced once at the end.  The JAX/XLA implementation remains the
reference oracle and the CPU fallback.

Status: compiles and runs natively on the v5e, bit-exact against the XLA
oracle at every probed shape and 1.0-1.8x faster (speedup grows with
sequence length); dispatched automatically on TPU backends by
`ops.terminal.batched_local_align_auto`.  Two Mosaic pitfalls were
root-caused on hardware and are encoded below:

1. constant/iota-derived fori_loop carry inits get (partially) replicated
   layouts, and the loop backedge then demands an invalid non-replicated
   -> replicated relayout ("Invalid relayout ... replicated in
   destination") — every carry plane is derived from an input ref load;
2. `pltpu.roll` with a NEGATIVE dynamic shift amount is mis-lowered for
   widths != 256 (off by width-256 lanes) — the rotate uses the positive
   equivalent amount.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hite_tpu.ops.terminal import LocalAlign

NEG = -(10**9)


def _shift_right(x, fill):
    """x[:, i] <- x[:, i-1]; column 0 <- fill (lane roll + mask)."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == 0, fill, rolled)


def _sw_kernel(a_ref, brev_ref, bh_ref, bsi_ref, bsj_ref, bm_ref, bl_ref,
               bej_ref, *, La, Lb, W, match, mismatch, gap, invalid_code):
    """brev_ref: [B, W + Lb + pad] = [inv]*W ++ reversed(b) ++ [inv]*pad —
    the anti-diagonal's b symbols are a sliding window over reversed b:
    br_k[i] = b[k-1-i] = brev[W + Lb - k + i]."""
    B = a_ref.shape[0]
    inv = jnp.int32(invalid_code)

    i_arr = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    in_row = i_arr <= La
    # a symbol per DP row (row 0 and padding invalid)
    a_sym = _shift_right(
        jnp.where(i_arr < La, a_ref[:, :W], inv), inv)
    a_sym = jnp.where((i_arr >= 1) & in_row, a_sym, inv)

    # NOT jnp.zeros: constant (or iota-derived, row-constant) planes get a
    # (partially) replicated Mosaic layout, and the fori_loop backedge would
    # then need an invalid non-replicated -> replicated relayout ("Invalid
    # relayout ... replicated in destination").  Deriving zero from the input
    # ref (codes are always >= 0) pins a located {0,0} layout on every carry.
    zero = jnp.minimum(a_ref[:, :W], 0)

    def body(k, state):
        (h1, si1, sj1, m1, l1,
         h2, si2, sj2, m2, l2,
         bh, bsi, bsj, bm, bl, bej) = state

        j_arr = k - i_arr
        valid = (i_arr >= 1) & (i_arr <= La) & (j_arr >= 1) & (j_arr <= Lb)

        # sliding-window load of this diagonal's b symbols: dynamic lane
        # offsets must be 128-aligned, so load an aligned superset and
        # rotate the window into place.  The rotate amount MUST be the
        # positive equivalent: Mosaic's dynamic roll with a NEGATIVE
        # amount is mis-lowered for widths != 256 (off by width-256
        # lanes, measured on v5e — exactly width 256 is correct, which is
        # why W=128 cases passed).
        off = W + Lb - k
        astart = pl.multiple_of((off // 128) * 128, 128)
        wide_w = W + 128
        wide = brev_ref[:, pl.ds(astart, wide_w)]
        br = pltpu.roll(wide, shift=(wide_w - off % 128) % wide_w,
                        axis=1)[:, :W]

        ok = (a_sym < invalid_code) & (br < invalid_code)
        is_match = (a_sym == br) & ok
        sub = jnp.where(is_match, match, mismatch)

        d_h = _shift_right(h2, 0)
        u_h = _shift_right(h1, 0)
        l_h = h1

        c_diag = d_h + sub
        c_up = u_h - gap
        c_left = l_h - gap
        h = jnp.maximum(jnp.maximum(c_diag, 0),
                        jnp.maximum(c_up, c_left))
        h = jnp.where(valid, h, 0)
        # choice with diag > up > left > fresh priority on ties
        take_diag = (h == c_diag) & (h > 0)
        take_up = (h == c_up) & ~take_diag & (h > 0)
        take_left = (h == c_left) & ~take_diag & ~take_up & (h > 0)
        fresh = ~(take_diag | take_up | take_left)

        def pick(fr, dg, up, lf):
            return jnp.where(take_diag, dg,
                   jnp.where(take_up, up,
                   jnp.where(take_left, lf, fr)))

        si = pick(i_arr, _shift_right(si2, 0), _shift_right(si1, 0), si1)
        sj = pick(j_arr, _shift_right(sj2, 0), _shift_right(sj1, 0), sj1)
        m = pick(zero, _shift_right(m2, 0) + is_match,
                 _shift_right(m1, 0), m1)
        ln = pick(zero, _shift_right(l2, 0) + 1,
                  _shift_right(l1, 0) + 1, l1 + 1)

        masked_h = jnp.where(valid, h, NEG)
        upd = masked_h > bh
        bh = jnp.where(upd, masked_h, bh)
        bsi = jnp.where(upd, si, bsi)
        bsj = jnp.where(upd, sj, bsj)
        bm = jnp.where(upd, m, bm)
        bl = jnp.where(upd, ln, bl)
        bej = jnp.where(upd, j_arr, bej)

        return (h, si, sj, m, ln,
                h1, si1, sj1, m1, l1,
                bh, bsi, bsj, bm, bl, bej)

    # planes for diagonals k-1 (k=1) and k-2 (k=0); zero-score cells store
    # their own (i, j) as successor-alignment start coordinates
    sj_k1 = jnp.maximum(1 - i_arr, 0) + zero   # + zero: located layout
    init = (zero, i_arr + zero, sj_k1, zero, zero,
            zero, i_arr + zero, zero, zero, zero,
            zero + NEG,
            zero, zero, zero, zero, zero)
    state = jax.lax.fori_loop(2, La + Lb + 1, body, init)
    (_h, _si, _sj, _m, _l, _h2, _si2, _sj2, _m2, _l2,
     bh, bsi, bsj, bm, bl, bej) = state

    # per-cell best planes; the cheap argmax reduction happens outside the
    # kernel (Mosaic relayout limits on [B, 1] broadcast intermediates)
    bh_ref[:] = bh
    bsi_ref[:] = bsi
    bsj_ref[:] = bsj
    bm_ref[:] = bm
    bl_ref[:] = bl
    bej_ref[:] = bej


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap",
                                             "invalid_code", "interpret"))
def batched_local_align_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    match: int = 2,
    mismatch: int = -3,
    gap: int = 4,
    invalid_code: int = 4,
    interpret: bool = False,
) -> LocalAlign:
    """Pallas SW; contract-compatible with ops.terminal.batched_local_align
    (nucleotide mode)."""
    B, La = a.shape
    Lb = b.shape[1]
    W = max(La + 1, 128)
    W = ((W + 127) // 128) * 128
    a_pad = jnp.full((B, W), invalid_code, jnp.int32).at[:, :La].set(
        a.astype(jnp.int32))
    # reversed-b window buffer: [inv]*W ++ reversed(b) ++ [inv]*tail
    total = ((2 * W + Lb + 255) // 128) * 128  # wide loads reach ~2W+Lb+128
    b_pad = jnp.full((B, total), invalid_code, jnp.int32).at[
        :, W : W + Lb].set(jnp.flip(b.astype(jnp.int32), axis=1))

    kernel = functools.partial(_sw_kernel, La=La, Lb=Lb, W=W, match=match,
                               mismatch=mismatch, gap=gap,
                               invalid_code=invalid_code)
    plane = jax.ShapeDtypeStruct((B, W), jnp.int32)
    bh, bsi, bsj, bm, bl, bej = pl.pallas_call(
        kernel,
        out_shape=(plane,) * 6,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        interpret=interpret,
    )(a_pad, b_pad)

    row_best = jnp.argmax(bh, axis=1)
    g = lambda p: jnp.take_along_axis(p, row_best[:, None], 1)[:, 0]
    return LocalAlign(
        score=jnp.maximum(g(bh), 0),
        qs=g(bsi), qe=row_best, ss=g(bsj), se=g(bej),
        matches=g(bm), alen=g(bl),
    )
