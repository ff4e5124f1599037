"""Tandem-repeat detection and masking (device kernel).

Replaces TRF (`tools/trf409.linux64`, reference `run_TRF:2876`,
`run_remove_TR:2855`, invoked as `trf 2 7 7 80 10 50 500 -m`): identifies
short-period tandem arrays to (a) mask the genome before coarse repeat
discovery (`filter_tandem_repeats`, `Util.py:4672-4697`) and (b) reject
candidates that are mostly tandem (`tandem_region_cutoff` 0.5).

TPU-native design, two complementary kernels:

* short periods (p <= `max_period`, default 16): positionwise self-match
  `seq[i] == seq[i-p]` for each period p, box-filtered; a position is
  "tandem" when any period's local match density exceeds the threshold.
  Covers the micro/minisatellites that dominate TRF's masking in practice.
* long periods (up to TRF's maxperiod 500, `long_tandem_mask`): one stable
  code sort of all k-mers — a position is "periodic" when its k-mer's
  nearest other occurrence lies within `max_period` bp, and a run of
  densely periodic positions is a tandem array.  Zero gathers and zero
  scatters: sorts in, a position-keyed sort back out (the same
  formulation as `ops.selfjoin`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes

_INT32_MAX = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


def _box_density(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Centered moving average along the last axis (same length).

    Implemented with `lax.reduce_window` — neither a gather nor a
    scan-family op.  Two prior formulations were hardware traps on the
    axon/v5e stack: an index-array window sum lowered to two [., L]
    gathers per call (dominant EXECUTION cost), and a cumsum version hit
    the superlinear scan-COMPILE blowup (a 17-period tandem_mask program
    at [16, 128K] compiled for ~40 min; reduce_window compiles like a
    convolution)."""
    L = x.shape[-1]
    w_lo = window // 2
    w_hi = (window + 1) // 2
    sums = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 1) + (window,),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 1) + [(w_lo, w_hi - 1)])
    idx = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    count = (jnp.minimum(L, idx + w_hi)
             - jnp.maximum(0, idx - w_lo)).astype(jnp.float32)
    return sums / jnp.maximum(count, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("max_period", "density", "window"))
def tandem_mask(
    seqs: jnp.ndarray,
    *,
    max_period: int = 16,
    density: float = 0.8,
    window: int = 24,
) -> jnp.ndarray:
    """Boolean tandem mask over [..., L] code arrays.

    All periods are stacked into one [..., P, L] tensor scored by a SINGLE
    fixed-width reduce_window: the original per-period loop emitted 16
    reduce_windows of distinct window sizes, and that program's remote
    compile ran for >8 min at [16, 128K] on the axon toolchain (hardware
    profile, round 2) — another instance of the scan-family compile
    blowup.  A fixed window is decision-equivalent here: true tandem
    arrays match at EVERY in-array position, so density over 24 bp is
    insensitive to period (long periods are the long_tandem_mask kernel's
    job anyway)."""
    eqs = []
    for p in range(1, max_period + 1):
        eq = (seqs[..., p:] == seqs[..., :-p]) & (seqs[..., p:] < 4)
        eqs.append(jnp.concatenate(
            [jnp.zeros(seqs.shape[:-1] + (p,), jnp.bool_), eq], axis=-1))
    stack = jnp.stack(eqs, axis=-2)               # [..., P, L]
    dens = _box_density(stack, window)
    return (dens >= density).any(-2)


def _long_mask_1d(flat: jnp.ndarray, k: int, max_period: int,
                  density: float, window: int) -> jnp.ndarray:
    """Long-period tandem mask over one [L] code row (see module doc)."""
    L = flat.shape[-1]
    codes = kmer_codes(flat, k)                       # [L - k + 1]
    codes = jnp.where(codes < 0, _INT32_MAX, codes)
    nk = codes.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0).squeeze(-1)
    codes_s, pos_s = jax.lax.sort((codes, pos), num_keys=1)
    # Stable sort => equal codes keep ascending positions; the adjacent
    # sorted pair is each position's nearest other occurrence (either side).
    eq = (codes_s[:-1] == codes_s[1:]) & (codes_s[:-1] != _INT32_MAX)
    pair = (eq & (pos_s[1:] - pos_s[:-1] <= max_period)).astype(jnp.int32)
    padf = jnp.zeros((1,), jnp.int32)
    # an entry is periodic if paired with EITHER sorted neighbor; restore
    # genome order with a second sort keyed by position (a scatter here
    # compiled for ~8 min on the axon Mosaic stack; sorts compile fast)
    per_entry = jnp.maximum(jnp.concatenate([pair, padf]),
                            jnp.concatenate([padf, pair]))
    _, ind = jax.lax.sort((pos_s, per_entry), num_keys=1)
    mask = _box_density(ind, window) >= density       # [nk] k-mer starts
    # A base j belongs to the array if any k-mer start in (j-k, j] is masked.
    full = jnp.concatenate([mask, jnp.zeros((L - nk,), jnp.bool_)])
    out = full
    for s in range(1, k):
        out = out | jnp.concatenate(
            [jnp.zeros((s,), jnp.bool_), full[: L - s]])
    return out


@functools.partial(jax.jit,
                   static_argnames=("k", "max_period", "density", "window"))
def long_tandem_mask(
    seqs: jnp.ndarray,
    *,
    k: int = 12,
    max_period: int = 500,
    density: float = 0.5,
    window: int = 64,
) -> jnp.ndarray:
    """Boolean long-period tandem mask over [..., L] code arrays.

    Parity target: TRF `2 7 7 80 10 50 500` catches arrays with period up
    to 500 and aligned score >= 50 (~>= 25 matching bp); here the density
    window demands >= window*density periodic k-mer starts, i.e. ~32 bp of
    locally recurring sequence (reference invocation `Util.py:2876`).
    """
    fn = functools.partial(_long_mask_1d, k=k, max_period=max_period,
                           density=density, window=window)
    if seqs.ndim == 1:
        return fn(seqs)
    flat = seqs.reshape((-1, seqs.shape[-1]))
    return jax.vmap(fn)(flat).reshape(seqs.shape)


@functools.partial(jax.jit,
                   static_argnames=("max_period", "density", "window"))
def tandem_fraction(seqs: jnp.ndarray, lens: jnp.ndarray, *,
                    max_period: int = 16, density: float = 0.8,
                    window: int = 24) -> jnp.ndarray:
    """Fraction of each (padded) candidate covered by tandem repeats [B]."""
    mask = tandem_mask(seqs, max_period=max_period, density=density,
                       window=window)
    L = seqs.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, seqs.shape, seqs.ndim - 1)
    valid = idx < lens[..., None]
    return jnp.sum(mask & valid, axis=-1) / jnp.maximum(lens, 1)
