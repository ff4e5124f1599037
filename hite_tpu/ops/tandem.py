"""Tandem-repeat detection and masking (device kernel).

Replaces TRF (`tools/trf409.linux64`, reference `run_TRF:2876`,
`run_remove_TR:2855`, invoked as `trf 2 7 7 80 10 50 500 -m`): identifies
short-period tandem arrays to (a) mask the genome before coarse repeat
discovery (`filter_tandem_repeats`, `Util.py:4672-4697`) and (b) reject
candidates that are mostly tandem (`tandem_region_cutoff` 0.5).

TPU-native design: positionwise self-match `seq[i] == seq[i-p]` for each
period p, box-filtered; a position is "tandem" when any period's local
match density exceeds the threshold.  Periods up to `max_period` cover the
micro/minisatellites that dominate TRF's masking in practice; longer-period
tandems are still caught by the coarse self-alignment chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_density(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Centered moving average along the last axis (same length)."""
    c = jnp.cumsum(x.astype(jnp.float32), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)
    L = x.shape[-1]
    idx = jnp.arange(L)
    lo = jnp.clip(idx - window // 2, 0, L)
    hi = jnp.clip(idx + (window + 1) // 2, 0, L)
    return (c[..., hi] - c[..., lo]) / jnp.maximum(hi - lo, 1)


@functools.partial(jax.jit,
                   static_argnames=("max_period", "density", "window"))
def tandem_mask(
    seqs: jnp.ndarray,
    *,
    max_period: int = 16,
    density: float = 0.8,
    window: int = 24,
) -> jnp.ndarray:
    """Boolean tandem mask over [..., L] code arrays."""
    L = seqs.shape[-1]
    out = jnp.zeros(seqs.shape, jnp.bool_)
    for p in range(1, max_period + 1):
        eq = (seqs[..., p:] == seqs[..., :-p]) & (seqs[..., p:] < 4)
        eq_full = jnp.concatenate(
            [jnp.zeros(seqs.shape[:-1] + (p,), jnp.bool_), eq], axis=-1
        )
        dens = _box_density(eq_full, max(window, 2 * p))
        out = out | (dens >= density)
    return out


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
