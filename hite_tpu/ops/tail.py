"""PolyA / tandem tail detection for non-LTR candidates (device kernel).

Replaces `find_tail_polyA` (`Util.py:10832`) and
`find_longest_tandem_repeat_tail` (`Util.py:9732`): LINE/SINE elements end
in a polyA tail or a short tandem-repeat tail, searched in the last ~30 bp.
Vectorized run-length logic over [B, W] windows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TailCall(NamedTuple):
    polya_len: jnp.ndarray      # longest A-run in the tail window [B]
    polyt_len: jnp.ndarray      # longest T-run (minus-strand elements) [B]
    tandem_len: jnp.ndarray     # longest period-2..6 tandem run [B]
    polya_end: jnp.ndarray      # offset of the A-run end within the window [B]


def _longest_run(mask: jnp.ndarray):
    """Longest True-run per row of [B, W]; returns (length, end_offset)."""
    B, W = mask.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    last_false = jax.lax.cummax(jnp.where(~mask, idx, -1), axis=1)
    run_len = jnp.where(mask, idx - last_false, 0)
    best = jnp.max(run_len, axis=1)
    end = jnp.argmax(run_len, axis=1) + 1
    return best, end


def _tail_window(seqs: jnp.ndarray, lens: jnp.ndarray, window: int):
    B, L = seqs.shape
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, window), 1)
    idx = lens[:, None] - window + offs
    return jnp.where(
        idx >= 0, jnp.take_along_axis(seqs, jnp.clip(idx, 0, L - 1), 1), 4
    ).astype(seqs.dtype)


import functools


@functools.partial(jax.jit, static_argnames=("window",))
def tail_scan(seqs: jnp.ndarray, lens: jnp.ndarray, window: int = 30) -> TailCall:
    """Scan the last `window` bp of padded [B, L] candidates.

    Jitted (one program): the eager form was ~30 separate tunnel
    dispatches — the whole 29 s of non_ltr.tail_gate in the 8 Mbp warm
    stage map."""
    w = _tail_window(seqs, lens, window)
    a_len, a_end = _longest_run(w == 0)
    t_len, _ = _longest_run(w == 3)

    tandem_best = jnp.zeros(lens.shape, jnp.int32)
    for p in range(2, 7):
        eq = (w[:, p:] == w[:, :-p]) & (w[:, p:] < 4)
        run, _ = _longest_run(eq)
        # a run of length r at period p covers r + p bases of tandem
        tandem_best = jnp.maximum(tandem_best, jnp.where(run > 0, run + p, 0))
    return TailCall(polya_len=a_len, polyt_len=t_len,
                    tandem_len=tandem_best, polya_end=a_end)
