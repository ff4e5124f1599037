"""Target-site-duplication (TSD) search (device kernel).

Replaces the reference's `TSDsearch_v1-v5` / `search_confident_tir_v4`
k-mer-dict pairing (`Util.py:2264-2533`, `7734-7845`): a TSD is a short
(2-11 bp) duplication flanking a TE insertion, found within +-radius of the
raw candidate boundaries, tolerating 1 mismatch for sizes >= 8
(`allow_mismatch`, `Util.py:2281`).

TPU-native design: for each TSD size, all left-flank windows are compared
against all right-flank windows at once via a one-hot inner product
(einsum -> MXU): match_count[b, i, j] = <onehot(left window i),
onehot(right window j)>.  Size-specific motif rules (size-2 'TA', size-4
'TTAA' in plants, `Util.py:7801-7804`) are applied as masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import one_hot

# code strings
TA = (3, 0)
TTAA = (3, 3, 0, 0)


class TSDHit(NamedTuple):
    """Best TSD per candidate per size.

    left_pos:  start of the left TSD copy inside the left flank [B, S]
    right_pos: start of the right TSD copy inside the right flank [B, S]
    mismatches, dist (sum of gaps to the raw boundaries), found [B, S]
    sizes: static tuple of the searched sizes.
    """

    left_pos: jnp.ndarray
    right_pos: jnp.ndarray
    mismatches: jnp.ndarray
    dist: jnp.ndarray
    found: jnp.ndarray
    sizes: Tuple[int, ...]


@functools.partial(jax.jit, static_argnames=(
    "sizes", "mismatch_min_len", "plant", "boundary_l", "boundary_r"))
def tsd_search(
    left_flank: jnp.ndarray,
    right_flank: jnp.ndarray,
    *,
    sizes: Sequence[int] = (2, 3, 4, 5, 6, 8, 9, 10, 11),
    mismatch_min_len: int = 8,
    plant: bool = True,
    boundary_l: Optional[int] = None,
    boundary_r: int = 0,
) -> TSDHit:
    """Search for TSDs of each size in paired flank windows.

    left_flank:  uint8 [B, R] window around the candidate start; the element
                 begins at offset `boundary_l` (default: R, i.e. the window
                 is flush against the boundary).
    right_flank: uint8 [B, R] window around the candidate end; the element
                 ends at offset `boundary_r` (default 0).
    The reported `dist` is the summed distance of the TSD pair from those
    boundary offsets (the left copy should END at boundary_l, the right
    copy should START at boundary_r).
    """
    B, R = left_flank.shape
    if boundary_l is None:
        boundary_l = R
    oh_l = one_hot(left_flank, dtype=jnp.float32)   # [B, R, 4]; N -> zeros
    oh_r = one_hot(right_flank, dtype=jnp.float32)

    lp_out, rp_out, mm_out, d_out, f_out = [], [], [], [], []
    for s in sizes:
        I = R - s + 1
        win_l = jnp.stack([oh_l[:, t : t + I] for t in range(s)], axis=2)  # [B,I,s,4]
        win_r = jnp.stack([oh_r[:, t : t + I] for t in range(s)], axis=2)
        wl = win_l.reshape(B, I, s * 4)
        wr = win_r.reshape(B, I, s * 4)
        match = jnp.einsum("bik,bjk->bij", wl, wr,
                           preferred_element_type=jnp.float32)
        mm = s - match.astype(jnp.int32)            # [B, I, J]

        allowed = mm <= (1 if s >= mismatch_min_len else 0)
        # motif gates: size 2 must be TA; size 4 must be TTAA (plant rule,
        # reference Util.py:7801-7804) — checked on the LEFT copy.
        if s == 2 or (s == 4 and plant):
            motif = TA if s == 2 else TTAA
            is_motif = jnp.ones((B, I), jnp.bool_)
            for t, c in enumerate(motif):
                is_motif &= left_flank[:, t : t + I] == c
            allowed &= is_motif[:, :, None]
        # N-containing windows can fake matches (one-hot rows are zero);
        # require both windows N-free.
        ok_l = jnp.ones((B, I), jnp.bool_)
        ok_r = jnp.ones((B, I), jnp.bool_)
        for t in range(s):
            ok_l &= left_flank[:, t : t + I] < 4
            ok_r &= right_flank[:, t : t + I] < 4
        allowed &= ok_l[:, :, None] & ok_r[:, None, :]

        # distance of the TSD pair from the raw boundaries
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (I, I), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (I, I), 1)
        dist = jnp.abs(i_idx + s - boundary_l) + jnp.abs(j_idx - boundary_r)
        big = jnp.int32(10**6)
        cost = jnp.where(allowed, dist[None], big)
        flat = cost.reshape(B, I * I)
        best = jnp.argmin(flat, axis=1)
        best_cost = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        lp = best // I
        rp = best % I
        found = best_cost < big
        lp_out.append(lp)
        rp_out.append(rp)
        mm_out.append(jnp.take_along_axis(
            mm.reshape(B, I * I), best[:, None], 1)[:, 0])
        d_out.append(jnp.where(found, best_cost, big))
        f_out.append(found)

    return TSDHit(
        left_pos=jnp.stack(lp_out, 1),
        right_pos=jnp.stack(rp_out, 1),
        mismatches=jnp.stack(mm_out, 1),
        dist=jnp.stack(d_out, 1),
        found=jnp.stack(f_out, 1),
        sizes=tuple(sizes),
    )
