"""Terminal repeat scanners: batched local-alignment DP (device kernel).

Replaces the reference's precompiled `itrsearch` / `ltrsearch` ELF tools
(`tools/itrsearch`, invoked `Util.py:216-231` as `itrsearch -i 0.7 -l 7`,
`ltrsearch -i 0.85`): detection of terminal inverted repeats (TIR) and
terminal direct repeats (LTR pairs) in candidate sequences.

TPU-native design: a Smith-Waterman local alignment between the two end
windows of each candidate (one window reverse-complemented for TIRs),
batched over [B] candidates and computed by an anti-diagonal `lax.scan`
that also propagates alignment start coordinates, match counts, and
alignment length — so identity and minimum-length gates (0.7/7 for ITR,
0.85 for LTR) are applied without traceback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import revcomp

NEG = jnp.int32(-(10**9))


class LocalAlign(NamedTuple):
    """Best local alignment per batch element (0-based, half-open)."""

    score: jnp.ndarray    # int32 [B]
    qs: jnp.ndarray       # start in a
    qe: jnp.ndarray       # end in a
    ss: jnp.ndarray       # start in b
    se: jnp.ndarray       # end in b
    matches: jnp.ndarray  # matched bases
    alen: jnp.ndarray     # alignment length (cells)


def batched_local_align(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    match: int = 2,
    mismatch: int = -3,
    gap: int = 4,
    submatrix: jnp.ndarray | None = None,
    invalid_code: int = 4,
) -> LocalAlign:
    """Smith-Waterman between a[B, La] and b[B, Lb] code arrays.

    By default nucleotide scoring (match/mismatch; code >= 4 never
    matches).  With `submatrix` (int32 [A, A], e.g. BLOSUM62 over amino
    acids) scores come from the matrix and `invalid_code` marks padding —
    this is the protein mode used by the blastx-replacement domain engine.
    """
    B, La = a.shape
    Lb = b.shape[1]
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)

    i_arr = jax.lax.broadcasted_iota(jnp.int32, (B, La + 1), 1)  # DP row index

    def empty_plane(fill=0):
        return jnp.full((B, La + 1), fill, jnp.int32)

    # Buffers indexed by DP row i hold the two previous anti-diagonals.
    # Zero-score cells store their own (i, j) as the start coordinate a
    # successor alignment would begin from; diagonal k has j = k - i.
    planes_k1 = dict(h=empty_plane(), si=i_arr,
                     sj=jnp.clip(1 - i_arr, 0, None),
                     m=empty_plane(), l=empty_plane())
    planes_k0 = dict(h=empty_plane(), si=i_arr,
                     sj=jnp.clip(0 - i_arr, 0, None),
                     m=empty_plane(), l=empty_plane())
    init = (planes_k1, planes_k0,
            dict(score=jnp.zeros(B, jnp.int32), qs=jnp.zeros(B, jnp.int32),
                 qe=jnp.zeros(B, jnp.int32), ss=jnp.zeros(B, jnp.int32),
                 se=jnp.zeros(B, jnp.int32), matches=jnp.zeros(B, jnp.int32),
                 alen=jnp.zeros(B, jnp.int32)))

    def shift_right(p):
        """plane[i] -> plane[i-1] (row i reads predecessor row i-1)."""
        return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), p[:, :-1]], axis=1)

    def step(carry, k):
        prev1, prev2, best = carry  # prev1 = diag k-1, prev2 = diag k-2
        j_arr = k - i_arr           # DP col index
        valid = (i_arr >= 1) & (i_arr <= La) & (j_arr >= 1) & (j_arr <= Lb)

        a_sym = jnp.take_along_axis(a32, jnp.clip(i_arr - 1, 0, La - 1), axis=1)
        b_sym = jnp.take_along_axis(b32, jnp.clip(j_arr - 1, 0, Lb - 1), axis=1)
        ok = (a_sym < invalid_code) & (b_sym < invalid_code)
        is_match = (a_sym == b_sym) & ok
        if submatrix is not None:
            sub = submatrix[jnp.clip(a_sym, 0, submatrix.shape[0] - 1),
                            jnp.clip(b_sym, 0, submatrix.shape[1] - 1)]
            sub = jnp.where(ok, sub, mismatch)
        else:
            sub = jnp.where(is_match, match, mismatch)

        d_h = shift_right(prev2["h"])
        u_h = shift_right(prev1["h"])
        l_h = prev1["h"]

        cand_h = jnp.stack([
            jnp.zeros_like(d_h),        # fresh start
            d_h + sub,                  # diagonal
            u_h - gap,                  # gap in b
            l_h - gap,                  # gap in a
        ])
        choice = jnp.argmax(cand_h, axis=0)
        h = jnp.max(cand_h, axis=0)
        h = jnp.where(valid, h, 0)

        def pick(fresh, diag, up, left):
            return jnp.where(choice == 0, fresh,
                   jnp.where(choice == 1, diag,
                   jnp.where(choice == 2, up, left)))

        si = pick(i_arr, shift_right(prev2["si"]),
                  shift_right(prev1["si"]), prev1["si"])
        sj = pick(j_arr, shift_right(prev2["sj"]),
                  shift_right(prev1["sj"]), prev1["sj"])
        m = pick(jnp.zeros_like(h), shift_right(prev2["m"]) + is_match,
                 shift_right(prev1["m"]), prev1["m"])
        ln = pick(jnp.zeros_like(h), shift_right(prev2["l"]) + 1,
                  shift_right(prev1["l"]) + 1, prev1["l"] + 1)

        masked_h = jnp.where(valid, h, NEG)
        row_best = jnp.argmax(masked_h, axis=1)
        row_score = jnp.take_along_axis(masked_h, row_best[:, None], 1)[:, 0]
        improved = row_score > best["score"]

        def sel(new, old):
            return jnp.where(improved, new, old)

        gather = lambda p: jnp.take_along_axis(p, row_best[:, None], 1)[:, 0]
        best = dict(
            score=sel(row_score, best["score"]),
            qs=sel(gather(si), best["qs"]),
            qe=sel(row_best, best["qe"]),                  # end row i == a end
            ss=sel(gather(sj), best["ss"]),
            se=sel(k - row_best, best["se"]),
            matches=sel(gather(m), best["matches"]),
            alen=sel(gather(ln), best["alen"]),
        )
        new_planes = dict(h=h, si=si, sj=sj, m=m, l=ln)
        return (new_planes, prev1, best), None

    ks = jnp.arange(2, La + Lb + 1, dtype=jnp.int32)
    (prev1, prev2, best), _ = jax.lax.scan(step, init, ks)
    return LocalAlign(score=best["score"], qs=best["qs"], qe=best["qe"],
                      ss=best["ss"], se=best["se"], matches=best["matches"],
                      alen=best["alen"])


class TerminalRepeat(NamedTuple):
    """Per-candidate terminal repeat call.

    found:      passes identity/length gates.
    left_start/left_end: repeat span at the 5' end (candidate-local coords).
    right_start/right_end: span at the 3' end (candidate-local coords,
                 forward orientation).
    identity / length: of the terminal alignment.
    """

    found: jnp.ndarray
    left_start: jnp.ndarray
    left_end: jnp.ndarray
    right_start: jnp.ndarray
    right_end: jnp.ndarray
    identity: jnp.ndarray
    length: jnp.ndarray


def _end_windows(seqs: jnp.ndarray, lens: jnp.ndarray, window: int):
    """Extract 5' and 3' windows from padded [B, L] candidates."""
    B, L = seqs.shape
    left = seqs[:, :window]
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, window), 1)
    ridx = lens[:, None] - window + offs
    right = jnp.where(
        ridx >= 0,
        jnp.take_along_axis(seqs, jnp.clip(ridx, 0, L - 1), axis=1),
        4,
    ).astype(seqs.dtype)
    return left, right, jnp.maximum(ridx[:, 0], 0)


def find_terminal_repeat(
    seqs: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    inverted: bool,
    window: int = 40,
    min_identity: float = 0.7,
    min_len: int = 7,
) -> TerminalRepeat:
    """Find the best terminal (inverted or direct) repeat of each candidate.

    inverted=True  -> TIR scan (itrsearch -i 0.7 -l 7 semantics)
    inverted=False -> LTR pair scan (ltrsearch -i 0.85 semantics; callers
                      pass window ~ max LTR length)
    """
    left, right, right_off = _end_windows(seqs, lens, window)
    b = revcomp(right) if inverted else right
    al = batched_local_align(left, b)

    identity = al.matches / jnp.maximum(al.alen, 1)
    length = jnp.minimum(al.qe - al.qs, al.se - al.ss)
    found = (identity >= min_identity) & (length >= min_len) & (al.score > 0)

    if inverted:
        # b is revcomp(right window): position p in b covers right-window
        # position window - p (half-open flip)
        r_start = right_off + (window - al.se)
        r_end = right_off + (window - al.ss)
    else:
        r_start = right_off + al.ss
        r_end = right_off + al.se
    return TerminalRepeat(
        found=found,
        left_start=al.qs, left_end=al.qe,
        right_start=r_start, right_end=r_end,
        identity=identity, length=length,
    )
