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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import revcomp

# plain Python int, NOT jnp.int32(...): a module-level CONCRETE jax
# array closed over by traces becomes a jaxpr const, and this jax
# build hoists repeated (by id) consts as phantom executable args that
# the dispatch fastpath then drops (see utils/jitcache.py)
NEG = -(10**9)


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

    Dispatch: traced calls (inside an enclosing jit) inline the core;
    host-level calls go through an EXPLICIT AOT executable cache keyed on
    (shapes, dtypes, statics).  jax's jit dispatch on this function
    intermittently raised "Execution supplied 3 buffers but compiled
    program expected 4 buffers" after many unrelated compilations (CPU
    backend, jax 0.9) — AOT executables take their buffers positionally
    and cannot mis-key.
    """
    import jax.core

    kw = dict(match=match, mismatch=mismatch, gap=gap,
              invalid_code=invalid_code)
    if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
        return _local_align_core(a, b, submatrix=submatrix, **kw)
    from hite_tpu.utils.jitcache import aot_call

    tag = f"local_align:{match},{mismatch},{gap},{invalid_code}"
    if submatrix is None:
        return aot_call(tag, functools.partial(
            _local_align_core, submatrix=None, **kw), a, b)

    def _core_sub(aa, bb, sub):
        return _local_align_core(aa, bb, submatrix=sub, **kw)

    return aot_call(tag + ":sub", _core_sub, a, b, jnp.asarray(submatrix))


def _local_align_core(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    match: int = 2,
    mismatch: int = -3,
    gap: int = 4,
    submatrix: jnp.ndarray | None = None,
    invalid_code: int = 4,
) -> LocalAlign:
    B, La = a.shape
    Lb = b.shape[1]
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)

    i_arr = jax.lax.broadcasted_iota(jnp.int32, (B, La + 1), 1)  # DP row index

    # gather-free symbol access: a's symbol per DP row is constant across
    # diagonals (precomputed); b's symbol per row shifts by one each
    # diagonal, maintained as a rolling buffer in the scan carry.
    inv = jnp.int32(invalid_code)
    a_sym_all = jnp.concatenate(
        [jnp.full((B, 1), inv), a32], axis=1)              # [B, La+1]
    b_padded = jnp.concatenate(
        [b32, jnp.full((B, La + 2), inv)], axis=1)          # safe b[t] reads

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
    # rolling b-symbol buffer: at diagonal k, br[i] == b[k-1-i]
    # (init for k=1: br[0] = b[0], rest invalid)
    br_init = jnp.concatenate(
        [b_padded[:, :1], jnp.full((B, La), inv)], axis=1)  # [B, La+1]

    # per-row-position running best (reduced to one cell after the scan)
    best_init = dict(h=jnp.full((B, La + 1), NEG, jnp.int32),
                     si=empty_plane(), sj=empty_plane(),
                     m=empty_plane(), l=empty_plane(),
                     ej=empty_plane())
    init = (planes_k1, planes_k0, br_init, best_init)

    def shift_right(p):
        """plane[i] -> plane[i-1] (row i reads predecessor row i-1)."""
        return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), p[:, :-1]], axis=1)

    def step(carry, k):
        prev1, prev2, br, best = carry  # prev1 = diag k-1, prev2 = diag k-2
        j_arr = k - i_arr           # DP col index
        valid = (i_arr >= 1) & (i_arr <= La) & (j_arr >= 1) & (j_arr <= Lb)

        # roll the b buffer: new element b[k-1] enters at row 0
        new_b = jax.lax.dynamic_slice(
            b_padded, (0, jnp.clip(k - 1, 0, b_padded.shape[1] - 1)), (B, 1))
        br = jnp.concatenate([new_b, br[:, :-1]], axis=1)

        a_sym = a_sym_all
        b_sym = br
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

        # elementwise running best per row position (no gathers in the loop)
        masked_h = jnp.where(valid, h, NEG)
        upd = masked_h > best["h"]
        best = dict(
            h=jnp.where(upd, masked_h, best["h"]),
            si=jnp.where(upd, si, best["si"]),
            sj=jnp.where(upd, sj, best["sj"]),
            m=jnp.where(upd, m, best["m"]),
            l=jnp.where(upd, ln, best["l"]),
            ej=jnp.where(upd, j_arr, best["ej"]),
        )
        new_planes = dict(h=h, si=si, sj=sj, m=m, l=ln)
        return (new_planes, prev1, br, best), None

    ks = jnp.arange(2, La + Lb + 1, dtype=jnp.int32)
    (prev1, prev2, _br, best), _ = jax.lax.scan(step, init, ks)

    # single final reduction over row positions
    row_best = jnp.argmax(best["h"], axis=1)
    g = lambda p: jnp.take_along_axis(p, row_best[:, None], 1)[:, 0]
    score = g(best["h"])
    return LocalAlign(
        score=jnp.maximum(score, 0),
        qs=g(best["si"]), qe=row_best,
        ss=g(best["sj"]), se=g(best["ej"]),
        matches=g(best["m"]), alen=g(best["l"]),
    )




_PALLAS_MAX_ELEMS = 96 * 1024   # B x lane-padded-W budget (~10MB VMEM working set)


def batched_local_align_auto(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    match: int = 2,
    mismatch: int = -3,
    gap: int = 4,
    invalid_code: int = 4,
) -> LocalAlign:
    """Nucleotide SW with backend dispatch.

    On TPU backends uses the Pallas VMEM kernel (`ops.terminal_pallas`) —
    measured 1.0-1.8x the XLA scan on v5e, growing with sequence length
    and bit-exact against it; on CPU (tests) uses the XLA path.  Batches
    are split into power-of-two chunks to bound the VMEM working set.
    """
    if jax.default_backend() == "cpu" or a.shape[1] > 16_000:
        return batched_local_align(a, b, match=match, mismatch=mismatch,
                                   gap=gap, invalid_code=invalid_code)
    from hite_tpu.ops.terminal_pallas import batched_local_align_pallas

    B, La = a.shape
    W = ((max(La + 1, 128) + 127) // 128) * 128
    chunk = max(8, _PALLAS_MAX_ELEMS // W)
    chunk = 1 << (chunk.bit_length() - 1)
    kw = dict(match=match, mismatch=mismatch, gap=gap,
              invalid_code=invalid_code)
    if B <= chunk:
        return batched_local_align_pallas(a, b, **kw)
    outs = [batched_local_align_pallas(a[i : i + chunk], b[i : i + chunk],
                                       **kw)
            for i in range(0, B, chunk)]
    return LocalAlign(*(jnp.concatenate(parts) for parts in zip(*outs)))


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


def find_terminal_repeat_core(
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
    al = batched_local_align_auto(left, b)

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


# Public jitted entry point.  Call find_terminal_repeat_core when already
# inside a jit trace: a NESTED pjit boundary is what triggers this jax
# build's hoisted-const dispatch bug (see utils/jitcache.py) — the second
# lowered variant of the inner function gains a phantom scalar argument
# that repeat dispatches of the OUTER program then fail to supply.
find_terminal_repeat = functools.partial(jax.jit, static_argnames=(
    "inverted", "window", "min_identity", "min_len"))(
        find_terminal_repeat_core)
