"""Feature extraction for the neural TE classifiers (device ops).

Re-implements the NeuralTE feature pipeline (`bin/NeuralTE/utils/data_util.py`,
SURVEY.md §2.D): internal 5-mer frequencies (4^5), terminal 3-/4-mer
frequencies of the LTR/TIR termini, optional TSD one-hot and domain one-hot
— and the HybridLTR 2-D inputs (`hybridLTR_feature_extractor.py:114-171`):
both-ends MSA frame rendered as image channels plus k-mer frequency maps.

All feature ops are pure jnp over code tensors; k-mer histograms use
scatter-add over rolling k-mer codes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes


def kmer_frequencies(seqs: jnp.ndarray, lens: jnp.ndarray, k: int) -> jnp.ndarray:
    """Normalized k-mer frequency vectors [B, 4^k] from [B, L] codes."""
    B, L = seqs.shape
    codes = kmer_codes(seqs, k)                       # [B, L-k+1]
    n = codes.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    valid = (codes >= 0) & (idx < (lens[:, None] - k + 1))
    target = jnp.where(valid, codes, 4**k)            # invalid -> trash bin
    hist = jnp.zeros((B, 4**k + 1), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
    hist = hist.at[rows.reshape(-1), target.reshape(-1)].add(1.0)
    hist = hist[:, : 4**k]
    return hist / jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1.0)


def terminal_kmer_features(
    seqs: jnp.ndarray, lens: jnp.ndarray,
    *, window: int = 50, ks: Sequence[int] = (3, 4),
    term_lens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """k-mer frequencies of the 5' and 3' terminal windows, concatenated.

    Mirrors NeuralTE's terminal 3-/4-mer features of the LOCATED termini
    (`identify_terminals`, `data_util.py:671-733`): when `term_lens` [B]
    is given (from `locate_termini` — the ltrsearch/itrsearch-equivalent
    terminal scan), each row's terminal window is its located terminal
    length (clipped to `window`); otherwise a fixed `window` bp.
    [B, 2 * sum(4^k)].
    """
    B, L = seqs.shape
    head = seqs[:, :window]
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, window), 1)
    win_lens = (jnp.minimum(jnp.maximum(term_lens, 7), window)
                if term_lens is not None
                else jnp.full((B,), window, jnp.int32))
    win_lens = jnp.minimum(win_lens, lens)
    # 3' window: last win_lens[b] bases, right-aligned into [B, window]
    ridx = jnp.clip(lens[:, None] - window + offs, 0, L - 1)
    tail = jnp.take_along_axis(seqs, ridx, axis=1)
    # mask tail positions before the located terminal start
    mask = offs >= (window - win_lens[:, None])
    tail = jnp.where(mask, tail, 4)
    # shift so the terminal starts at column 0 (kmer_frequencies masks by
    # a prefix length) — roll each row left by (window - win_lens)
    shift = (window - win_lens)[:, None]
    rolled_idx = jnp.clip(offs + shift, 0, window - 1)
    tail = jnp.take_along_axis(tail, rolled_idx, axis=1)
    feats = []
    for k in ks:
        feats.append(kmer_frequencies(head, win_lens, k))
        feats.append(kmer_frequencies(tail, win_lens, k))
    return jnp.concatenate(feats, axis=1)


def locate_termini(seqs: jnp.ndarray, lens: jnp.ndarray,
                   *, ltr_window: int = 100, itr_window: int = 40,
                   ) -> jnp.ndarray:
    """Terminal lengths [B] from the ltrsearch/itrsearch-equivalent scan.

    NeuralTE locates each TE's termini by running `ltrsearch -l 50` then
    `itrsearch -i 0.7 -l 7` (`identify_terminals`, data_util.py:671-733)
    and takes the terminal k-mer features over the located terminal.
    Here both scans are one batched SW each; rows where neither scan
    finds a terminal fall back to 50 bp.
    """
    # the CORE (un-jitted) scan: locate_termini always runs inside a
    # jitted feature program, and a nested pjit boundary triggers the
    # hoisted-const dispatch bug (utils/jitcache.py)
    from hite_tpu.ops.terminal import find_terminal_repeat_core

    ltr = find_terminal_repeat_core(
        seqs, lens, inverted=False, window=ltr_window,
        min_identity=0.85, min_len=50)
    itr = find_terminal_repeat_core(
        seqs, lens, inverted=True, window=itr_window,
        min_identity=0.7, min_len=7)
    term = jnp.where(ltr.found, ltr.length,
                     jnp.where(itr.found, itr.length, 50))
    return term.astype(jnp.int32)


def classifier_features(
    seqs: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    internal_k: int = 5,
    terminal_ks: Sequence[int] = (3, 4),
    term_lens: jnp.ndarray | None = None,      # [B] located terminal lengths
    tsd_onehot: jnp.ndarray | None = None,     # [B, 16*5]
    domain_onehot: jnp.ndarray | None = None,  # [B, 29]
) -> jnp.ndarray:
    """Full NeuralTE-equivalent feature vector [B, F].

    The TSD and domain blocks are ALWAYS part of the vector (fixed F for
    one checkpoint across call sites, the reference's use_TSD-1 feature
    contract): absent inputs encode as the all-"absent" one-hot rows —
    exactly what a sequence with no TSD / no protein hit produces.
    """
    B = seqs.shape[0]
    if tsd_onehot is None:
        tsd_onehot = tsd_feature(jnp.full((B, 1), 4, jnp.int32),
                                 jnp.zeros((B,), jnp.int32))
    if domain_onehot is None:
        domain_onehot = jax.nn.one_hot(
            jnp.full((B,), 28, jnp.int32), 29, dtype=jnp.float32)
    parts = [
        kmer_frequencies(seqs, lens, internal_k),
        terminal_kmer_features(seqs, lens, ks=terminal_ks,
                               term_lens=term_lens),
        tsd_onehot.astype(jnp.float32),
        domain_onehot.astype(jnp.float32),
    ]
    return jnp.concatenate(parts, axis=1)


def tsd_feature(tsd_codes: jnp.ndarray, tsd_lens: jnp.ndarray,
                max_len: int = 16) -> jnp.ndarray:
    """TSD one-hot block [B, max_len * 5] (base or absent per position)."""
    B, L = tsd_codes.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, max_len), 1)
    codes = jnp.where(
        pos < jnp.minimum(tsd_lens, max_len)[:, None],
        jnp.pad(tsd_codes, ((0, 0), (0, max(0, max_len - L))),
                constant_values=4)[:, :max_len].astype(jnp.int32),
        4,
    )
    return jax.nn.one_hot(codes, 5, dtype=jnp.float32).reshape(B, max_len * 5)


def frame_image(M: jnp.ndarray, n_rows: int = 100) -> jnp.ndarray:
    """Render an [R, L] MSA matrix as HybridLTR-style image channels.

    Channels (cf. `hybridLTR_feature_extractor.py:148-171`):
      0: gap/absence map, 1: column-support (agreement with column majority),
      2: base encoding scaled to [0, 1].
    Returns float32 [n_rows, L, 3] (rows clipped/padded).
    """
    R, L = M.shape
    Mi = M.astype(jnp.int32)
    gap = (Mi >= 4).astype(jnp.float32)
    counts = jnp.sum(jax.nn.one_hot(Mi, 6, dtype=jnp.int32), axis=0)  # [L, 6]
    majority = jnp.argmax(counts[:, :4], axis=1)
    support = ((Mi == majority[None, :]) & (Mi < 4)).astype(jnp.float32)
    base = jnp.where(Mi < 4, (Mi + 1).astype(jnp.float32) / 4.0, 0.0)
    img = jnp.stack([gap, support, base], axis=-1)
    if R < n_rows:
        img = jnp.pad(img, ((0, n_rows - R), (0, 0), (0, 0)))
    else:
        img = img[:n_rows]
    return img
