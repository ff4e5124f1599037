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
) -> jnp.ndarray:
    """k-mer frequencies of the 5' and 3' terminal windows, concatenated.

    Mirrors NeuralTE's terminal 3-/4-mer features of the located termini
    (`identify_terminals`, `data_util.py:671-733`).  [B, 2 * sum(4^k)].
    """
    B, L = seqs.shape
    head = seqs[:, :window]
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, window), 1)
    ridx = jnp.clip(lens[:, None] - window + offs, 0, L - 1)
    tail = jnp.take_along_axis(seqs, ridx, axis=1)
    head_lens = jnp.minimum(lens, window)
    feats = []
    for k in ks:
        feats.append(kmer_frequencies(head, head_lens, k))
        feats.append(kmer_frequencies(tail, head_lens, k))
    return jnp.concatenate(feats, axis=1)


def classifier_features(
    seqs: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    internal_k: int = 5,
    terminal_ks: Sequence[int] = (3, 4),
    tsd_onehot: jnp.ndarray | None = None,    # [B, 16*5] optional
    domain_onehot: jnp.ndarray | None = None,  # [B, 29] optional
) -> jnp.ndarray:
    """Full NeuralTE-equivalent feature vector [B, F]."""
    parts = [
        kmer_frequencies(seqs, lens, internal_k),
        terminal_kmer_features(seqs, lens, ks=terminal_ks),
    ]
    if tsd_onehot is not None:
        parts.append(tsd_onehot.astype(jnp.float32))
    if domain_onehot is not None:
        parts.append(domain_onehot.astype(jnp.float32))
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
