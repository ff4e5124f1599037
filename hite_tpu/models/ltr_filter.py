"""LTR true/false deep filter (HybridLTR/FiLTR-equivalent, Flax).

Re-designs the reference's dual-branch 2-D CNN (`CNNCAT`,
`bin/FiLTR-main/src/Deep_Learning/hybridLTR_model.py:46-92`): an image
branch over the 100x200 both-ends MSA frame rendered as 3 channels and a
k-mer branch over 3/4/5-mer frequency channels, ResNet-style blocks of
(8,16,32) channels, global average pool, concat, FC 64->16->8->2 with a
0.5 accept threshold (`LTR_filter.py:155-156`).

TPU re-design: channel widths padded to MXU-friendly multiples (32/64/128),
bfloat16 activations, strided convs instead of pooling where it fuses
better.  This is the framework's flagship jittable model (used by
`__graft_entry__.entry`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ResBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1, 1),
                        strides=(self.stride, self.stride), dtype=self.dtype)(x)
        return nn.relu(h + x)


class Branch(nn.Module):
    widths: Sequence[int] = (32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for i, w in enumerate(self.widths):
            h = ResBlock(w, stride=1 if i == 0 else 2, dtype=self.dtype)(h)
        return jnp.mean(h, axis=(1, 2))  # global average pool -> [B, C]


class LTRFilterCNN(nn.Module):
    """Dual-branch CNN: img [B, 100, 200, 3] + kmer [B, Hk, Wk, 2] -> 2."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray, kmer: jnp.ndarray) -> jnp.ndarray:
        a = Branch(dtype=self.dtype, name="image_branch")(img)
        b = Branch(dtype=self.dtype, name="kmer_branch")(kmer)
        h = jnp.concatenate([a, b], axis=-1)
        h = nn.relu(nn.Dense(64, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(16, dtype=self.dtype)(h))
        logits = nn.Dense(2, dtype=jnp.float32)(h)
        return logits


def kmer_channels(seq_freqs_3: jnp.ndarray, seq_freqs_4: jnp.ndarray,
                  height: int = 16) -> jnp.ndarray:
    """Arrange 3-/4-mer frequency vectors into a 2-channel map [B, H, W, 2].

    The reference renders per-window k-mer frequencies over a 5-letter
    alphabet as 2-D channels (`hybridLTR_feature_extractor.py:114-146`);
    here the 64- and 256-dim frequency vectors are tiled into aligned
    [height, 16] planes.
    """
    B = seq_freqs_3.shape[0]
    f3 = jnp.pad(seq_freqs_3, ((0, 0), (0, height * 16 - 64)))
    f4 = jnp.pad(seq_freqs_4, ((0, 0), (0, max(0, height * 16 - 256))))
    f4 = f4[:, : height * 16]
    return jnp.stack(
        [f3.reshape(B, height, 16), f4.reshape(B, height, 16)], axis=-1
    ).astype(jnp.float32)
