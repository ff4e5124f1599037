"""TE superfamily classifier (NeuralTE-equivalent, Flax).

Re-designs `bin/NeuralTE/src/CNN_Model.py:127-144` (Keras 1-D CNN: 3x
Conv1D(16, k=7) -> Dropout -> Dense 128 -> softmax 28) for TPU: wider
channels (MXU-friendly multiples), bfloat16 activations, same feature
contract (internal 5-mer + terminal 3/4-mer frequencies + optional TSD /
domain one-hots, `hite_tpu.models.features.classifier_features`) and the
same 28-class Wicker superfamily output (`configs/config.py:58-63`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# 28 Wicker superfamily labels (bin/NeuralTE/configs/config.py:58-63) and
# their RepeatMasker equivalents (data/TEClasses.tsv via getRMToWicker).
WICKER_CLASSES = (
    "Copia", "Gypsy", "Bel-Pao", "Retrovirus", "DIRS", "Ngaro", "VIPER",
    "Penelope", "R2", "RTE", "Jockey", "L1", "I", "tRNA", "7SL", "5S",
    "Tc1-Mariner", "hAT", "Mutator", "Merlin", "Transib", "P", "PiggyBac",
    "PIF-Harbinger", "CACTA", "Crypton", "Helitron", "Maverick",
)

WICKER_TO_RM = {
    "Copia": "LTR/Copia", "Gypsy": "LTR/Gypsy", "Bel-Pao": "LTR/Pao",
    "Retrovirus": "LTR/ERV", "DIRS": "LTR/DIRS", "Ngaro": "LTR/Ngaro",
    "VIPER": "LTR/Viper", "Penelope": "LINE/Penelope", "R2": "LINE/R2",
    "RTE": "LINE/RTE", "Jockey": "LINE/Jockey", "L1": "LINE/L1",
    "I": "LINE/I", "tRNA": "SINE/tRNA", "7SL": "SINE/7SL", "5S": "SINE/5S",
    "Tc1-Mariner": "DNA/TcMar", "hAT": "DNA/hAT", "Mutator": "DNA/MULE",
    "Merlin": "DNA/Merlin", "Transib": "DNA/CMC-Transib", "P": "DNA/P",
    "PiggyBac": "DNA/PiggyBac", "PIF-Harbinger": "DNA/PIF-Harbinger",
    "CACTA": "DNA/CMC-EnSpm", "Crypton": "DNA/Crypton",
    "Helitron": "RC/Helitron", "Maverick": "DNA/Maverick",
}


class SuperfamilyCNN(nn.Module):
    """1-D CNN over the feature vector (treated as a length axis)."""

    num_classes: int = 28
    channels: Sequence[int] = (32, 32, 32)
    kernel: int = 7
    hidden: int = 256
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: [B, F] feature vector -> [B, F, 1] sequence for 1-D convs
        h = x.astype(self.dtype)[..., None]
        for ch in self.channels:
            h = nn.Conv(ch, kernel_size=(self.kernel,), dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.reshape(h.shape[0], -1)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        h = nn.relu(h)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32)(h)
        return logits


def predict_labels(logits: jnp.ndarray, is_wicker: bool = True,
                   restrict=None):
    """argmax logits -> label strings (Wicker or RepeatMasker vocabulary).

    restrict: optional iterable of Wicker class names — classes outside it
    are masked before the argmax (e.g. intact LTR elements may only take
    LTR superfamilies, as NeuralTE's LTR mode does by construction)."""
    import numpy as np

    scores = np.asarray(logits, np.float32)
    if restrict is not None:
        allowed = {c for c in restrict}
        mask = np.array([c in allowed for c in WICKER_CLASSES])
        scores = np.where(mask[None, :], scores, -np.inf)
    idx = scores.argmax(axis=-1)
    if is_wicker:
        return [WICKER_CLASSES[i] for i in idx]
    return [WICKER_TO_RM[WICKER_CLASSES[i]] for i in idx]


LTR_SUPERFAMILIES = ("Copia", "Gypsy", "Bel-Pao", "Retrovirus", "DIRS",
                     "Ngaro", "VIPER")
# cut-and-paste DNA transposons (Wicker class II subclass 1/2, minus RC)
DNA_SUPERFAMILIES = ("Tc1-Mariner", "hAT", "Mutator", "Merlin", "Transib",
                     "P", "PiggyBac", "PIF-Harbinger", "CACTA", "Crypton",
                     "Maverick")
# non-LTR retrotransposons (LINE + SINE superfamilies)
NONLTR_SUPERFAMILIES = ("Penelope", "R2", "RTE", "Jockey", "L1", "I",
                        "tRNA", "7SL", "5S")
