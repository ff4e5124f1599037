"""Device-side nucleotide code tensor ops.

Codes follow hite_tpu.io.fasta: A=0 C=1 G=2 T=3 N/masked=4.  All functions
are jit-safe pure jnp ops over int8/int32 tensors; N propagates so masked
regions never seed or extend alignments (the reference achieves the same by
overwriting masked genome spans with the letter 'N', `Util.py:6409-6426`).
"""

from __future__ import annotations

import jax.numpy as jnp

CODE_N = 4


def revcomp(codes: jnp.ndarray) -> jnp.ndarray:
    """Reverse complement along the last axis; N stays N."""
    comp = jnp.where(codes < 4, 3 - codes, codes)
    return jnp.flip(comp, axis=-1)


def complement(codes: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(codes < 4, 3 - codes, codes)


def one_hot(codes: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., L] codes -> [..., L, 4] one-hot; N rows are all-zero."""
    eye = jnp.concatenate([jnp.eye(4, dtype=dtype), jnp.zeros((1, 4), dtype=dtype)])
    return eye[jnp.clip(codes, 0, 4).astype(jnp.int32)]


def kmer_codes(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rolling k-mer integer codes along the last axis.

    Returns int32 [..., L - k + 1]; any window containing an N/masked base
    gets code -1 (so it never matches).  Base-4 big-endian packing:
    code = sum_j base[i+j] * 4^(k-1-j).
    """
    L = codes.shape[-1]
    n_kmers = L - k + 1
    acc = jnp.zeros(codes.shape[:-1] + (n_kmers,), dtype=jnp.int32)
    bad = jnp.zeros(codes.shape[:-1] + (n_kmers,), dtype=jnp.bool_)
    c32 = codes.astype(jnp.int32)
    for j in range(k):
        window = c32[..., j : j + n_kmers]
        acc = acc * 4 + jnp.where(window >= 4, 0, window)
        bad = bad | (window >= 4)
    return jnp.where(bad, -1, acc)


def pack_2bit(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack 16 codes into one int32 (2 bits each); N packs as 0 — callers
    must track an N mask separately.  Length must be a multiple of 16."""
    c = jnp.where(codes >= 4, 0, codes).astype(jnp.int32)
    c = c.reshape(codes.shape[:-1] + (-1, 16))
    weights = (jnp.uint32(1) << (2 * jnp.arange(16, dtype=jnp.uint32))).astype(jnp.int32)
    return jnp.sum(c * weights, axis=-1)


def n_mask(codes: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of valid (non-N) positions."""
    return codes < 4
