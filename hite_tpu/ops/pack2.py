"""2-bit genome packing (host codec + device unpack).

The reference handles >=2 GB genomes through its chunk/threshold tiers
(`main.py:328-329`); hite_tpu keeps the genome resident as uint8 codes,
which at >1 Gbp costs real host memory and — worse on the remote-TPU
tunnel — real upload bandwidth every time the progressively-masked copy
is invalidated (each module's mask_intervals re-uploads the whole flat
genome).  Packing stores ACGT in 2 bits plus an N bitmask (3 bits/bp,
2.67x smaller), and the device unpacks with one jitted
program, so uploads ship ~1/4 of the bytes.

Codes: A0 C1 G2 T3, N/masked 4 (io.fasta.CODE_N).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_codes(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
    """uint8 codes [L] -> (packed uint8 [ceil(L/4)], nmask uint8
    [ceil(L/8)], L).  N (code >= 4) packs as base 0 + an N-mask bit."""
    codes = np.asarray(codes, np.uint8)
    L = len(codes)
    n = codes >= 4
    base = np.where(n, 0, codes).astype(np.uint8)
    Lp4 = -(-L // 4) * 4
    b = np.zeros(Lp4, np.uint8)
    b[:L] = base
    b = b.reshape(-1, 4)
    packed = (b[:, 0] | (b[:, 1] << 2) | (b[:, 2] << 4)
              | (b[:, 3] << 6)).astype(np.uint8)
    nmask = np.packbits(n, bitorder="little")
    return packed, nmask, L


def unpack_codes(packed: np.ndarray, nmask: np.ndarray,
                 L: int) -> np.ndarray:
    """Host-side inverse of pack_codes (the oracle for the device path)."""
    b = np.asarray(packed, np.uint8)
    out = np.stack([b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3],
                   axis=1).reshape(-1)[:L].astype(np.uint8)
    n = np.unpackbits(np.asarray(nmask, np.uint8), bitorder="little")[:L]
    out[n == 1] = 4
    return out


@jax.jit
def unpack_device(packed: jnp.ndarray, nmask: jnp.ndarray) -> jnp.ndarray:
    """Device unpack: packed [P] + nmask [P//2] -> uint8 codes [4P].

    The caller slices to the true length (shapes stay static: P is the
    padded byte count).  One fused elementwise program — no gathers.
    """
    b = packed
    base = jnp.stack([b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3],
                     axis=-1).reshape(-1)
    m = nmask
    bits = jnp.stack([(m >> k) & 1 for k in range(8)], axis=-1).reshape(-1)
    L4 = base.shape[0]
    return jnp.where(bits[:L4] == 1, jnp.uint8(4), base.astype(jnp.uint8))
