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


class PackedFlat:
    """Host-resident 2-bit + N-bitmask genome array (3 bits/bp).

    Drop-in for the uint8 ``Genome.flat``/``masked`` arrays on the host
    side for >1 Gbp genomes (the reference's >=2 GB tier,
    `main.py:328-329`): supports ``len``, step-1 slice/int reads
    (unpacked on demand), and the two masking write forms the pipeline
    uses (``a[s:e] = N`` and ``a[pos_array] = N``).  Masking only ever
    SETS N bits — general writes stay on the uint8 path (pack first,
    write never).  Steady-state memory is 0.375 bytes/bp vs 1.
    """

    __slots__ = ("packed", "nmask", "L")

    def __init__(self, packed: np.ndarray, nmask: np.ndarray, L: int):
        self.packed = packed
        self.nmask = nmask
        self.L = L

    @classmethod
    def from_uint8(cls, codes: np.ndarray) -> "PackedFlat":
        packed, nmask, L = pack_codes(codes)
        return cls(packed, nmask, L)

    def __len__(self) -> int:
        return self.L

    @property
    def nbytes(self) -> int:
        return self.packed.nbytes + self.nmask.nbytes

    def copy(self) -> "PackedFlat":
        return PackedFlat(self.packed.copy(), self.nmask.copy(), self.L)

    def unpack_all(self) -> np.ndarray:
        return unpack_codes(self.packed, self.nmask, self.L)

    def _range(self, s: int, e: int) -> np.ndarray:
        s = max(0, min(s, self.L))
        e = max(s, min(e, self.L))
        if e == s:
            return np.zeros(0, np.uint8)
        b0, b1 = s // 4, -(-e // 4)
        b = self.packed[b0:b1]
        out = np.stack([b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3],
                       axis=1).reshape(-1)[s - 4 * b0 : e - 4 * b0]
        out = out.astype(np.uint8)
        m0, m1 = s // 8, -(-e // 8)
        n = np.unpackbits(self.nmask[m0:m1],
                          bitorder="little")[s - 8 * m0 : e - 8 * m0]
        out[n == 1] = 4
        return out

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            s, e, step = idx.indices(self.L)
            if step != 1:
                raise IndexError("PackedFlat supports step-1 slices only")
            return self._range(s, e)
        if isinstance(idx, (int, np.integer)):
            i = int(idx) + (self.L if idx < 0 else 0)
            return self._range(i, i + 1)[0]
        raise IndexError(f"unsupported PackedFlat index {type(idx)}")

    def __setitem__(self, idx, value) -> None:
        if not (np.isscalar(value) and int(value) >= 4):
            raise ValueError("PackedFlat writes are masking-only "
                             "(scalar code >= 4)")
        if isinstance(idx, slice):
            s, e, step = idx.indices(self.L)
            if step != 1:
                raise IndexError("PackedFlat supports step-1 slices only")
            if e <= s:
                return
            # O(bytes) fill: whole bytes -> 0xFF, edge bits -> OR masks
            fb0, fb1 = -(-s // 8), e // 8
            if fb1 > fb0:
                self.nmask[fb0:fb1] = 0xFF
            lmask = 0
            for p in range(s, min(e, fb0 * 8)):
                lmask |= 1 << (p & 7)
            if lmask:
                self.nmask[s >> 3] |= np.uint8(lmask)
            rmask = 0
            for p in range(max(s, fb1 * 8), e):
                rmask |= 1 << (p & 7)
            if rmask:
                self.nmask[e - 1 >> 3] |= np.uint8(rmask)
            return
        else:
            pos = np.asarray(idx)
            if pos.dtype == bool:
                # a boolean mask cast to int64 would silently become
                # positions 0/1 — convert to the selected positions
                if pos.shape != (self.L,):
                    raise IndexError("PackedFlat boolean mask must cover "
                                     "the full array")
                pos = np.nonzero(pos)[0]
            pos = pos.astype(np.int64).reshape(-1)
            if pos.size and (pos.min() < 0 or pos.max() >= self.L):
                raise IndexError("PackedFlat mask position out of range")
        np.bitwise_or.at(self.nmask, pos >> 3,
                         np.left_shift(np.uint8(1),
                                       (pos & 7).astype(np.uint8)))


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


def unpack_device_chunked(packed: np.ndarray, nmask: np.ndarray,
                          chunk_out: int = 1 << 27) -> jnp.ndarray:
    """Chunked device unpack for whole-genome uploads.

    One fused unpack program at 2^29 output bytes allocates >16 GB of
    HLO temps on v5e (the stack/reshape lowering materializes many
    output-sized buffers — observed at the 400 Mbp tier); unpacking in
    `chunk_out`-byte output chunks keeps each program's temps bounded
    and the final device concatenate holds only 2x the output.
    """
    P4 = len(packed) * 4
    if P4 <= chunk_out:
        return unpack_device(jnp.asarray(packed), jnp.asarray(nmask))
    parts = [
        unpack_device(jnp.asarray(packed[o // 4 : (o + chunk_out) // 4]),
                      jnp.asarray(nmask[o // 8 : (o + chunk_out) // 8]))
        for o in range(0, P4, chunk_out)
    ]
    return jnp.concatenate(parts)
