"""Genome tensor container: flat code array + contig/segment/chunk bookkeeping.

The reference shards the genome three ways (SURVEY.md §5 "long-context"):
1Mb chromosome segments renamed ``chr$offset`` (`split_genome_chunks.py:38-66`),
400MB data-parallel chunks, and ~100-sequence blast DB blocks — all via files
on disk with name-embedded offsets re-mapped later (`Util.py:4324-4341`).

Here the genome lives as ONE flat uint8 code array (contigs concatenated,
separated by an N spacer so no alignment can bridge contigs) with explicit
coordinate maps.  "Segments" are equal-length views of that array (the unit
of the all-vs-all alignment grid and of device sharding); global<->contig
coordinates are a searchsorted, not a filename convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from hite_tpu.config import ChunkConfig
from hite_tpu.io.fasta import CODE_N, decode_seq, encode_seq, read_fasta

# Spacer between contigs: longer than any seed/extension reach so alignments
# can never bridge two contigs (N never matches).
CONTIG_SPACER = 64

# Host arrays above this pack to 2 bits+Nmask (from_fasta auto tier).
HOST_PACK_THRESHOLD = 512 * 1024 * 1024


@dataclass
class Genome:
    """Flat-coded genome with contig maps.

    Attributes:
      flat:           uint8 [L_flat] codes (A0 C1 G2 T3 N4), contigs joined
                      with CONTIG_SPACER Ns and right-padded with N to a
                      multiple of ``pad_to``.
      names:          contig names in input order.
      starts/lengths: contig start offsets and lengths in flat coordinates.
    """

    flat: np.ndarray
    names: List[str]
    starts: np.ndarray          # int64 [n_contigs]
    lengths: np.ndarray         # int64 [n_contigs]
    masked: Optional[np.ndarray] = None  # uint8 flat copy with prev-TE spans set to N
    # device-resident buffers (see device_flat_padded); never compared
    _device_cache: Dict = field(default_factory=dict, repr=False, compare=False)

    # ------------------------------------------------------------------ build
    @classmethod
    def from_dict(cls, seqs: Dict[str, np.ndarray], pad_to: int = 1024) -> "Genome":
        names = list(seqs.keys())
        lengths = np.array([len(seqs[n]) for n in names], dtype=np.int64)
        starts = np.zeros(len(names), dtype=np.int64)
        pos = 0
        for i, n in enumerate(names):
            starts[i] = pos
            pos += lengths[i] + CONTIG_SPACER
        total = ((pos + pad_to - 1) // pad_to) * pad_to if pos else pad_to
        flat = np.full(total, CODE_N, dtype=np.uint8)
        for i, n in enumerate(names):
            flat[starts[i] : starts[i] + lengths[i]] = seqs[n]
        return cls(flat=flat, names=names, starts=starts, lengths=lengths)

    @classmethod
    def from_fasta(cls, path: str, pad_to: int = 1024,
                   packed: Optional[bool] = None) -> "Genome":
        """Load a FASTA.  ``packed=None`` auto-packs host storage to
        2-bit+Nmask above HOST_PACK_THRESHOLD bp (the reference's >=2 GB
        handling tier, main.py:328-329)."""
        g = cls.from_dict(read_fasta(path), pad_to=pad_to)
        if packed or (packed is None and len(g.flat) > HOST_PACK_THRESHOLD):
            g.pack_host()
        return g

    def pack_host(self) -> None:
        """Convert host storage to 2-bit+Nmask (`ops.pack2.PackedFlat`,
        0.375 bytes/bp).  All host consumers go through len/slice reads
        and masking writes, which PackedFlat emulates; whole-array
        consumers (segment_view) unpack transiently."""
        from hite_tpu.ops.pack2 import PackedFlat

        if isinstance(self.flat, np.ndarray):
            self.flat = PackedFlat.from_uint8(self.flat)
        if isinstance(self.masked, np.ndarray):
            self.masked = PackedFlat.from_uint8(self.masked)

    # ------------------------------------------------------------ coordinates
    @property
    def size(self) -> int:
        """Total genomic bp (excluding spacers/padding)."""
        return int(self.lengths.sum())

    def contig_of(self, flat_pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """flat position(s) -> (contig index, contig-local position)."""
        flat_pos = np.asarray(flat_pos)
        idx = np.searchsorted(self.starts, flat_pos, side="right") - 1
        idx = np.clip(idx, 0, len(self.names) - 1)
        return idx, flat_pos - self.starts[idx]

    def to_flat(self, name: str, pos: int) -> int:
        return int(self.starts[self.names.index(name)]) + pos

    def in_contig(self, start: np.ndarray, end: np.ndarray) -> np.ndarray:
        """True where [start, end) lies inside a single contig (no spacer)."""
        start = np.asarray(start)
        end = np.asarray(end)
        ci, local = self.contig_of(start)
        return (local >= 0) & (end - start >= 0) & (local + (end - start) <= self.lengths[ci])

    # --------------------------------------------------------------- segments
    def segment_view(self, seg_length: int, use_masked: bool = False) -> np.ndarray:
        """Zero-copy [n_segs, seg_length] view (flat padded to a multiple).

        On a PackedFlat genome this transiently unpacks the WHOLE array
        (1 byte/bp peak); batch-iterating consumers should prefer
        `segment_batches`, which unpacks one batch at a time.
        """
        src = self.masked if (use_masked and self.masked is not None) else self.flat
        if not isinstance(src, np.ndarray):
            src = src.unpack_all()        # PackedFlat: transient unpack
        L = len(src)
        n_segs = (L + seg_length - 1) // seg_length
        if n_segs * seg_length != L:
            pad = np.full(n_segs * seg_length - L, CODE_N, dtype=np.uint8)
            src = np.concatenate([src, pad])
        return src.reshape(n_segs, seg_length)

    def n_segments(self, seg_length: int) -> int:
        return (len(self.flat) + seg_length - 1) // seg_length

    def segment_batches(self, seg_length: int, batch: int,
                        use_masked: bool = False):
        """Yield (seg0, [batch, seg_length]) chunks, unpacking a
        PackedFlat genome one batch at a time (peak transient host
        memory = batch * seg_length bytes instead of 1 byte/bp for the
        whole genome).  The final batch is N-padded to full size."""
        src = self.masked if (use_masked and self.masked is not None) else self.flat
        n_segs = self.n_segments(seg_length)
        for b0 in range(0, n_segs, batch):
            nb = min(batch, n_segs - b0)
            s = b0 * seg_length
            e = min((b0 + nb) * seg_length, len(src))
            chunk = np.asarray(src[s:e])   # PackedFlat: per-batch unpack
            want = batch * seg_length
            if len(chunk) < want:
                chunk = np.concatenate(
                    [chunk, np.full(want - len(chunk), CODE_N, np.uint8)])
            yield b0, chunk.reshape(batch, seg_length)

    # ---------------------------------------------------------------- masking
    def init_mask(self) -> None:
        if self.masked is None:
            self.masked = self.flat.copy()

    def mask_intervals(self, intervals: Iterable[Tuple[int, int]]) -> int:
        """N-out flat-coordinate [start, end) spans in the masked copy.

        Device-side equivalent of the reference's prev-TE genome masking
        (`mask_genome_intactTE`, `Util.py:6389-6431`).  Returns bp masked.
        """
        self.init_mask()
        total = 0
        for s, e in intervals:
            s = max(0, int(s))
            e = min(len(self.masked), int(e))
            if e > s:
                self.masked[s:e] = CODE_N
                total += e - s
        if total:
            # drop every device buffer derived from the MASKED stream
            # (flat upload + sorted join index); unmasked variants stay
            for key in [k for k in self._device_cache
                        if len(k) > 1 and k[1] is True]:
                self._device_cache.pop(key, None)
        return total

    def device_flat_padded(self, use_masked: bool = False):
        """Device-resident flat codes, N-padded to a power of two.

        Cached: the genome upload over the axon tunnel costs a round trip
        plus bandwidth on every kernel call otherwise (the masked variant
        is invalidated by mask_intervals).  The upload ships 2-BIT PACKED
        bytes (+ N bitmask) and unpacks with one device program
        (`ops.pack2`) — 3 bits/bp instead of 8, which matters because
        every module's progressive mask_intervals re-uploads the masked
        genome.  Returns (device uint8 [Lp], true length L)."""
        import jax.numpy as jnp

        from hite_tpu.ops.pack2 import pack_codes, unpack_device_chunked

        src = (self.masked if (use_masked and self.masked is not None)
               else self.flat)
        key = ("flat_pow2", src is self.masked)
        L = len(src)
        ent = self._device_cache.get(key)
        if ent is None:
            Lp = max(65_536, 1 << (L - 1).bit_length())
            if isinstance(src, np.ndarray):
                buf = np.full(Lp, CODE_N, dtype=np.uint8)
                buf[:L] = src
                packed, nmask, _ = pack_codes(buf)
            else:
                # PackedFlat: pad the stored bytes directly (L is a
                # multiple of pad_to=1024, so no partial-byte seams);
                # pad region is all-N (nmask 0xFF)
                packed = np.zeros(Lp // 4, np.uint8)
                packed[: len(src.packed)] = src.packed
                nmask = np.full(Lp // 8, 0xFF, np.uint8)
                nmask[: len(src.nmask)] = src.nmask
            ent = unpack_device_chunked(packed, nmask)
            self._device_cache[key] = ent
        return ent, L

    def to_dict(self) -> Dict[str, np.ndarray]:
        """Per-contig code arrays (views into flat), keyed by contig name."""
        return {n: self.flat[self.starts[i] : self.starts[i] + self.lengths[i]]
                for i, n in enumerate(self.names)}

    # ------------------------------------------------------------- extraction
    def extract(self, start: int, end: int, flank: int = 0) -> np.ndarray:
        """Codes for flat [start-flank, end+flank), clipped to the contig."""
        ci, local = self.contig_of(np.array([start]))
        ci = int(ci[0])
        c_start = int(self.starts[ci])
        c_end = c_start + int(self.lengths[ci])
        s = max(c_start, int(start) - flank)
        e = min(c_end, int(end) + flank)
        return self.flat[s:e]

    def extract_str(self, start: int, end: int, flank: int = 0) -> str:
        return decode_seq(self.extract(start, end, flank))

    def location_str(self, start: int, end: int, strand: str = "+") -> str:
        """Reference-style copy name ``chr:start-end(strand)`` (SURVEY.md §1)."""
        ci, local = self.contig_of(np.array([start]))
        ci = int(ci[0])
        return f"{self.names[ci]}:{int(local[0])}-{int(local[0]) + (end - start)}({strand})"


def synthetic_genome(
    length: int,
    te_seqs: Sequence[str],
    n_copies: Sequence[int],
    seed: int = 0,
    mutation_rate: float = 0.02,
    tsd_lens: Optional[Sequence[int]] = None,
) -> Tuple[Genome, List[Tuple[int, int, int]]]:
    """Random genome with planted, lightly mutated TE copies (test substrate).

    Returns (genome, insertions) where insertions are flat-coordinate
    (te_index, start, end) of each planted copy.  Replaces the reference's
    demo/genome.fa acceptance input (a missing large blob) for tests.
    """
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 4, size=length).astype(np.uint8)
    insertions: List[Tuple[int, int, int]] = []
    placed: List[Tuple[int, int]] = []
    for ti, te in enumerate(te_seqs):
        te_codes = encode_seq(te)
        for _ in range(n_copies[ti]):
            for _attempt in range(100):
                pos = int(rng.integers(500, length - len(te_codes) - 500))
                if all(pos + len(te_codes) < s or pos > e for s, e in placed):
                    break
            copy = te_codes.copy()
            muts = rng.random(len(copy)) < mutation_rate
            copy[muts] = (copy[muts] + rng.integers(1, 4, size=muts.sum())) % 4
            if tsd_lens:
                tlen = int(tsd_lens[ti % len(tsd_lens)])
                tsd = rng.integers(0, 4, size=tlen).astype(np.uint8)
                bg[pos - tlen : pos] = tsd
                bg[pos + len(copy) : pos + len(copy) + tlen] = tsd
            bg[pos : pos + len(copy)] = copy
            placed.append((pos, pos + len(copy)))
            insertions.append((ti, pos, pos + len(copy)))
    genome = Genome.from_dict({"chr1": bg})
    return genome, insertions
