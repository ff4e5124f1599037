"""K-mer indexing for the seed-chain-extend alignment engine.

Replaces blastn's makeblastdb / minimap2's minimizer index (reference
`split_genome_chunks.py:72-81`, `Util.py:7952`) with a sorted-array k-mer
index per genome segment, built once on device and reused for every pair in
the all-vs-all alignment grid (SURVEY.md §3.2 hot loop 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hite_tpu.ops.encode import kmer_codes

# Sentinel for masked/N k-mers inside an index: sorts after every real code
# (real codes < 4^15 < 2^30) and never equals a query code.
INVALID_CODE = jnp.int32(2**31 - 1)


class KmerIndex(NamedTuple):
    """Sorted k-mer index of one (or a batch of) segment(s).

    codes: int32 [..., n_kmers] ascending; masked kmers pushed to the end
           as INVALID_CODE.
    pos:   int32 [..., n_kmers] segment-local position of each code.
    """

    codes: jnp.ndarray
    pos: jnp.ndarray


def build_index_from_kmers(km: jnp.ndarray) -> KmerIndex:
    """Sort precomputed k-mer codes (any alphabet; -1 = invalid)."""
    km = jnp.where(km < 0, INVALID_CODE, km)
    n = km.shape[-1]
    positions = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1), km.shape
    )
    sort_codes, sort_pos = jax.lax.sort((km, positions), num_keys=1)
    return KmerIndex(codes=sort_codes, pos=sort_pos)


def build_index(seg_codes: jnp.ndarray, k: int) -> KmerIndex:
    """Build a sorted k-mer index of a segment (or batch: leading dims map).

    seg_codes: uint8 [..., S] nucleotide codes.
    """
    return build_index_from_kmers(kmer_codes(seg_codes, k))


def lookup(index: KmerIndex, query_codes: jnp.ndarray, max_hits: int):
    """Find up to max_hits index positions matching each query k-mer.

    query_codes: int32 [Q] (-1 for invalid windows).
    Returns (spos int32 [Q, max_hits], valid bool [Q, max_hits]).
    """
    n = index.codes.shape[-1]
    start = jnp.searchsorted(index.codes, query_codes, side="left")
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, max_hits), 1)
    j = jnp.clip(start[:, None] + offs, 0, n - 1)
    codes_j = index.codes[j]
    valid = (codes_j == query_codes[:, None]) & (query_codes[:, None] >= 0)
    valid &= (start[:, None] + offs) < n
    spos = jnp.where(valid, index.pos[j], -1)
    return spos, valid
