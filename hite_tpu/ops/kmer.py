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
INVALID_CODE = 2**31 - 1   # plain int, not a jnp scalar (terminal.NEG)


BUCKET_BASES = 8          # first-level direct-address prefix (4^8 buckets)
BUCKET_SEARCH_ITERS = 12  # exact for buckets up to 4096 entries; larger
                          # buckets (extreme low-complexity prefixes) may
                          # miss seeds — harmless for repeat discovery


class KmerIndex(NamedTuple):
    """Sorted k-mer index of one (or a batch of) segment(s).

    codes:   int32 [..., n_kmers] ascending; masked kmers pushed to the end
             as INVALID_CODE.
    pos:     int32 [..., n_kmers] segment-local position of each code.
    buckets: optional int32 [..., 4^BUCKET_BASES + 1] prefix-bucket start
             offsets (None for non-nucleotide or short-k indexes) — cuts
             the per-query binary search from log2(n) to a few steps.
    """

    codes: jnp.ndarray
    pos: jnp.ndarray
    buckets: jnp.ndarray | None = None


def build_index_from_kmers(km: jnp.ndarray,
                           bucket_shift: int | None = None) -> KmerIndex:
    """Sort precomputed k-mer codes (any alphabet; -1 = invalid)."""
    km = jnp.where(km < 0, INVALID_CODE, km)
    n = km.shape[-1]
    positions = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1), km.shape
    )
    sort_codes, sort_pos = jax.lax.sort((km, positions), num_keys=1)
    buckets = None
    if bucket_shift is not None:
        nb = 4**BUCKET_BASES
        bounds = (jax.lax.broadcasted_iota(jnp.int32, (nb + 1, 1), 0)
                  .squeeze(-1) << bucket_shift)
        # guard against overflow on the last boundary
        bounds = jnp.where(bounds < 0, jnp.int32(2**31 - 1), bounds)
        flat = sort_codes.reshape(-1, n)
        bk = jax.vmap(lambda c: jnp.searchsorted(c, bounds, side="left"))(flat)
        buckets = bk.reshape(sort_codes.shape[:-1] + (nb + 1,)).astype(jnp.int32)
    return KmerIndex(codes=sort_codes, pos=sort_pos, buckets=buckets)


def build_index(seg_codes: jnp.ndarray, k: int) -> KmerIndex:
    """Build a sorted k-mer index of a segment (or batch: leading dims map).

    seg_codes: uint8 [..., S] nucleotide codes.
    """
    shift = 2 * (k - BUCKET_BASES) if k > BUCKET_BASES else None
    return build_index_from_kmers(kmer_codes(seg_codes, k), bucket_shift=shift)


def lookup(index: KmerIndex, query_codes: jnp.ndarray, max_hits: int,
           bucket_shift: int | None = None):
    """Find up to max_hits index positions matching each query k-mer.

    query_codes: int32 [Q] (-1 for invalid windows).
    bucket_shift: pass 2*(k - BUCKET_BASES) to use the prefix buckets.
    Returns (spos int32 [Q, max_hits], valid bool [Q, max_hits]).
    """
    n = index.codes.shape[-1]
    if index.buckets is not None and bucket_shift is not None:
        nb = index.buckets.shape[-1] - 1
        b = jnp.clip(jnp.where(query_codes >= 0, query_codes, 0)
                     >> bucket_shift, 0, nb - 1)
        lo = index.buckets[b]
        hi = index.buckets[b + 1]
        for _ in range(BUCKET_SEARCH_ITERS):
            mid = (lo + hi) // 2
            go_right = index.codes[jnp.clip(mid, 0, n - 1)] < query_codes
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        start = lo
    else:
        start = jnp.searchsorted(index.codes, query_codes, side="left")
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, max_hits), 1)
    j = jnp.clip(start[:, None] + offs, 0, n - 1)
    codes_j = index.codes[j]
    valid = (codes_j == query_codes[:, None]) & (query_codes[:, None] >= 0)
    valid &= (start[:, None] + offs) < n
    spos = jnp.where(valid, index.pos[j], -1)
    return spos, valid
