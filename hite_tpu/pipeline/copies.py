"""Genome-wide full-length copy retrieval (minimap2 replacement).

Re-implements `get_full_length_copies_minimap2` / `get_copies_minimap2`
(`Util.py:7933-8030`; SURVEY.md §3.3 "HOT LOOP 3"): map each candidate
against the whole genome and keep hits covering >= `min_coverage` of the
candidate on both query and target — the copies that feed the MSA boundary
judge.

TPU-native design: candidates are padded into bucketed [C, L] batches and
aligned against the same per-segment sorted k-mer indexes the coarse stage
builds (one prepared `GenomeIndex` shared by every module), using the
seed->HSP->chain kernels.  Chains are filtered for two-sided coverage and
collected per candidate.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.ops import encode as enc
from hite_tpu.ops.chain import chain_hsps
from hite_tpu.ops.kmer import KmerIndex, build_index
from hite_tpu.ops.seedext import pair_hsps
from hite_tpu.pipeline.candidates import pad_seqs
from hite_tpu.utils.log import logger


@dataclass
class CopyHit:
    """One genomic copy of a candidate: flat interval + strand + identity proxy."""

    start: int
    end: int
    strand: int      # 0 = forward, 1 = reverse
    nseeds: int


class GenomeIndex:
    """Per-segment sorted k-mer indexes of the (masked) genome, device-resident."""

    def __init__(self, genome: Genome, cfg: AlignConfig, seg_len: int = 131_072,
                 use_masked: bool = False):
        self.genome = genome
        self.cfg = cfg
        self.seg_len = seg_len
        segs = genome.segment_view(seg_len, use_masked=use_masked)
        self.n_segs = segs.shape[0]
        segs_d = jnp.asarray(segs)
        self.fwd = build_index(segs_d, cfg.kmer_size)
        self.rc = build_index(enc.revcomp(segs_d), cfg.kmer_size)
        self.seg_kmers = enc.kmer_codes(segs_d, cfg.kmer_size)


@functools.lru_cache(maxsize=64)
def _cached_map_batch(cfg: AlignConfig, stride: int, max_hits: int,
                      diag_band: int, run_gap: int, min_seeds: int,
                      max_hsps: int, max_chains: int):
    """Jitted candidate->segment mapper, cached by kernel geometry so every
    CopyFinder (and every pipeline run) reuses the same compiled kernels."""
    p = dict(stride=stride, max_hits=max_hits, diag_band=diag_band,
             run_gap=run_gap, min_seeds=min_seeds, max_hsps=max_hsps)

    def _map_one(cand_km, f_codes, f_pos, f_bk, r_codes, r_pos, r_bk):
        hsp_kw = dict(k=cfg.kmer_size, min_hsp_len=cfg.min_hsp_len, **p)
        chain_kw = dict(extend_threshold=cfg.fixed_extend_base_threshold,
                        max_chains=max_chains, min_len=50)
        fh = pair_hsps(cand_km, KmerIndex(f_codes, f_pos, f_bk), **hsp_kw)
        fc = chain_hsps(fh, **chain_kw)
        rh = pair_hsps(cand_km, KmerIndex(r_codes, r_pos, r_bk), **hsp_kw)
        rch = chain_hsps(rh, **chain_kw)
        return fc, rch

    @jax.jit
    def _map_batch(cand_kms, f_codes, f_pos, f_bk, r_codes, r_pos, r_bk):
        fn = jax.vmap(_map_one, in_axes=(0, None, None, None, None, None, None))
        return fn(cand_kms, f_codes, f_pos, f_bk, r_codes, r_pos, r_bk)

    return _map_batch


# mesh-sharded map-batch executables, keyed by (kernel geometry, mesh);
# plain dict because Mesh hashability is not guaranteed across versions
_SHARDED_MAP_CACHE: dict = {}


def _cached_map_batch_sharded(cfg: AlignConfig, stride: int, max_hits: int,
                              diag_band: int, run_gap: int, min_seeds: int,
                              max_hsps: int, max_chains: int, mesh):
    """Like `_cached_map_batch` but with the candidate batch axis sharded
    over every mesh axis (GSPMD data parallelism — the TPU equivalent of
    the reference's `parallel_annotate.nf` chunk fan-out)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (cfg, stride, max_hits, diag_band, run_gap, min_seeds,
           max_hsps, max_chains, id(mesh))
    if key in _SHARDED_MAP_CACHE:
        return _SHARDED_MAP_CACHE[key]
    base = _cached_map_batch(cfg, stride, max_hits, diag_band, run_gap,
                             min_seeds, max_hsps, max_chains)
    repl = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    fn = jax.jit(
        base.__wrapped__ if hasattr(base, "__wrapped__") else base,
        in_shardings=(shard_b, repl, repl, repl, repl, repl, repl))
    _SHARDED_MAP_CACHE[key] = fn
    return fn


class CopyFinder:
    """Batched candidate -> genome copy mapping.

    With `mesh`, the candidate batch axis is sharded over all mesh devices
    (annotation/copy retrieval data parallelism); results are identical to
    the single-device path.
    """

    def __init__(self, index: GenomeIndex, *, stride: int = 1, max_hits: int = 8,
                 diag_band: int = 32, run_gap: int = 96, min_seeds: int = 4,
                 max_hsps: int = 1024, max_chains: int = 128, mesh=None):
        self.index = index
        self.mesh = mesh
        if mesh is not None:
            self._map_batch = _cached_map_batch_sharded(
                index.cfg, stride, max_hits, diag_band, run_gap, min_seeds,
                max_hsps, max_chains, mesh)
            self._batch_multiple = mesh.devices.size
        else:
            self._map_batch = _cached_map_batch(
                index.cfg, stride, max_hits, diag_band, run_gap, min_seeds,
                max_hsps, max_chains)
            self._batch_multiple = 1

    def find_copies(
        self,
        cand_seqs: Sequence[np.ndarray],
        *,
        min_coverage: float = 0.95,
        max_copies: int = 100,
        max_len_ratio: float = 1.2,
    ) -> List[List[CopyHit]]:
        """Return up to max_copies full-length CopyHits per candidate."""
        idx = self.index
        cfg = idx.cfg
        out: List[List[CopyHit]] = [[] for _ in cand_seqs]
        if not cand_seqs:
            return out
        from hite_tpu.pipeline.candidates import pad_rows
        n_rows = pad_rows(len(cand_seqs), min_rows=max(4, self._batch_multiple))
        m = self._batch_multiple
        n_rows = ((n_rows + m - 1) // m) * m
        mat, lens = pad_seqs(cand_seqs, n_rows=n_rows)
        cand_kms = enc.kmer_codes(jnp.asarray(mat), cfg.kmer_size)

        lens_f = np.maximum(lens[: len(cand_seqs)].astype(np.float64), 1)
        for s in range(idx.n_segs):
            fc, rch = self._map_batch(
                cand_kms,
                idx.fwd.codes[s], idx.fwd.pos[s], idx.fwd.buckets[s],
                idx.rc.codes[s], idx.rc.pos[s], idx.rc.buckets[s],
            )
            soff = s * idx.seg_len
            for chains, strand in ((fc, 0), (rch, 1)):
                valid = np.asarray(chains.valid)[: len(cand_seqs)]
                if not valid.any():
                    continue
                qs = np.asarray(chains.qs)[: len(cand_seqs)]
                qe = np.asarray(chains.qe)[: len(cand_seqs)]
                ss = np.asarray(chains.ss)[: len(cand_seqs)]
                se = np.asarray(chains.se)[: len(cand_seqs)]
                ns = np.asarray(chains.nseeds)[: len(cand_seqs)]
                qcov = (qe - qs) / lens_f[:, None]
                slen = se - ss
                ok = valid & (qcov >= min_coverage)
                ok &= slen >= min_coverage * lens_f[:, None]
                ok &= slen <= max_len_ratio * lens_f[:, None]
                c_idx, h_idx = np.nonzero(ok)
                s0 = ss[c_idx, h_idx]
                s1 = se[c_idx, h_idx]
                if strand == 1:
                    s0, s1 = idx.seg_len - s1, idx.seg_len - s0
                for c, a, b_, n in zip(c_idx, soff + s0, soff + s1,
                                       ns[c_idx, h_idx]):
                    out[c].append(CopyHit(start=int(a), end=int(b_),
                                          strand=strand, nseeds=int(n)))
        # dedup overlapping hits, cap at max_copies (prefer more seeds)
        for c, hits in enumerate(out):
            hits.sort(key=lambda h: -h.nseeds)
            kept: List[CopyHit] = []
            for h in hits:
                dup = any(min(h.end, g.end) - max(h.start, g.start)
                          > 0.8 * (h.end - h.start) for g in kept)
                if not dup:
                    kept.append(h)
                if len(kept) >= max_copies:
                    break
            out[c] = kept
        return out
