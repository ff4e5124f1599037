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


@functools.lru_cache(maxsize=64)
def _cached_map_block(cfg: AlignConfig, stride: int, max_hits: int,
                      diag_band: int, run_gap: int, min_seeds: int,
                      max_hsps: int, max_chains: int, seg_block: int,
                      out_budget: int):
    """Jitted (candidate batch x segment block) mapper with one packed,
    valid-compacted output.

    The per-segment loop paid ~20 host fetches per segment over the axon
    tunnel (1000+ round trips for a 64-segment genome); this maps a block
    of segments in ONE call and compacts every valid chain into a single
    int32 [out_budget + 1, 8] array (row 0 = count; columns cand, seg,
    strand, qs, qe, ss, se, nseeds) = one fetch per block.
    """
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
    def _map_block(cand_mat, f_codes, f_pos, f_bk, r_codes, r_pos, r_bk,
                   s0):
        # k-mer encoding INSIDE jit (un-jitted it dispatched ~12 per-op
        # tunnel round trips per call)
        cand_kms = enc.kmer_codes(cand_mat, cfg.kmer_size)
        # dynamic segment-block slice INSIDE jit: one compiled program for
        # every block (an un-jitted device slice would cost a tunnel
        # dispatch per array per block)
        def blk(a):
            return jax.lax.dynamic_slice(
                a, (s0,) + (0,) * (a.ndim - 1), (seg_block,) + a.shape[1:])

        f_codes, f_pos, f_bk, r_codes, r_pos, r_bk = (
            blk(a) for a in (f_codes, f_pos, f_bk, r_codes, r_pos, r_bk))
        over_c = jax.vmap(_map_one, in_axes=(0,) + (None,) * 6)
        over_s = jax.vmap(over_c, in_axes=(None,) + (0,) * 6)
        fc, rch = over_s(cand_kms, f_codes, f_pos, f_bk,
                         r_codes, r_pos, r_bk)        # fields [SB, B, C]

        parts = []
        for strand, ch in ((0, fc), (1, rch)):
            SB, B, C = ch.qs.shape
            seg_i = s0 + jax.lax.broadcasted_iota(jnp.int32, (SB, B, C), 0)
            cand_i = jax.lax.broadcasted_iota(jnp.int32, (SB, B, C), 1)
            row = jnp.stack([cand_i, seg_i,
                             jnp.full((SB, B, C), strand, jnp.int32),
                             ch.qs, ch.qe, ch.ss, ch.se, ch.nseeds],
                            axis=-1).reshape(-1, 8)
            parts.append((row, ch.valid.reshape(-1)))
        rows = jnp.concatenate([r for r, _ in parts])
        good = jnp.concatenate([v for _, v in parts])
        (sel,) = jnp.nonzero(good, size=out_budget, fill_value=0)
        count = jnp.sum(good.astype(jnp.int32))
        body = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (out_budget, 1), 0)
             < count), rows[sel], 0)
        head = jnp.full((1, 8), 0, jnp.int32).at[0, 0].set(count)
        return jnp.concatenate([head, body])

    return _map_block


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
            self._map_block = None
        else:
            self._map_batch = _cached_map_batch(
                index.cfg, stride, max_hits, diag_band, run_gap, min_seeds,
                max_hsps, max_chains)
            self._batch_multiple = 1
            self._seg_block = min(8, index.n_segs)
            self._out_budget = 1 << 15
            self._map_block = _cached_map_block(
                index.cfg, stride, max_hits, diag_band, run_gap, min_seeds,
                max_hsps, max_chains, self._seg_block, self._out_budget)

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
        if self._map_block is None:   # legacy/mesh path needs device k-mers
            cand_kms = enc.kmer_codes(jnp.asarray(mat), cfg.kmer_size)

        lens_f = np.maximum(lens[: len(cand_seqs)].astype(np.float64), 1)

        def _collect(rows: np.ndarray) -> None:
            """rows: int32 [n, 8] = cand, seg, strand, qs, qe, ss, se, ns."""
            cand, seg, strand = rows[:, 0], rows[:, 1], rows[:, 2]
            qs, qe, ss, se, ns = (rows[:, i] for i in range(3, 8))
            keep = cand < len(cand_seqs)
            lf = lens_f[np.minimum(cand, len(cand_seqs) - 1)]
            slen = se - ss
            keep &= (qe - qs) >= min_coverage * lf
            keep &= slen >= min_coverage * lf
            keep &= slen <= max_len_ratio * lf
            for i in np.nonzero(keep)[0]:
                s0, s1 = int(ss[i]), int(se[i])
                if strand[i] == 1:
                    s0, s1 = idx.seg_len - s1, idx.seg_len - s0
                soff = int(seg[i]) * idx.seg_len
                out[int(cand[i])].append(CopyHit(
                    start=soff + s0, end=soff + s1,
                    strand=int(strand[i]), nseeds=int(ns[i])))

        if self._map_block is not None:
            SB = self._seg_block
            starts = sorted({min(s, idx.n_segs - SB)
                             for s in range(0, idx.n_segs, SB)})
            # cap candidate rows per call by width: a [B, W] block program
            # past ~2^21 cells made the remote compile helper OOM (SIGKILL)
            W = mat.shape[1]
            row_cap = max(8, (1 << 21) // W)
            row_cap = 1 << (row_cap.bit_length() - 1)
            for b0 in range(0, mat.shape[0], row_cap):
                sub_np = mat[b0 : b0 + row_cap]
                if sub_np.shape[0] < row_cap:
                    sub_np = np.pad(sub_np,
                                    ((0, row_cap - sub_np.shape[0]), (0, 0)),
                                    constant_values=4)
                sub = jnp.asarray(sub_np)
                seen: set = set()
                for s0 in starts:
                    packed = np.asarray(self._map_block(
                        sub, idx.fwd.codes, idx.fwd.pos, idx.fwd.buckets,
                        idx.rc.codes, idx.rc.pos, idx.rc.buckets,
                        jnp.int32(s0)))
                    count = int(packed[0, 0])
                    if count > self._out_budget:
                        logger.warning(
                            "find_copies: %d hits exceed the %d block "
                            "budget; truncated", count, self._out_budget)
                    rows = packed[1 : 1 + min(count, self._out_budget)]
                    if len(rows):
                        rows = rows.copy()
                        rows[:, 0] += b0           # sub-batch -> global cand
                        # overlapping final block: drop re-mapped segments
                        fresh = np.array([s not in seen
                                          for s in rows[:, 1]])
                        _collect(rows[fresh])
                    seen.update(range(s0, s0 + SB))
        else:
            for s in range(idx.n_segs):
                fc, rch = self._map_batch(
                    cand_kms,
                    idx.fwd.codes[s], idx.fwd.pos[s], idx.fwd.buckets[s],
                    idx.rc.codes[s], idx.rc.pos[s], idx.rc.buckets[s],
                )
                for chains, strand in ((fc, 0), (rch, 1)):
                    valid = np.asarray(chains.valid)[: len(cand_seqs)]
                    if not valid.any():
                        continue
                    qs = np.asarray(chains.qs)[: len(cand_seqs)]
                    qe = np.asarray(chains.qe)[: len(cand_seqs)]
                    ss = np.asarray(chains.ss)[: len(cand_seqs)]
                    se = np.asarray(chains.se)[: len(cand_seqs)]
                    ns = np.asarray(chains.nseeds)[: len(cand_seqs)]
                    c_idx, h_idx = np.nonzero(valid)
                    rows = np.stack([
                        c_idx, np.full_like(c_idx, s),
                        np.full_like(c_idx, strand),
                        qs[c_idx, h_idx], qe[c_idx, h_idx],
                        ss[c_idx, h_idx], se[c_idx, h_idx],
                        ns[c_idx, h_idx]], axis=1)
                    _collect(rows)
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
