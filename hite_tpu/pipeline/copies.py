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
    """Genome handle for copy retrieval; per-segment k-mer indexes are lazy.

    The default (sort-merge join) mapper needs only the cached flat device
    genome (`Genome.device_flat_padded`); the per-segment sorted indexes are
    built on first access for the legacy/mesh-sharded segment paths.
    """

    def __init__(self, genome: Genome, cfg: AlignConfig, seg_len: int = 131_072,
                 use_masked: bool = False):
        self.genome = genome
        self.cfg = cfg
        self.seg_len = seg_len
        self.use_masked = use_masked
        src = (genome.masked if (use_masked and genome.masked is not None)
               else genome.flat)
        self.n_segs = (len(src) + seg_len - 1) // seg_len
        self._built = None

    def _indexes(self):
        if self._built is None:
            segs = self.genome.segment_view(self.seg_len,
                                            use_masked=self.use_masked)
            segs_d = jnp.asarray(segs)
            self._built = (build_index(segs_d, self.cfg.kmer_size),
                           build_index(enc.revcomp(segs_d),
                                       self.cfg.kmer_size))
        return self._built

    @property
    def fwd(self) -> KmerIndex:
        return self._indexes()[0]

    @property
    def rc(self) -> KmerIndex:
        return self._indexes()[1]


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


@functools.lru_cache(maxsize=8)
def _chunk_slicer(C: int):
    """Jitted device chunk slice (cached so every call reuses the program)."""
    return jax.jit(lambda flat, c0: jax.lax.dynamic_slice(flat, (c0,), (C,)))


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

    strategy "join" (default): ONE whole-genome sort-merge k-mer join per
    call (`ops.libjoin`) — the gather-free path; ~two sorts per call
    instead of per-(segment, candidate-block) lookup dispatches.  With
    `mesh`, the SAME join programs run with the genome stream sharded
    over the mesh (GSPMD-partitioned sorts/scans) — results are
    identical to the single-device join by construction, which is what
    makes full-pipeline mesh parity assertable (the earlier design
    switched to the legacy segments mapper under a mesh, whose seed
    budgets differ from the join's and broke annotation parity on
    richer substrates).
    strategy "segments": the legacy per-segment bucketed-lookup mapper
    (explicit opt-in only).
    """

    def __init__(self, index: GenomeIndex, *, stride: int = 1, max_hits: int = 8,
                 diag_band: int = 32, run_gap: int = 96, min_seeds: int = 4,
                 max_hsps: int = 1024, max_chains: int = 128, mesh=None,
                 strategy: str = "join", fill_w: int = 8):
        self.index = index
        self.mesh = mesh
        self.strategy = strategy
        self.diag_band = diag_band
        self.run_gap = run_gap
        self.min_seeds = min_seeds
        # join-path budgets (see ops/libjoin.py compile discipline)
        self._join_slice = 1 << 20
        self._join_quota = 1 << 19
        self._join_budget = 1 << 20
        self._join_max_slices = 64
        # fill_w = how many candidates sharing one k-mer code still all get
        # seeds; raise it when candidates overlap heavily (read mapping,
        # near-identical library entries) — a candidate only starves when
        # > fill_w sharers win EVERY seed in a 96bp run-gap window
        self._join_fill_w = fill_w
        self._join_max_occ = 1024
        self._join_max_hsps = 1 << 15
        # 16 Mbp join chunks: the first 100 Mbp hardware run OOMed at
        # 1 << 26 — libjoin_pairs streams BOTH strands (2L) through a
        # 4-array sort plus K slice-local fill temps, 19.5 GB HLO temp at
        # a 64 Mbp chunk (v5e HBM is 16 GB).  Work is sort-dominated
        # O(n log n), so smaller chunks cost only ~2 extra round trips
        # each; genomes <= 16 Mbp still ride one chunk.
        self.max_libjoin_bp = 1 << 24
        if self.strategy == "join":
            self._map_batch = None
            self._map_block = None
            self._batch_multiple = 1
        elif mesh is not None:
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
        min_abs_len: int = 0,
    ) -> List[List[CopyHit]]:
        """Return up to max_copies full-length CopyHits per candidate.

        `min_abs_len > 0` ADDITIONALLY keeps local fragment hits of at
        least that many bp even below `min_coverage` of the candidate —
        RepeatMasker hit semantics for the annotation consumer (a
        single-unit genomic copy must still annotate against a
        tandem-dimer or nested-composite library entry, and truncated
        copies against their full-length family)."""
        idx = self.index
        cfg = idx.cfg
        out: List[List[CopyHit]] = [[] for _ in cand_seqs]
        if not cand_seqs:
            return out
        if self.strategy == "join":
            return self._find_copies_join(
                cand_seqs, min_coverage=min_coverage, max_copies=max_copies,
                max_len_ratio=max_len_ratio, min_abs_len=min_abs_len)
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
            full = ((qe - qs) >= min_coverage * lf) \
                & (slen >= min_coverage * lf) & (slen <= max_len_ratio * lf)
            if min_abs_len:
                qlen_r = qe - qs
                frag = ((qlen_r >= min_abs_len) & (slen >= 0.7 * qlen_r)
                        & (slen <= 1.5 * qlen_r))
                keep &= full | frag
            else:
                keep &= full
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
        return _dedup_cap(out, max_copies)

    def _find_copies_join(
        self,
        cand_seqs: Sequence[np.ndarray],
        *,
        min_coverage: float,
        max_copies: int,
        max_len_ratio: float,
        min_abs_len: int = 0,
    ) -> List[List[CopyHit]]:
        """Sort-merge join copy retrieval (see ops/libjoin.py).

        Candidates sharing one k-mer code compete for the join's `fill_w`
        pairing slots, so near-identical candidates (per-copy coarse
        intervals of one family are the central case) are first grouped by
        4-mer-profile similarity and dealt into waves of <= fill_w/2
        same-group members — each wave is one whole-genome join with no
        starvation.  Distinct candidates all ride wave 0, keeping the
        common case a single join.
        """
        # group by EXACT join-k-mer sharing: only candidates that compete
        # for the same k-mer codes can starve each other's fill slots —
        # composition-similar but seed-disjoint candidates ride one wave
        groups = _kmer_sketch_groups(cand_seqs, k=self.index.cfg.kmer_size,
                                     thresh=0.15)
        chunk = max(1, self._join_fill_w // 2)
        waves: dict = {}
        seen: dict = {}
        for i, g in enumerate(groups):
            j = seen.get(g, 0)
            seen[g] = j + 1
            waves.setdefault(j // chunk, []).append(i)
        if len(waves) == 1:
            return self._find_copies_join_batch(
                cand_seqs, min_coverage=min_coverage, max_copies=max_copies,
                max_len_ratio=max_len_ratio, min_abs_len=min_abs_len)
        logger.info("find_copies.join: %d candidates in %d similarity waves",
                    len(cand_seqs), len(waves))
        out: List[List[CopyHit]] = [[] for _ in cand_seqs]
        for _, idxs in sorted(waves.items()):
            sub = self._find_copies_join_batch(
                [cand_seqs[i] for i in idxs], min_coverage=min_coverage,
                max_copies=max_copies, max_len_ratio=max_len_ratio,
                min_abs_len=min_abs_len)
            for i, hits in zip(idxs, sub):
                out[i] = hits
        return out

    def _find_copies_join_batch(
        self,
        cand_seqs: Sequence[np.ndarray],
        *,
        min_coverage: float,
        max_copies: int,
        max_len_ratio: float,
        min_abs_len: int = 0,
    ) -> List[List[CopyHit]]:
        """One whole-genome k-mer join mapping a batch of candidates: two
        device sorts + budget-sliced fills, then exact FMEA chaining per
        (candidate, strand, contig) on the compacted HSP rows — replacing
        the per-(segment, candidate-block) lookup grid that dominated the
        8Mbp pipeline stage map (DESIGN.md)."""
        from hite_tpu.ops.chain import chain_hsps_host
        from hite_tpu.ops.libjoin import (
            libjoin_genome_sorted, libjoin_pairs, libjoin_pairs_indexed,
            libjoin_scan_packed,
        )
        from hite_tpu.pipeline.candidates import pad_rows

        idx = self.index
        cfg = idx.cfg
        k = cfg.kmer_size
        n_c = len(cand_seqs)
        out: List[List[CopyHit]] = [[] for _ in cand_seqs]

        # concatenated candidate stream, one N separator (any k-mer window
        # crossing a boundary contains the N and never matches); width
        # padded to a power of two so only log2 program variants compile
        lens = np.array([len(s) for s in cand_seqs], dtype=np.int64)
        if lens.sum() == 0:
            return out
        starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
        P = pad_rows(int(lens.sum()) + n_c, min_rows=1024)
        cand_flat = np.full(P, 4, dtype=np.uint8)
        cand_id = np.zeros(P, dtype=np.int32)
        for i, s in enumerate(cand_seqs):
            cand_flat[starts[i] : starts[i] + lens[i]] = s
            cand_id[starts[i] : starts[i] + lens[i]] = i
        cand_flat_d = jnp.asarray(cand_flat)
        cand_id_d = jnp.asarray(cand_id)
        if self.mesh is not None:
            # GSPMD: candidates replicate; the jitted join programs are
            # compiled against these shardings, so XLA partitions the
            # genome-stream sorts/scans across the mesh with identical
            # results to the single-device programs
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            cand_flat_d = jax.device_put(cand_flat_d, repl)
            cand_id_d = jax.device_put(cand_id_d, repl)
        lens_f = np.maximum(lens.astype(np.float64), 1)

        def _one_chunk(chunk_d, c0: int, Cl: int, g_sorted=None) -> None:
            # per-slice quota auto-scales: a dense chunk whose seed pairs
            # overflow the quota RETRIES with a doubled quota (pow2
            # ladder, <=2 extra compile variants) instead of silently
            # dropping seeds — the same recall-cliff class as the
            # selfjoin's budget saturation (VERDICT r3 weak #5)
            quota = self._join_quota
            for _attempt in range(3):
                if g_sorted is not None:
                    # indexed path: the genome-side sort is amortized into
                    # `g_sorted` (built once per genome; see libjoin_
                    # genome_sorted) — each wave pays candidate-sized work
                    s_cand, s_dbin, s_qpos, s_spos, counts_d = \
                        libjoin_pairs_indexed(
                            *g_sorted, cand_flat_d, cand_id_d, k=k,
                            diag_band=self.diag_band,
                            fill_w=self._join_fill_w,
                            max_occ=self._join_max_occ,
                            slice_size=self._join_slice, slice_quota=quota)
                else:
                    s_cand, s_dbin, s_qpos, s_spos, counts_d = libjoin_pairs(
                        chunk_d, cand_flat_d, cand_id_d, k=k,
                        diag_band=self.diag_band, fill_w=self._join_fill_w,
                        max_occ=self._join_max_occ,
                        slice_size=self._join_slice, slice_quota=quota)
                n_total, n_emit = (int(x) for x in np.asarray(counts_d))
                if n_total <= n_emit or quota >= 4 * self._join_quota:
                    break
                quota *= 2
                logger.info(
                    "find_copies.join: %d seed pairs exceeded the "
                    "per-slice quota (%d emitted); retrying at quota %d",
                    n_total, n_emit, quota)
            if n_total > n_emit:
                logger.warning(
                    "find_copies.join: %d seed pairs exceeded the per-slice "
                    "quota; %d emitted", n_total, n_emit)
            need = -(-max(n_emit, 1) // self._join_budget)
            slices = 1 if need <= 1 else 1 << (need - 1).bit_length()
            if slices > self._join_max_slices:
                logger.warning(
                    "find_copies.join: %d pairs exceed %d slices x %d "
                    "budget; tail dropped", n_emit, self._join_max_slices,
                    self._join_budget)
                slices = self._join_max_slices
            packed = np.asarray(libjoin_scan_packed(
                s_cand, s_dbin, s_qpos, s_spos, k=k, run_gap=self.run_gap,
                min_seeds=self.min_seeds, min_hsp_len=cfg.min_hsp_len,
                max_hsps=self._join_max_hsps, max_seed_pairs=self._join_budget,
                budget_slices=slices))
            cand, qs, qe, ss, se, ns, valid = (
                packed[i].astype(np.int64) for i in range(7))
            n_good = int(packed[7, 0])
            if n_good > int(valid.sum()):
                logger.warning(
                    "find_copies.join: %d HSPs exceed the %d output quota; "
                    "truncated (raise CopyFinder._join_max_hsps)",
                    n_good, int(valid.sum()))
            m = (valid != 0) & (cand < n_c)
            if not m.any():
                return
            cand, qs, qe, ss, se, ns = (a[m] for a in (cand, qs, qe, ss, se, ns))
            strand = (ss >= Cl).astype(np.int64)
            # chains must never span contigs (the spacer is shorter than the
            # FMEA gap tolerance): subject contig joins the group key
            mid = (ss + se) // 2
            fwd_mid = np.where(strand == 1, 2 * Cl - mid, mid) + c0
            ctg, _ = idx.genome.contig_of(np.clip(
                fwd_mid, 0, len(idx.genome.flat) - 1))
            key = (cand * 2 + strand) * (len(idx.genome.names) + 1) + ctg
            order = np.argsort(key, kind="stable")
            key = key[order]
            cand, qs, qe, ss, se, ns = (a[order] for a in
                                        (cand, qs, qe, ss, se, ns))
            bounds = np.concatenate(
                [[0], np.nonzero(np.diff(key))[0] + 1, [len(key)]])
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                ci = int(cand[b0])
                st = int(strand[b0])
                g_qs, g_qe = qs[b0:b1], qe[b0:b1]
                g_ss, g_se, g_ns = ss[b0:b1], se[b0:b1], ns[b0:b1]
                # copy-retrieval gap tolerance: scaled to the candidate, not
                # the coarse-discovery threshold — a finished copy's chain
                # must not absorb a tandem neighbor's early HSPs, and the
                # max_len_ratio filter bounds useful subject gaps anyway
                T_ci = int(min(cfg.fixed_extend_base_threshold,
                               max(100, lens[ci] // 2)))
                # diag_tol = T_ci: an HSP of the NEXT genomic copy (query
                # restarting near 0, subject continuing) sits >= one full
                # candidate length off the chain's diagonal, so it starts
                # its own chain instead of merging and then losing BOTH
                # copies to the max_len_ratio filter (clustered TE arrays)
                ch = chain_hsps_host(
                    g_qs, g_qe, g_ss, g_se,
                    extend_threshold=T_ci, min_len=50, diag_tol=T_ci)
                if min_abs_len:
                    # RepeatMasker-mode second pass with a TIGHT diagonal
                    # tolerance: at a head-to-tail tandem array the loose
                    # pass merges adjacent units' seeds into one
                    # diagonal-jumping chain (slen ~ k units x qlen) that
                    # the max_len_ratio filter then kills — the array
                    # annotates as NOTHING.  Tight chains stay per unit
                    # and survive as fragment hits; near-duplicates of
                    # loose chains collapse in _dedup_cap.
                    ch2 = chain_hsps_host(
                        g_qs, g_qe, g_ss, g_se,
                        extend_threshold=T_ci, min_len=50,
                        diag_tol=self.run_gap)
                    if len(ch2):
                        ch = np.concatenate([ch, ch2]) if len(ch) else ch2
                if not len(ch):
                    continue
                lf = lens_f[ci]
                qlen = ch[:, 1] - ch[:, 0]
                slen = ch[:, 3] - ch[:, 2]
                keep = ((qlen >= min_coverage * lf)
                        & (slen >= min_coverage * lf)
                        & (slen <= max_len_ratio * lf))
                if min_abs_len:
                    keep |= ((qlen >= min_abs_len) & (slen >= 0.7 * qlen)
                             & (slen <= 1.5 * qlen))
                if not keep.any():
                    continue
                ch = ch[keep]
                # per-chain seed counts: sum HSP seeds the chain contains
                cont = ((g_qs[None, :] >= ch[:, 0:1])
                        & (g_qe[None, :] <= ch[:, 1:2])
                        & (g_ss[None, :] >= ch[:, 2:3])
                        & (g_se[None, :] <= ch[:, 3:4]))
                ch_ns = cont @ g_ns
                if st == 1:
                    s0 = 2 * Cl - ch[:, 3]
                    s1 = 2 * Cl - ch[:, 2]
                else:
                    s0, s1 = ch[:, 2], ch[:, 3]
                for j in range(len(ch)):
                    out[ci].append(CopyHit(
                        start=c0 + int(s0[j]), end=c0 + int(s1[j]),
                        strand=st, nseeds=int(ch_ns[j])))

        flat_d, _L = idx.genome.device_flat_padded(idx.use_masked)
        Lp = int(flat_d.shape[0])
        if self.mesh is not None:
            # CPU backends: REPLICATED, deliberately — sharding the genome
            # stream makes XLA partition the join's global sorts, and the
            # CPU backend segfaults compiling that partitioned sort at
            # some shapes (caught by test_parallel on the 8-device mesh).
            # Replication keeps the program identical to single-device
            # (exact parity, no collectives).
            # Non-CPU (TPU) backends: the genome stream SHARDS over the
            # mesh — XLA partitions the searchsorted/fill elementwise work
            # per shard and inserts the collectives for the global pair
            # sort (the CPU-compiler segfault is a CPU-backend bug; real
            # chips take the partitioned-sort path).  Results are
            # identical either way: the pair stream is fully re-sorted by
            # (cand, dbin, qpos, spos) before the scan.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if jax.default_backend() == "cpu":
                spec = P()
            else:
                spec = P(tuple(self.mesh.axis_names))
            flat_d = jax.device_put(flat_d, NamedSharding(self.mesh, spec))
        if Lp <= self.max_libjoin_bp:
            # single-chunk genomes get the INDEXED join: the sorted
            # two-strand k-mer stream is built once and cached on the
            # genome's device-cache (copy-retrieval waves in the
            # boundary-adjust loops were each paying the 2L-element sort)
            ck = ("join_sorted", idx.use_masked, k,
                  None if self.mesh is None else id(self.mesh))
            g_sorted = idx.genome._device_cache.get(ck)
            if g_sorted is None:
                g_sorted = libjoin_genome_sorted(flat_d, k=k)
                if self.mesh is not None:
                    # CPU: replicate (partitioned-sort compiler bug);
                    # TPU: shard the sorted stream over the mesh (see the
                    # backend gate below)
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    spec = (P() if jax.default_backend() == "cpu"
                            else P(tuple(self.mesh.axis_names)))
                    g_sorted = tuple(
                        jax.device_put(a, NamedSharding(self.mesh, spec))
                        for a in g_sorted)
                idx.genome._device_cache[ck] = g_sorted
            _one_chunk(flat_d, 0, Lp, g_sorted=g_sorted)
        else:
            # HBM-bounded chunks with halo, like the coarse selfjoin: any
            # copy lies whole in at least one chunk; cross-chunk duplicates
            # collapse in the dedup tail
            C = self.max_libjoin_bp
            halo = int(min(C // 4, max(65_536, 2 * lens.max())))
            slicer = _chunk_slicer(C)
            step = C - 2 * halo
            for c0 in range(0, max(1, Lp - 2 * halo), step):
                c0 = min(c0, Lp - C)
                _one_chunk(slicer(flat_d, jnp.int32(c0)), c0, C)
                if c0 == Lp - C:
                    break
        return _dedup_cap(out, max_copies)


_MINHASH_SALTS = np.arange(1, 65, dtype=np.uint64) * np.uint64(
    0x9E3779B97F4A7C15)


def _kmer_sketch_groups(seqs: Sequence[np.ndarray], k: int,
                        thresh: float = 0.15,
                        sketch: int = 64,
                        linkage: str = "single") -> List[int]:
    """Group candidates by EXACT k-mer sharing (min-hash Jaccard estimate).

    The 4-mer-profile centered cosine this replaces measured composition,
    not shared seeds: on real TE libraries it single-linkage-chained
    dozens of DISTINCT families whose base composition correlates (73/78
    of the vendored test.ref at thresh 0.35).  Join-wave formation and
    family rep selection both care about candidates sharing exact
    k-mers — two candidates with zero common k-mers can neither starve
    each other in the join's fill slots nor be copies of one family.
    Min-hash: per candidate, the min of (code ^ salt) * mult over its
    k-mer set for `sketch` salts; slot-equality fraction estimates
    Jaccard.

    linkage "single": union-find components over pairs >= thresh — right
    for join-wave formation (k-mer COMPETITION is transitive).
    linkage "greedy": cd-hit-style greedy representative clustering in
    length-ASCENDING order — a candidate joins the first FOUNDER it
    matches, never another member, so a chimeric candidate spanning two
    adjacent distinct families attaches to one family without ever
    MERGING the two (single linkage chained 146/259 gated candidates of
    the dense bench substrate into one component, whose single rep then
    lost a whole planted family; reference analog: cd-hit-est's greedy
    rep clustering in judge_TIR_transposons.py:87-89).  Ascending order
    makes pure (short) candidates the founders, chimeras the joiners.
    """
    n = len(seqs)
    if n <= 1:
        return [0] * n
    salts = _MINHASH_SALTS[:sketch]
    sk = np.full((n, sketch), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    has_sketch = np.zeros(n, bool)   # rows with no valid k-mers keep the
    for i, s in enumerate(seqs):     # sentinel and must NOT match each other
        v = np.asarray(s, np.int64)
        if len(v) < k:
            continue
        m = len(v) - k + 1
        ok = np.ones(m, bool)
        code = np.zeros(m, np.int64)
        for j in range(k):          # k <= 16 rolling windows, vectorized
            w = v[j : m + j]
            ok &= w < 4
            code = code * 4 + np.where(w < 4, w, 0)
        codes = np.unique(code[ok])
        if not len(codes):
            continue
        h = (codes.astype(np.uint64)[:, None] ^ salts[None, :]) \
            * np.uint64(0xC2B2AE3D27D4EB4F)
        sk[i] = h.min(axis=0)
        has_sketch[i] = True
    if linkage == "greedy":
        order = sorted(range(n), key=lambda i: len(seqs[i]))
        group = np.full(n, -1, np.int64)
        founders: List[int] = []
        for i in order:
            if not has_sketch[i]:
                group[i] = i
                continue
            if founders:
                fsk = sk[founders]                       # [F, sketch]
                agree = (fsk == sk[i][None, :]).mean(axis=1)
                j = int(np.argmax(agree))
                if agree[j] >= thresh:
                    group[i] = founders[j]
                    continue
            founders.append(i)
            group[i] = i
        return [int(g) for g in group]

    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = int(parent[x])
        return x

    # blockwise pairwise slot-agreement to bound the [n, n, sketch] temp
    B = max(1, (1 << 24) // (n * sketch + 1))
    for a0 in range(0, n, B):
        agree = (sk[a0 : a0 + B, None, :] == sk[None, :, :]).mean(axis=2)
        ii, jj = np.nonzero(agree >= thresh)
        for a, b in zip(ii + a0, jj):
            if a < b and has_sketch[a] and has_sketch[b]:
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[ra] = rb
    return [find(i) for i in range(n)]


def _dedup_cap(out: List[List[CopyHit]], max_copies: int) -> List[List[CopyHit]]:
    """Drop >=80%-overlapping duplicate hits, cap at max_copies per
    candidate (prefer more seeds)."""
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
