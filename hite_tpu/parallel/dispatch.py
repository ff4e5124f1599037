"""Sharded dispatch of the all-vs-all alignment grid.

The reference's only scale-out is Nextflow task fan-out of genome chunks
(`main.nf:627-648`, SURVEY.md §2.E).  Here the same data parallelism is a
sharding annotation: the segment-pair batch axis is sharded over the mesh's
'dp' axis while the per-segment k-mer indexes are replicated, and XLA GSPMD
partitions the vmapped pair kernel — zero collectives in the grid itself
(candidate merging happens host-side, as the reference's collectFile did;
an all-gather variant is the natural next step for sharded indexes).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.ops.kmer import KmerIndex
from hite_tpu.pipeline.coarse import (
    CoarseParams, _chains_to_intervals, _dedup_intervals, get_pair_aligner,
)
from hite_tpu.utils.log import logger, stage_timer


class ShardedPairAligner:
    """Pair-grid aligner with the batch axis sharded over mesh 'dp'."""

    def __init__(self, mesh: Mesh, cfg: AlignConfig, params: CoarseParams):
        self.mesh = mesh
        self.cfg = cfg
        self.p = params
        self.dp = mesh.shape["dp"] * mesh.shape.get("tp", 1)
        base = get_pair_aligner(cfg, params)
        self._prepare = base._prepare

        repl = NamedSharding(mesh, P())
        shard_b = NamedSharding(mesh, P(("dp", "tp")))
        self._repl = repl
        self._shard_b = shard_b
        self._pair_batch = jax.jit(
            base._pair_batch.__wrapped__
            if hasattr(base._pair_batch, "__wrapped__") else base._pair_batch,
            in_shardings=(repl, repl, repl, repl, repl, repl, repl,
                          shard_b, shard_b, shard_b),
        )

    def prepare(self, segs: np.ndarray):
        segs_d = jax.device_put(jnp.asarray(segs), self._repl)
        return self._prepare(segs_d, segs.shape[1] - self.cfg.kmer_size + 1)

    def align_pairs(self, km, fwd: KmerIndex, rc: KmerIndex, pairs: np.ndarray):
        bi = jax.device_put(jnp.asarray(pairs[:, 0]), self._shard_b)
        bj = jax.device_put(jnp.asarray(pairs[:, 1]), self._shard_b)
        is_self = jax.device_put(jnp.asarray(pairs[:, 0] == pairs[:, 1]),
                                 self._shard_b)
        return self._pair_batch(km, fwd.codes, fwd.pos, fwd.buckets,
                                rc.codes, rc.pos, rc.buckets,
                                bi, bj, is_self)


def coarse_discover_sharded(
    genome: Genome,
    cfg: AlignConfig,
    mesh: Mesh,
    params: Optional[CoarseParams] = None,
    use_masked: bool = True,
    max_repeat_len: int = 30_000,
    min_repeat_len: int = 80,
) -> np.ndarray:
    """Mesh-sharded coarse discovery; numerically identical to the
    single-device `coarse_discover` (the grid is deterministic)."""
    p = params or CoarseParams()
    n_dev = mesh.devices.size
    # batch must divide evenly across devices
    batch = max(p.pair_batch, n_dev)
    batch = (batch // n_dev) * n_dev

    segs = genome.segment_view(p.seg_len, use_masked=use_masked)
    n_segs = segs.shape[0]
    aligner = ShardedPairAligner(mesh, cfg, p)

    with stage_timer("coarse.prepare"):
        km, fwd, rc = aligner.prepare(segs)

    # same masked-pair skipping as the single-device path
    valid_frac = (segs < 4).mean(axis=1)
    live = valid_frac >= 0.02
    all_pairs = np.array(
        [(i, j) for i in range(n_segs) for j in range(i + 1)
         if live[i] and live[j]],
        dtype=np.int64).reshape(-1, 2)
    cand: List[np.ndarray] = []
    with stage_timer("coarse.align.sharded"):
        for b0 in range(0, len(all_pairs), batch):
            chunk = all_pairs[b0 : b0 + batch]
            if len(chunk) < batch:
                pad = np.repeat(chunk[-1:], batch - len(chunk), axis=0)
                full = np.concatenate([chunk, pad])
            else:
                full = chunk
            fc, rch = aligner.align_pairs(km, fwd, rc, full)
            cand.append(_chains_to_intervals(
                jax.tree.map(lambda a: np.asarray(a)[: len(chunk)], fc),
                jax.tree.map(lambda a: np.asarray(a)[: len(chunk)], rch),
                chunk, p.seg_len, p.seg_len - cfg.kmer_size + 1))

    intervals = (np.concatenate(cand) if cand else np.zeros((0, 2), np.int64))
    return _dedup_intervals(intervals, genome, cfg,
                            min_repeat_len, max_repeat_len)
