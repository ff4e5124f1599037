"""Mesh-sharded coarse discovery: parity with the single-device path."""

import numpy as np
import jax
import pytest

from hite_tpu.config import AlignConfig
from hite_tpu.genome import synthetic_genome
from hite_tpu.parallel.dispatch import coarse_discover_sharded
from hite_tpu.parallel.mesh import make_mesh
from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(7)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, size=600))
    genome, ins = synthetic_genome(120_000, [te], [8], seed=3,
                                   mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    params = CoarseParams(seg_len=16_384, pair_batch=8)

    single = coarse_discover(genome, cfg, params)
    mesh = make_mesh(n_devices=8)
    sharded = coarse_discover_sharded(genome, cfg, mesh, params)

    assert len(sharded) == len(single)
    assert np.array_equal(np.sort(sharded, axis=0), np.sort(single, axis=0))


def test_sharded_different_mesh_shapes():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(8)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, size=500))
    genome, _ = synthetic_genome(60_000, [te], [5], seed=4, mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    params = CoarseParams(seg_len=16_384, pair_batch=8)
    ref = coarse_discover(genome, cfg, params)
    for dp, tp in ((4, 2), (2, 2)):
        mesh = make_mesh(n_devices=dp * tp, dp=dp, tp=tp)
        got = coarse_discover_sharded(genome, cfg, mesh, params)
        assert np.array_equal(np.sort(got, axis=0), np.sort(ref, axis=0))
