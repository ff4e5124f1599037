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
    params = CoarseParams(seg_len=16_384, pair_batch=8, strategy="pairs")

    single = coarse_discover(genome, cfg, params)
    mesh = make_mesh(n_devices=8)
    sharded = coarse_discover_sharded(genome, cfg, mesh, params)

    assert len(sharded) == len(single)
    assert np.array_equal(np.sort(sharded, axis=0), np.sort(single, axis=0))


def test_sharded_different_mesh_shapes():
    """dp x tp mesh-shape parity, in a FRESH interpreter.

    Run as a subprocess on purpose: the check passes in isolation (and on
    real TPU meshes), but inside the full suite the XLA *CPU* backend's
    compiler deterministically segfaults compiling the pair-grid program
    for the 4x2/2x2 meshes after ~240 prior tests' backend state has
    accumulated — the same CPU-compiler fragility already documented for
    GSPMD-partitioned sorts (pipeline/copies.py keeps the copy-retrieval
    join replicated under a mesh for that reason).  A fresh process is
    the supported configuration; test_multihost.py uses the same pattern.
    """
    import os
    import subprocess
    import sys
    import textwrap

    body = textwrap.dedent("""
        import numpy as np
        from hite_tpu.config import AlignConfig
        from hite_tpu.genome import synthetic_genome
        from hite_tpu.parallel.dispatch import coarse_discover_sharded
        from hite_tpu.parallel.mesh import make_mesh
        from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover

        rng = np.random.default_rng(8)
        te = "".join("ACGT"[c] for c in rng.integers(0, 4, size=500))
        genome, _ = synthetic_genome(60_000, [te], [5], seed=4,
                                     mutation_rate=0.02)
        cfg = AlignConfig(fixed_extend_base_threshold=2000)
        params = CoarseParams(seg_len=16_384, pair_batch=8,
                              strategy="pairs")
        ref = coarse_discover(genome, cfg, params)
        assert len(ref) > 0
        for dp, tp in ((4, 2), (2, 2)):
            mesh = make_mesh(n_devices=dp * tp, dp=dp, tp=tp)
            got = coarse_discover_sharded(genome, cfg, mesh, params)
            assert np.array_equal(np.sort(got, axis=0),
                                  np.sort(ref, axis=0)), (dp, tp)
        print("MESH_SHAPE_PARITY_OK")
    """)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=xla_flags,
               PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n" + body],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=repo_root)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "MESH_SHAPE_PARITY_OK" in proc.stdout


def test_sharded_annotation_matches_single_device():
    """Library-batch sharded annotation == single-device annotation."""
    from hite_tpu.config import PipelineConfig
    from hite_tpu.pipeline.annotate import annotate_genome

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(9)
    tes = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
           for n in (400, 700)]
    genome, _ = synthetic_genome(80_000, tes, [5, 4], seed=5,
                                 mutation_rate=0.02)
    cfg = PipelineConfig()
    lib = {f"TE_{i}#Unknown": np.asarray(
        [{"A": 0, "C": 1, "G": 2, "T": 3}[ch] for ch in te], np.uint8)
        for i, te in enumerate(tes)}

    single = annotate_genome(genome, lib, cfg)
    mesh = make_mesh(n_devices=8)
    sharded = annotate_genome(genome, lib, cfg, mesh=mesh)

    key = lambda h: (h.contig, h.start, h.end, h.strand, h.family)
    assert sorted(map(key, sharded)) == sorted(map(key, single))
    assert len(single) >= 9


def test_mesh_sharded_selfjoin_matches_single_device():
    """Chunked selfjoin over the dp axis == single-device discovery."""
    from hite_tpu.config import AlignConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover

    rng = np.random.default_rng(6)
    tes = ["".join("ACGT"[c] for c in rng.integers(0, 4, L))
           for L in (400, 900)]
    genome, _ = synthetic_genome(400_000, tes, [24, 14], seed=11,
                                 mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    params = CoarseParams(max_selfjoin_bp=1 << 17)
    single = coarse_discover(genome, cfg, params, max_repeat_len=5_000)
    mesh = make_mesh(n_devices=8, dp=8, tp=1)
    sharded = coarse_discover(genome, cfg, params, max_repeat_len=5_000,
                              mesh=mesh)
    assert len(single) > 0
    # EXACT two-directional parity: both paths share one chunk grid
    # (coarse._chunk_grid), so raw interval unions — and hence the deduped
    # candidate sets — are identical
    assert np.array_equal(np.sort(single, axis=0), np.sort(sharded, axis=0)), (
        len(single), len(sharded))


def test_run_pipeline_with_mesh(tmp_path):
    """Full pipeline with a device mesh: sharded discovery + annotation."""
    from hite_tpu.config import AlignConfig, PipelineConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.coarse import CoarseParams
    from hite_tpu.pipeline.run import run_pipeline

    # plant STRUCTURED elements (TIR termini + TSD): structureless random
    # repeats are correctly rejected by every module judge, leaving an
    # empty library (they land in the low-copy pool instead)
    rng = np.random.default_rng(8)
    tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    while tir_t[0] == 3 and tir_t[1] == 2:
        tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    tir_te = np.concatenate([tir_t, rng.integers(0, 4, 460).astype(np.uint8),
                             (3 - tir_t)[::-1]])
    tes = ["".join("ACGT"[c] for c in tir_te),
           "".join("ACGT"[c] for c in rng.integers(0, 4, 1100))]
    genome, _ = synthetic_genome(60_000, tes, [6, 4], seed=15,
                                 mutation_rate=0.02, tsd_lens=[5, 0])
    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    mesh = make_mesh(n_devices=8, dp=8, tp=1)
    res = run_pipeline(genome, cfg, out_dir=str(tmp_path),
                       coarse_params=CoarseParams(seg_len=16_384),
                       mesh=mesh)
    assert res.libs.get("merged"), "no library produced under mesh"
    assert (tmp_path / "genome.gff").exists()
