"""CLI smoke test: python -m hite_tpu on a tiny genome."""

import os
import subprocess
import sys

import numpy as np
import pytest

from hite_tpu.genome import synthetic_genome
from hite_tpu.io.fasta import decode_seq, write_fasta


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, 500))
    genome, _ = synthetic_genome(50_000, [te], [5], seed=2, mutation_rate=0.02)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, {"chr1": genome.flat[: genome.size]})
    out = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from hite_tpu.pipeline.run import main; main()",
         "--genome", fa, "--out_dir", out,
         "--chrom_seg_length", "16384", "--BM_HiTE", "1"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    for f in ("confident_TE.cons.fa", "confident_tir.fa", "stage_times.json"):
        assert os.path.exists(os.path.join(out, f)), f
    assert os.path.exists(os.path.join(out, "benchmark.json"))


def test_use_filtr_flag_and_alias():
    from hite_tpu.pipeline.run import config_from_argv

    cfg, _ = config_from_argv(["--genome", "g.fa"])
    assert cfg.ltr.use_filtr
    cfg, _ = config_from_argv(["--genome", "g.fa", "--use_FiLTR", "0"])
    assert not cfg.ltr.use_filtr
    # the reference's other name for the same subsystem
    cfg, _ = config_from_argv(["--genome", "g.fa", "--use_HybridLTR", "0"])
    assert not cfg.ltr.use_filtr
