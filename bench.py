"""Benchmark: coarse repeat-discovery throughput on the TPU chip.

Measures the framework's primary hot path (SURVEY.md §3.2 hot loops 1+2 —
the all-vs-all segment alignment grid + FMEA chaining, which dominates the
reference's wall clock) as Mbp of genome processed per second, end to end
including candidate extraction, on a synthetic repeat-bearing genome.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numeric throughput (BASELINE.md);
the denominator is an estimate of reference HiTE's coarse-boundary stage
throughput on its recommended 40-CPU setup (~0.1 Mbp/s for the blastn
all-vs-all + Python FMEA on a 400MB chunk, i.e. ~1h per 400Mbp stage).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MBP_S = 0.1  # estimated reference coarse-stage throughput (see above)


def main() -> None:
    import jax

    try:  # persistent compile cache cuts warmup wall-clock across runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hite_tpu.config import AlignConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover

    rng = np.random.default_rng(0)
    te_seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=L))
               for L in (600, 1500, 3000)]
    # 8Mbp: large enough that fixed per-call overheads amortize (measured
    # 11.9 Mbp/s at 2Mbp -> 16.3 at 8Mbp and flat to 16Mbp on v5e)
    genome_bp = 8_000_000
    genome, _ = synthetic_genome(
        genome_bp, te_seqs, [80, 40, 20], seed=1, mutation_rate=0.05)

    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    params = CoarseParams(seg_len=262_144, pair_batch=64,
                          stride=4, max_hits=4)

    # warmup (compile)
    coarse_discover(genome, cfg, params)

    # coarse_discover returns host numpy (fully synced) — do NOT append a
    # jnp op here: an un-jitted dispatch costs ~0.4s over the axon tunnel
    # and was being counted inside the timed window
    t0 = time.perf_counter()
    cands = coarse_discover(genome, cfg, params)
    dt = time.perf_counter() - t0

    mbp_s = genome_bp / 1e6 / dt
    print(json.dumps({
        "metric": "coarse_discovery_throughput",
        "value": round(mbp_s, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / BASELINE_MBP_S, 2),
    }))


if __name__ == "__main__":
    main()
