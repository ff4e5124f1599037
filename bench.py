"""Benchmark: END-TO-END single-genome pipeline throughput on the TPU chip.

Runs the complete pipeline (tandem mask -> coarse discovery -> TIR /
Helitron / non-LTR verification -> LTR detection + deep filter -> library
assembly -> genome annotation, i.e. the reference main.py stage DAG,
SURVEY.md §3.1) on a production-representative 8 Mbp synthetic genome with
planted families of all four TE classes, and reports Mbp of genome
processed per second of wall clock.

Prints a safety-net JSON line first (full pipeline at 2 Mbp, so a driver
timeout still leaves one parsed end-to-end record — the round-2 lesson),
then the headline 8 Mbp JSON line LAST: {"metric", "value", "unit",
"vs_baseline", the per-stage wall-clock map ("stages"), secondary metrics}.

vs_baseline: the reference publishes no numeric end-to-end throughput
(BASELINE.md). The denominator is an estimate of reference HiTE's
end-to-end throughput on its recommended 40-CPU setup: ~0.01 Mbp/s
(rice-scale genomes, ~374 Mbp, reportedly take ~10 h wall-clock; the
demo-scale acceptance run is minutes-to-hours). The round-1 repo measured
its own 8 Mbp end-to-end run at 1960 s (0.0041 Mbp/s) before the libjoin
copy-retrieval rewrite — that is the internal number this bench tracks.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_E2E_MBP_S = 0.01  # estimated reference end-to-end throughput (above)
GENOME_BP = 8_000_000


def build_bench_genome(length: int = GENOME_BP, scale: int = 1):
    """8 Mbp genome with planted families of all four TE classes.

    Mirrors the acceptance-test substrate (tests/test_pipeline.py) at
    production scale: TIR (TSD+ITR), Helitron (LCV head + CTAGT tail,
    A|T host site), SINE (polyA tail + TSD) and intact LTR elements.
    `scale` multiplies both family counts and copy counts (used by
    scripts/scale_run.py to keep TE density constant at >=100 Mbp).
    """
    from hite_tpu.genome import Genome
    from hite_tpu.io.fasta import encode_seq

    rng = np.random.default_rng(7)
    bg = rng.integers(0, 4, length).astype(np.uint8)
    # interval-tree-free overlap check: bucket placements by 64 Kb bin so
    # planting stays O(n) at 100 Mbp scale
    bins = {}

    def overlaps(pos, end):
        for b in range(pos // 65536 - 1, end // 65536 + 2):
            for s, e in bins.get(b, ()):
                if pos < e + 200 and end + 200 > s:
                    return True
        return False

    placed = []

    def plant(te, n, tsd=0, host_at=False, mut=0.02):
        starts = []
        while len(starts) < n:
            pos = int(rng.integers(1000, length - len(te) - 1000))
            if overlaps(pos, pos + len(te)):
                continue
            copy = te.copy()
            muts = rng.random(len(copy)) < mut
            copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
            if tsd:
                t = rng.integers(0, 4, tsd).astype(np.uint8)
                bg[pos - tsd: pos] = t
                bg[pos + len(copy): pos + len(copy) + tsd] = t
            if host_at:
                bg[pos - 1] = 0
                bg[pos + len(copy)] = 3
            bg[pos: pos + len(copy)] = copy
            placed.append((pos, pos + len(copy)))
            for b in range(pos // 65536, (pos + len(copy)) // 65536 + 1):
                bins.setdefault(b, []).append((pos, pos + len(copy)))
            starts.append(pos)
        return starts

    # TIR families (20 bp inverted termini, 5 bp TSD)
    for f in range(3 * scale):
        n, interior = ((20, 460), (15, 900), (10, 1400))[f % 3]
        t = rng.integers(0, 4, 20).astype(np.uint8)
        while t[0] == 3 and t[1] == 2:
            t = rng.integers(0, 4, 20).astype(np.uint8)
        te = np.concatenate([t, rng.integers(0, 4, interior).astype(np.uint8),
                             (3 - t)[::-1]])
        plant(te, n, tsd=5)

    # Helitron families (LCV head + CTAGT tail, A|T host site)
    for f in range(2 * scale):
        n, interior = ((8, 700), (8, 1200))[f % 2]
        te = np.concatenate([
            encode_seq("TCTCTACTA"),
            rng.integers(0, 4, interior).astype(np.uint8),
            encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")])
        plant(te, n, host_at=True)

    # SINE families (polyA tail + 12 bp TSD)
    for f in range(2 * scale):
        n, interior = ((20, 280), (20, 420))[f % 2]
        te = np.concatenate([rng.integers(0, 4, interior).astype(np.uint8),
                             np.zeros(14, np.uint8)])
        plant(te, n, tsd=12)

    # LTR families (TG..CA LTRs, 2.2 kb interior, 5 bp TSD)
    for f in range(4 * scale):
        n, ltr_len = ((4, 250), (4, 350), (4, 450), (4, 600))[f % 4]
        t = rng.integers(0, 4, ltr_len).astype(np.uint8)
        t[0], t[1], t[-2], t[-1] = 3, 2, 1, 0
        te = np.concatenate([t, rng.integers(0, 4, 2200).astype(np.uint8), t])
        plant(te, n, tsd=5, mut=0.01)

    return Genome.from_dict({"chr1": bg}), len(placed)


def _run_phase(genome_bp: int):
    """Run the full pipeline on a `genome_bp` bench genome; returns
    (throughput Mbp/s, wall s, record dict)."""
    from hite_tpu.config import AlignConfig, PipelineConfig
    from hite_tpu.pipeline.coarse import CoarseParams
    from hite_tpu.pipeline.run import run_pipeline
    from hite_tpu.utils.log import STAGE_TIMES

    STAGE_TIMES.clear()
    genome, n_planted = build_bench_genome(genome_bp)
    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=262_144, pair_batch=64, stride=4,
                          max_hits=4)

    t0 = time.perf_counter()
    result = run_pipeline(genome, cfg,
                          out_dir=f"/tmp/hite_bench_out_{genome_bp}",
                          coarse_params=params)
    dt = time.perf_counter() - t0
    mbp_s = genome_bp / 1e6 / dt
    stages = {k: round(v, 2) for k, v in sorted(
        STAGE_TIMES.items(), key=lambda kv: -kv[1]) if v >= 1.0}
    rec = {
        "metric": "end_to_end_pipeline_throughput",
        "value": round(mbp_s, 4),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / BASELINE_E2E_MBP_S, 2),
        "wall_s": round(dt, 1),
        "genome_mbp": genome_bp / 1e6,
        "planted_copies": n_planted,
        "library_entries": len(result.libs.get("merged", {})),
        "annotation_hits": result.metrics.get("annotation_hits"),
        "stages": stages,
    }
    return mbp_s, dt, rec


def main() -> None:
    import jax

    try:  # persistent compile cache cuts warmup wall-clock across runs;
        # repo-local so it survives /tmp cleanup between driver rounds
        # (round-2 lesson: a cold cache turns the 2 Mbp safety phase into
        # ~30 min of remote compiles), seeded from any older /tmp cache
        import os
        import shutil

        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        if os.path.isdir("/tmp/jax_cache"):
            for f in os.listdir("/tmp/jax_cache"):
                dst = os.path.join(cache, f)
                if not os.path.exists(dst):
                    try:
                        shutil.copy2(os.path.join("/tmp/jax_cache", f), dst)
                    except OSError:
                        pass
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    # tunnel warm-up OUTSIDE the timing window: a fresh client's first
    # SUBSTANTIAL device RPC can stall ~10 min while the axon server tears
    # down the previous client's session (observed on v5e; a trivial 8-elem
    # op did NOT trigger/absorb it — the stall follows the first real
    # transfer+execute).  Run the pipeline's actual first program on a
    # zero batch: same HLO -> persistent-cache hit, representative bytes.
    import jax.numpy as jnp

    from hite_tpu.ops.tandem import long_tandem_mask, tandem_mask

    warm = jnp.asarray(np.zeros((16, 262_144), np.uint8))
    np.asarray(jax.jit(lambda d: tandem_mask(d) | long_tandem_mask(d))(warm))

    # SAFETY-NET phase (round-2 lesson: the driver bench timed out with
    # NO parsed record, BENCH_r02.json rc=124): a small full-pipeline run
    # first, so a later timeout still leaves one honest parsed end-to-end
    # number in the output.  The final (headline) JSON line is printed
    # LAST; both lines carry the same metric and honest genome_mbp.
    mbp_s, dt, rec = _run_phase(2_000_000)
    rec["phase"] = "safety-2mbp"
    print(json.dumps(rec), flush=True)

    mbp_s, dt, rec = _run_phase(GENOME_BP)
    rec["vs_round1_e2e"] = round(dt and (1960.0 / dt), 2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
