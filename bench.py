"""Benchmark: END-TO-END single-genome pipeline throughput + accuracy on TPU.

Runs the complete pipeline (tandem mask -> coarse discovery -> TIR /
Helitron / non-LTR verification -> LTR detection + deep filter -> library
assembly -> genome annotation, i.e. the reference main.py stage DAG,
SURVEY.md §3.1) on production-representative synthetic genomes with
planted families of all four TE classes, and reports Mbp of genome
processed per second of wall clock PLUS base-level sensitivity /
precision / F1 against the planted truth (the reference's primary
metric, `module/lib_evaluation.py:157-168`).

Output structure (round-3 lesson: three straight driver benches timed out
with parsed=null because nothing printed until a whole phase finished):
JSON records are emitted INCREMENTALLY —
  1. a coarse-discovery record as soon as the small phase's coarse stage
     completes (minutes even on a cold compile cache),
  2. a full end-to-end record after EACH completed phase
     (safety-2mbp -> headline 8 Mbp clean -> hard 8 Mbp substrate),
  3. the headline 8 Mbp record re-printed LAST (with the hard-substrate
     accuracy merged in) so the driver's final parsed line is the
     headline number.
Every end-to-end record carries {"metric", "value", "unit",
"vs_baseline", "accuracy", per-stage wall-clock ("stages") and compile
budget ("compile_programs"/"compile_s")}.

vs_baseline: the reference publishes no numeric end-to-end throughput
(BASELINE.md).  The denominator is an estimate of reference HiTE's
end-to-end throughput on its recommended 40-CPU setup: ~0.01 Mbp/s
(rice-scale genomes, ~374 Mbp, reportedly take ~10 h wall-clock).  The
round-1 repo measured its own 8 Mbp end-to-end run at 1960 s
(0.0041 Mbp/s); that is the internal number vs_round1_e2e tracks.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_E2E_MBP_S = 0.01   # estimated reference end-to-end (docstring)
BASELINE_COARSE_MBP_S = 0.1  # estimated reference coarse stage (BASELINE.md)
GENOME_BP = 8_000_000


def build_bench_genome(length: int = GENOME_BP, scale: int = 1,
                       hard: bool = False):
    """Synthetic genome with planted families of all four TE classes.

    Mirrors the acceptance-test substrate (tests/test_pipeline.py) at
    production scale: TIR (TSD+ITR), Helitron (LCV head + CTAGT tail,
    A|T host site), SINE (polyA tail + TSD) and intact LTR elements.
    `scale` multiplies both family counts and copy counts (used by
    scripts/scale_run.py to keep TE density constant at >=100 Mbp).

    `hard=True` adds the reference's hard cases — the inputs dynamic
    boundary adjustment exists for (`Util.py:8032-8299`): nested
    insertions (TIR inside an LTR interior), 5'/3'-truncated copies,
    solo LTRs, and head-to-tail tandem TE arrays.

    Returns (genome, truth) where truth is a dict:
      intervals: int64 [N, 2] flat coords of every planted TE base span
      classes:   list[str] per interval (TIR/Helitron/SINE/LTR)
      families:  dict name -> uint8 consensus (the unmutated element)
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

    placed = []        # (start, end, class)
    families = {}

    def plant(te, n, klass, tsd=0, host_at=False, mut=0.02,
              spans=None):
        """Plant n mutated copies of `te`.  `spans` optionally lists
        (offset, length, class) sub-spans for composite elements
        (nested insertions); default is one whole-element span."""
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
            for off, ln, kl in (spans or ((0, len(te), klass),)):
                placed.append((pos + off, pos + off + ln, kl))
            for b in range(pos // 65536, (pos + len(copy)) // 65536 + 1):
                bins.setdefault(b, []).append((pos, pos + len(copy)))
            starts.append(pos)
        return starts

    # TIR families (20 bp inverted termini, 5 bp TSD)
    tir_tes = []
    for f in range(3 * scale):
        n, interior = ((20, 460), (15, 900), (10, 1400))[f % 3]
        t = rng.integers(0, 4, 20).astype(np.uint8)
        while t[0] == 3 and t[1] == 2:
            t = rng.integers(0, 4, 20).astype(np.uint8)
        te = np.concatenate([t, rng.integers(0, 4, interior).astype(np.uint8),
                             (3 - t)[::-1]])
        tir_tes.append(te)
        families[f"TIR_{f}"] = te
        plant(te, n, "TIR", tsd=5)

    # Helitron families (LCV head + CTAGT tail, A|T host site)
    for f in range(2 * scale):
        n, interior = ((8, 700), (8, 1200))[f % 2]
        te = np.concatenate([
            encode_seq("TCTCTACTA"),
            rng.integers(0, 4, interior).astype(np.uint8),
            encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")])
        families[f"HEL_{f}"] = te
        plant(te, n, "Helitron", host_at=True)

    # SINE families (polyA tail + 12 bp TSD)
    for f in range(2 * scale):
        n, interior = ((20, 280), (20, 420))[f % 2]
        te = np.concatenate([rng.integers(0, 4, interior).astype(np.uint8),
                             np.zeros(14, np.uint8)])
        families[f"SINE_{f}"] = te
        plant(te, n, "SINE", tsd=12)

    # LTR families (TG..CA LTRs, 2.2 kb interior, 5 bp TSD)
    ltr_tes = []
    for f in range(4 * scale):
        n, ltr_len = ((4, 250), (4, 350), (4, 450), (4, 600))[f % 4]
        t = rng.integers(0, 4, ltr_len).astype(np.uint8)
        t[0], t[1], t[-2], t[-1] = 3, 2, 1, 0
        te = np.concatenate([t, rng.integers(0, 4, 2200).astype(np.uint8), t])
        ltr_tes.append((te, t))
        families[f"LTR_{f}"] = te
        plant(te, n, "LTR", tsd=5, mut=0.01)

    if hard:
        # 5'/3'-truncated TIR copies (no TSD, no intact termini on the
        # truncated side — the fragmented-copy case)
        for f, te in enumerate(tir_tes):
            frac = 0.4 + 0.1 * (f % 4)
            cut = int(len(te) * frac)
            plant(te[cut:], 3, "TIR")            # 5' truncated
            plant(te[:-cut], 3, "TIR")           # 3' truncated
        # solo LTRs: the terminal repeat alone with its TSD (unequal
        # recombination product; LTR_retriever's classic hard case)
        for f, (_te, t) in enumerate(ltr_tes):
            plant(t, 3, "LTR", tsd=5, mut=0.01)
        # nested insertion: a TIR element inside an LTR interior
        for f, (te, t) in enumerate(ltr_tes):
            inner = tir_tes[f % len(tir_tes)]
            mid = len(t) + 1100
            composite = np.concatenate([te[:mid], inner, te[mid:]])
            spans = ((0, mid, "LTR"), (mid, len(inner), "TIR"),
                     (mid + len(inner), len(te) - mid, "LTR"))
            plant(composite, 2, "LTR", tsd=5, mut=0.01, spans=spans)
        # head-to-tail tandem TE arrays (the fmea_chain2 recall case)
        for f, te in enumerate(tir_tes):
            k = 2 + f % 2
            plant(np.concatenate([te] * k), 2, "TIR", tsd=5)

    intervals = np.array([(s, e) for s, e, _k in placed],
                         np.int64).reshape(-1, 2)
    truth = {"intervals": intervals,
             "classes": [k for _s, _e, k in placed],
             "families": families}
    return Genome.from_dict({"chr1": bg}), truth


def accuracy_metrics(genome, result, truth, cfg) -> dict:
    """Base-level sens/prec/F1 of the annotation against the planted
    truth, per-class sensitivity, library-entries-per-family ratio, and
    the BM_RM2 family-level perfect/good/present counts of the produced
    library against the planted family consensi (VERDICT r3 #2)."""
    from hite_tpu.utils import intervals as iv

    name_to_start = {n: int(s) for n, s in
                     zip(genome.names, genome.starts)}
    test = np.array([(name_to_start[h.contig] + h.start - 1,
                      name_to_start[h.contig] + h.end)
                     for h in result.annotation], np.int64).reshape(-1, 2)
    test_iv = iv.merge(test)
    gold_iv = iv.merge(truth["intervals"])
    gold_bp = iv.total_length(gold_iv)
    test_bp = iv.total_length(test_iv)
    if len(gold_iv) and len(test_iv):
        cov = iv.coverage_fraction(gold_iv, test_iv)
        tp = int(np.sum(cov * (gold_iv[:, 1] - gold_iv[:, 0])))
    else:
        tp = 0
    fp, fn = test_bp - tp, gold_bp - tp
    out = {
        "TP": tp, "FP": fp, "FN": fn,
        "sensitivity": round(tp / gold_bp, 4) if gold_bp else 0.0,
        "precision": round(tp / test_bp, 4) if test_bp else 0.0,
        "F1": round(2 * tp / (2 * tp + fp + fn), 4)
              if (2 * tp + fp + fn) else 0.0,
    }
    # per-class sensitivity: planted bases of each class covered by test
    by_class: dict = {}
    for (s, e), k in zip(truth["intervals"], truth["classes"]):
        by_class.setdefault(k, []).append((s, e))
    for k, spans in sorted(by_class.items()):
        giv = iv.merge(np.array(spans, np.int64))
        gbp = iv.total_length(giv)
        c = iv.coverage_fraction(giv, test_iv) if len(test_iv) else \
            np.zeros(len(giv))
        out[f"sens_{k}"] = round(
            float(np.sum(c * (giv[:, 1] - giv[:, 0])) / gbp), 4) if gbp \
            else 0.0
    merged = result.libs.get("merged", {})
    n_fam = max(len(truth["families"]), 1)
    out["library_entries_per_family"] = round(len(merged) / n_fam, 2)
    try:
        from hite_tpu.pipeline.benchmark import family_level_metrics

        gold_lib = {n: s for n, s in truth["families"].items()}
        out["BM_RM2"] = family_level_metrics(merged, gold_lib, cfg)
    except Exception as exc:  # never let the accuracy block kill the bench
        out["BM_RM2_error"] = repr(exc)
    return out


def _run_phase(genome_bp: int, phase: str, hard: bool = False,
               emit_coarse: bool = False):
    """Run the full pipeline on a `genome_bp` bench genome; returns the
    record dict (throughput + stage map + compile budget + accuracy)."""
    from hite_tpu.config import AlignConfig, PipelineConfig
    from hite_tpu.pipeline.coarse import CoarseParams
    from hite_tpu.pipeline.run import run_pipeline
    from hite_tpu.utils.log import (
        COMPILE_STATS, STAGE_COMPILE, STAGE_HOOKS, STAGE_TIMES,
    )

    STAGE_TIMES.clear()
    STAGE_COMPILE.clear()
    genome, truth = build_bench_genome(genome_bp, hard=hard)
    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=262_144, pair_batch=64, stride=4,
                          max_hits=4)

    def _coarse_hook(name: str, dt: float) -> None:
        # incremental record the moment coarse completes: even a cold
        # compile cache yields one parsed line within minutes (round-1's
        # BENCH_r01 proved a coarse record parses)
        if name == "pipeline.coarse":
            v = genome_bp / 1e6 / max(dt, 1e-9)
            print(json.dumps({
                "metric": "coarse_discovery_throughput",
                "value": round(v, 3), "unit": "Mbp/s",
                "vs_baseline": round(v / BASELINE_COARSE_MBP_S, 2),
                "phase": f"{phase}-coarse", "wall_s": round(dt, 1),
                "genome_mbp": genome_bp / 1e6,
            }), flush=True)

    if emit_coarse:
        STAGE_HOOKS.append(_coarse_hook)
    c_secs0, c_cnt0 = COMPILE_STATS["secs"], COMPILE_STATS["count"]
    try:
        t0 = time.perf_counter()
        result = run_pipeline(genome, cfg,
                              out_dir=f"/tmp/hite_bench_out_{phase}",
                              coarse_params=params)
        dt = time.perf_counter() - t0
    finally:
        if emit_coarse:
            STAGE_HOOKS.remove(_coarse_hook)
    mbp_s = genome_bp / 1e6 / dt
    stages = {k: round(v, 2) for k, v in sorted(
        STAGE_TIMES.items(), key=lambda kv: -kv[1]) if v >= 1.0}
    rec = {
        "metric": "end_to_end_pipeline_throughput",
        "value": round(mbp_s, 4),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / BASELINE_E2E_MBP_S, 2),
        "phase": phase,
        "wall_s": round(dt, 1),
        "genome_mbp": genome_bp / 1e6,
        "planted_copies": len(truth["intervals"]),
        "planted_families": len(truth["families"]),
        "library_entries": len(result.libs.get("merged", {})),
        "annotation_hits": result.metrics.get("annotation_hits"),
        "compile_programs": int(COMPILE_STATS["count"] - c_cnt0),
        "compile_s": round(COMPILE_STATS["secs"] - c_secs0, 1),
        "stages": stages,
    }
    t_acc = time.perf_counter()
    rec["accuracy"] = accuracy_metrics(genome, result, truth, cfg)
    rec["accuracy_eval_s"] = round(time.perf_counter() - t_acc, 1)
    compile_stages = {k: round(v, 1) for k, v in sorted(
        STAGE_COMPILE.items(), key=lambda kv: -kv[1])[:8] if v >= 5.0}
    if compile_stages:
        rec["compile_stages"] = compile_stages
    return rec


def main() -> None:
    import jax

    from hite_tpu.utils.log import install_compile_listener

    install_compile_listener()

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

    # phase 1 — SAFETY NET: a small full-pipeline run first, with an
    # incremental coarse record printed mid-phase, so a driver timeout at
    # ANY later point still leaves parsed end-to-end output.
    rec = _run_phase(2_000_000, "safety-2mbp", emit_coarse=True)
    print(json.dumps(rec), flush=True)

    # phase 2 — HEADLINE: 8 Mbp clean substrate.
    headline = _run_phase(GENOME_BP, "headline-8mbp")
    headline["vs_round1_e2e"] = round(1960.0 / headline["wall_s"], 2)
    print(json.dumps(headline), flush=True)

    # phase 3 — HARD substrate: nested/truncated/solo-LTR/tandem cases
    # (VERDICT r3 #5); its accuracy rides along in the final record.
    try:
        hard = _run_phase(GENOME_BP, "hard-8mbp", hard=True)
        print(json.dumps(hard), flush=True)
        headline["hard_accuracy"] = hard["accuracy"]
        headline["hard_wall_s"] = hard["wall_s"]
    except Exception as exc:
        headline["hard_error"] = repr(exc)

    # the headline record is re-printed LAST so the driver's final parsed
    # JSON line is the 8 Mbp clean end-to-end number.
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
