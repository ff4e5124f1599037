"""Pan-genome workflow run: 3 related 8 Mbp genomes on the real chip.

VERDICT r3 #8: the pan subsystem (per-genome runs -> pan library ->
cross-genome low-copy rescue -> occupancy/PAV classification) is tested
but had never produced a recorded multi-genome artifact.  This script
builds three genomes that SHARE a family set with presence/absence
variation plus one family that is LOW-COPY in genome g1 (2 copies) but
well-supported in g2/g3 — so the cross-genome rescue actually fires —
runs `run_pan_pipeline`, and prints one summary JSON (committed as
PAN_RUN.json).  Reference analog: `panHiTE.nf:94-216`.

Run alone (the axon tunnel serializes TPU clients):
    python scripts/pan_run.py [--mbp 8]
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

faulthandler.enable()                      # silent-death diagnosis
faulthandler.register(signal.SIGUSR1)      # kill -USR1 <pid> dumps stacks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pan_genomes(length: int):
    """Three genomes sharing one family set with PAV structure.

    Returns (genomes dict, truths dict, expectations dict)."""
    from hite_tpu.genome import Genome
    from hite_tpu.io.fasta import encode_seq

    rng = np.random.default_rng(17)

    # shared family set (consensi drawn once; genomes differ in counts)
    fams = {}
    for f in range(3):
        t = rng.integers(0, 4, 20).astype(np.uint8)
        while t[0] == 3 and t[1] == 2:
            t = rng.integers(0, 4, 20).astype(np.uint8)
        interior = (460, 900, 1400)[f]
        fams[f"TIR_{f}"] = ("TIR", np.concatenate(
            [t, rng.integers(0, 4, interior).astype(np.uint8),
             (3 - t)[::-1]]))
    fams["HEL_0"] = ("Helitron", np.concatenate(
        [encode_seq("TCTCTACTA"),
         rng.integers(0, 4, 900).astype(np.uint8),
         encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")]))
    for f in range(2):
        fams[f"SINE_{f}"] = ("SINE", np.concatenate(
            [rng.integers(0, 4, (280, 420)[f]).astype(np.uint8),
             np.zeros(14, np.uint8)]))
    for f in range(2):
        t = rng.integers(0, 4, (250, 400)[f]).astype(np.uint8)
        t[0], t[1], t[-2], t[-1] = 3, 2, 1, 0
        fams[f"LTR_{f}"] = ("LTR", np.concatenate(
            [t, rng.integers(0, 4, 2200).astype(np.uint8), t]))
    # the rescue family: low-copy in g1, well-supported in g2/g3.
    # SINE-like ON PURPOSE: a low-copy TIR candidate is structurally
    # rescued IN-GENOME (it carries TIR termini), so the cross-genome
    # path never fires for it; a SINE's only in-genome rescue channel is
    # the protein scan against the upstream-missing LINEPeps.lib, so it
    # reaches the pan rescue with its low-copy status intact
    # (pan_recover_low_copy_TEs.py's central case).
    fams["SINE_rescue"] = ("SINE", np.concatenate(
        [rng.integers(0, 4, 360).astype(np.uint8),
         np.zeros(14, np.uint8)]))

    base = {"TIR_0": 20, "TIR_1": 15, "TIR_2": 10, "HEL_0": 8,
            "SINE_0": 20, "SINE_1": 20, "LTR_0": 4, "LTR_1": 4}
    counts = {
        "g1": dict(base, SINE_rescue=2),                # rescue source
        "g2": dict(base, SINE_rescue=6, SINE_1=0),      # SINE_1 absent
        "g3": dict(base, SINE_rescue=6, LTR_1=0),       # LTR_1 absent
    }

    genomes, truths = {}, {}
    for gi, (gname, cnt) in enumerate(counts.items()):
        grng = np.random.default_rng(100 + gi)
        bg = grng.integers(0, 4, length).astype(np.uint8)
        bins: dict = {}
        placed = []

        def overlaps(pos, end):
            for b in range(pos // 65536 - 1, end // 65536 + 2):
                for s, e in bins.get(b, ()):
                    if pos < e + 200 and end + 200 > s:
                        return True
            return False

        for fname, n in cnt.items():
            klass, te = fams[fname]
            tsd = {"TIR": 5, "SINE": 12, "LTR": 5}.get(klass, 0)
            host_at = klass == "Helitron"
            mut = 0.01 if klass == "LTR" else 0.02
            done = 0
            while done < n:
                pos = int(grng.integers(1000, length - len(te) - 1000))
                if overlaps(pos, pos + len(te)):
                    continue
                copy = te.copy()
                muts = grng.random(len(copy)) < mut
                copy[muts] = (copy[muts]
                              + grng.integers(1, 4, muts.sum())) % 4
                if tsd:
                    td = grng.integers(0, 4, tsd).astype(np.uint8)
                    bg[pos - tsd: pos] = td
                    bg[pos + len(copy): pos + len(copy) + tsd] = td
                if host_at:
                    bg[pos - 1] = 0
                    bg[pos + len(copy)] = 3
                bg[pos: pos + len(copy)] = copy
                placed.append((pos, pos + len(copy), klass))
                for b in range(pos // 65536,
                               (pos + len(copy)) // 65536 + 1):
                    bins.setdefault(b, []).append((pos, pos + len(copy)))
                done += 1
        genomes[gname] = Genome.from_dict({"chr1": bg})
        truths[gname] = {
            "intervals": np.array([(s, e) for s, e, _k in placed],
                                  np.int64).reshape(-1, 2),
            "classes": [k for _s, _e, k in placed],
            "families": {n: s for n, (_k, s) in fams.items()
                         if cnt.get(n, 0) > 0},
        }
    expect = {"absent": {"g2": "SINE_1", "g3": "LTR_1"},
              "rescue_family": "SINE_rescue"}
    return genomes, truths, expect


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=8)
    ap.add_argument("--out", default="/tmp/hite_pan_out")
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args()

    t_build = time.perf_counter()
    genomes, truths, expect = build_pan_genomes(args.mbp * 1_000_000)
    print(f"built 3x{args.mbp} Mbp pan genomes "
          f"({time.perf_counter() - t_build:.1f}s)", flush=True)
    if args.build_only:
        return

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import accuracy_metrics
    from hite_tpu.config import AlignConfig, PipelineConfig
    from hite_tpu.pipeline.coarse import CoarseParams
    from hite_tpu.pipeline.pan import run_pan_pipeline
    from hite_tpu.utils.log import (
        COMPILE_STATS, STAGE_HOOKS, STAGE_TIMES, install_compile_listener,
    )

    install_compile_listener()
    t_start = time.perf_counter()

    def _progress(name: str, dt: float) -> None:
        print(json.dumps({
            "progress": name, "stage_s": round(dt, 1),
            "elapsed_s": round(time.perf_counter() - t_start, 1),
        }), flush=True)

    STAGE_HOOKS.append(_progress)

    # absorb the fresh-client first-RPC stall outside the timed window
    import jax.numpy as jnp

    from hite_tpu.ops.tandem import long_tandem_mask, tandem_mask

    warm = jnp.asarray(np.zeros((16, 262_144), np.uint8))
    np.asarray(jax.jit(lambda d: tandem_mask(d) | long_tandem_mask(d))(warm))

    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=262_144, pair_batch=64, stride=4,
                          max_hits=4)

    t0 = time.perf_counter()
    result = run_pan_pipeline(genomes, cfg, out_dir=args.out,
                              coarse_params=params)
    dt = time.perf_counter() - t0

    per_genome_acc = {}
    for gname, res in result.per_genome.items():
        try:
            a = accuracy_metrics(genomes[gname], res, truths[gname], cfg)
            a.pop("BM_RM2", None)
            per_genome_acc[gname] = a
        except Exception as exc:
            per_genome_acc[gname] = {"error": repr(exc)}

    cls_counts: dict = {}
    for f, c in result.classification.items():
        cls_counts[c] = cls_counts.get(c, 0) + 1
    stages = {k: round(v, 2) for k, v in sorted(
        STAGE_TIMES.items(), key=lambda kv: -kv[1]) if v >= 5.0}
    print(json.dumps({
        "metric": "pan_run",
        "genomes": {n: g.size for n, g in genomes.items()},
        "wall_s": round(dt, 1),
        "pan_library_entries": len(result.pan_lib),
        "rescued_low_copy_families": result.rescued,
        "classification_counts": cls_counts,
        "per_genome_accuracy": per_genome_acc,
        "expectations": expect,
        "compile_s": round(COMPILE_STATS["secs"], 1),
        "stages": dict(list(stages.items())[:20]),
    }), flush=True)


if __name__ == "__main__":
    main()
