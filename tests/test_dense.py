"""Dense-genome recovery: same-family neighbors inside MSA frame flanks.

ROADMAP's measured failure mode: at >=15% TE density, a copy's
+-frame_flank context contains a same-family neighbor, flank columns
stay homologous across the family MSA, and the boundary judges reject
whole families (Helitron/SINE modules at the 600 kb compression test).
The fix is copy-subset selection by flank family-content
(`boundary_adjust._subset_copies_by_flank`) — the signal the
reference's `ready_for_MSA.sh` 100-longest subsample gets for free on
real genomes (`Util.py:10407-10412`).
"""

import numpy as np
import pytest

from hite_tpu.config import AlignConfig, PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import encode_seq
from hite_tpu.pipeline.coarse import CoarseParams
from hite_tpu.pipeline.run import run_pipeline


def _kset(v, k=16):
    v = np.asarray(v, np.int64)
    if len(v) < k:
        return np.zeros(0, np.int64)
    m = len(v) - k + 1
    ok = np.ones(m, bool)
    code = np.zeros(m, np.int64)
    for j in range(k):
        w = v[j:m + j]
        ok &= w < 4
        code = code * 4 + np.where(w < 4, w, 0)
    return np.unique(code[ok])


def _build_dense_genome(length=600_000, seed=11):
    """>=15% TE density; most copies in clusters with 40-80 bp gaps so
    neighbors sit INSIDE the 100 bp frame flank."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 4, length).astype(np.uint8)
    families = {}
    t = rng.integers(0, 4, 20).astype(np.uint8)
    while t[0] == 3 and t[1] == 2:
        t = rng.integers(0, 4, 20).astype(np.uint8)
    families["TIR_d"] = ("TIR", 5, np.concatenate(
        [t, rng.integers(0, 4, 1200).astype(np.uint8), (3 - t)[::-1]]))
    families["SINE_d"] = ("SINE", 12, np.concatenate(
        [rng.integers(0, 4, 290).astype(np.uint8), np.zeros(14, np.uint8)]))
    families["HEL_d"] = ("Helitron", 0, np.concatenate(
        [encode_seq("TCTCTACTA"),
         rng.integers(0, 4, 1000).astype(np.uint8),
         encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")]))

    placed = []
    pos = 2_000
    # clusters of 2-3 copies with 40-80 bp gaps, plus isolated copies
    plan = (["TIR_d"] * 32 + ["SINE_d"] * 80 + ["HEL_d"] * 32)
    rng.shuffle(plan)
    i = 0
    while i < len(plan) and pos < length - 3_000:
        cluster = int(rng.integers(1, 4))
        for _ in range(cluster):
            if i >= len(plan):
                break
            name = plan[i]
            klass, tsd, te = families[name]
            copy = te.copy()
            muts = rng.random(len(copy)) < 0.02
            copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
            if pos + len(copy) + 200 >= length:
                break
            if tsd:
                td = rng.integers(0, 4, tsd).astype(np.uint8)
                bg[pos - tsd:pos] = td
                bg[pos + len(copy):pos + len(copy) + tsd] = td
            if klass == "Helitron":
                bg[pos - 1] = 0
                bg[pos + len(copy)] = 3
            bg[pos:pos + len(copy)] = copy
            placed.append((pos, pos + len(copy), klass))
            pos += len(copy) + int(rng.integers(40, 80))
            i += 1
        pos += int(rng.integers(400, 1_500))
    te_bp = sum(e - s for s, e, _k in placed)
    assert te_bp / length >= 0.15, f"density {te_bp/length:.3f}"
    truth = {"intervals": np.array([(s, e) for s, e, _ in placed],
                                   np.int64),
             "classes": [k for _s, _e, k in placed],
             "families": {n: te for n, (_k, _t, te) in families.items()}}
    return Genome.from_dict({"chr1": bg}), truth


@pytest.mark.slow
def test_dense_genome_recovers_families(tmp_path):
    genome, truth = _build_dense_genome()
    cfg = PipelineConfig(annotate=True,
                         align=AlignConfig(fixed_extend_base_threshold=2000))
    params = CoarseParams(seg_len=65_536, pair_batch=32, stride=4,
                          max_hits=4)
    result = run_pipeline(genome, cfg, out_dir=str(tmp_path / "o"),
                          coarse_params=params)
    merged = result.libs.get("merged", {})
    assert merged, "dense genome produced an empty library"

    # each planted family's consensus must be >=70% k-mer-covered by
    # some library entry (the dense failure mode lost WHOLE families)
    for name, te in truth["families"].items():
        fam_k = _kset(te)
        best = max((float(np.isin(fam_k, _kset(s)).mean())
                    for s in merged.values()), default=0.0)
        assert best >= 0.7, f"family {name} not represented (best {best:.2f})"

    # base-level: annotation covers >=70% of planted bases
    from hite_tpu.utils import intervals as iv

    name_to_start = {n: int(s) for n, s in zip(genome.names, genome.starts)}
    test_iv = iv.merge(np.array(
        [(name_to_start[h.contig] + h.start - 1,
          name_to_start[h.contig] + h.end) for h in result.annotation],
        np.int64).reshape(-1, 2))
    gold = iv.merge(truth["intervals"])
    cov = iv.coverage_fraction(gold, test_iv) if len(test_iv) else \
        np.zeros(len(gold))
    sens = float(np.sum(cov * (gold[:, 1] - gold[:, 0]))
                 / iv.total_length(gold))
    assert sens >= 0.7, f"dense-genome sensitivity {sens:.3f}"
