"""Library clustering, nested removal, benchmark metrics, genome clean."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.benchmark import evaluate_library, family_level_metrics
from hite_tpu.pipeline.clean import clean_genome
from hite_tpu.pipeline.libcluster import cluster_seqs, remove_nested


def _rand(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))


def test_cluster_seqs_groups_variants(cfg):
    rng = np.random.default_rng(0)
    fam_a = _rand(rng, 800)
    fam_b = _rand(rng, 600)

    def mutate(s, rate=0.05):
        c = s.copy()
        m = rng.random(len(c)) < rate
        c[m] = rng.integers(0, 4, m.sum())
        return c

    seqs = [fam_a, mutate(fam_a), mutate(fam_a), fam_b, mutate(fam_b)]
    labels, reps = cluster_seqs(seqs, cfg.align)
    assert len(reps) == 2
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_subcluster_members_splits_families():
    from hite_tpu.pipeline.libcluster import subcluster_members

    rng = np.random.default_rng(7)
    fam_a = _rand(rng, 600)
    fam_b = _rand(rng, 600)

    def mutate(s, rate=0.03):
        c = s.copy()
        m = rng.random(len(c)) < rate
        c[m] = rng.integers(0, 4, m.sum())
        return c

    members = [fam_a, mutate(fam_a), mutate(fam_a),
               fam_b, mutate(fam_b), mutate(fam_b)]
    groups = subcluster_members(members)
    assert len(groups) == 2
    sets = sorted(sorted(g) for g in groups)
    assert sets == [[0, 1, 2], [3, 4, 5]]
    # a single family stays one group
    assert len(subcluster_members(members[:3])) == 1


def test_cluster_consensi_recovers_consensus():
    """Sub-cluster consensus corrects member mutations back to the family."""
    from hite_tpu.pipeline.libcluster import cluster_consensi

    rng = np.random.default_rng(8)
    fam = _rand(rng, 500)

    def mutate(s, rate=0.04):
        c = s.copy()
        m = rng.random(len(c)) < rate
        c[m] = (c[m] + rng.integers(1, 4, m.sum())) % 4
        return c

    seqs = [fam, mutate(fam), mutate(fam), mutate(fam), mutate(fam)]
    labels = np.zeros(5, np.int64)
    cons = cluster_consensi(seqs, labels, [0])
    assert len(cons[0]) == 1
    c = cons[0][0]
    n = min(len(c), len(fam))
    ident = (c[:n] == fam[:n]).mean()
    assert ident > 0.97, ident


def test_remove_nested(cfg):
    rng = np.random.default_rng(1)
    inner = _rand(rng, 400)
    host = np.concatenate([_rand(rng, 600), inner, _rand(rng, 600)])
    out = remove_nested([host, inner], cfg.align)
    assert len(out[0]) <= len(host) - 350   # insertion excised
    assert len(out[1]) == 400               # inner untouched


def test_family_level_metrics(cfg):
    rng = np.random.default_rng(2)
    gold = {f"g{i}#DNA": _rand(rng, 700) for i in range(3)}
    test = {
        "t0#DNA": gold["g0#DNA"].copy(),                  # perfect
        "t1#DNA": gold["g1#DNA"][:560],                   # present (80%)
    }
    m = family_level_metrics(test, gold, cfg)
    assert m["total"] == 3
    assert m["perfect"] >= 1
    assert m["perfect"] + m["good"] + m["present"] >= 2
    assert m["missing"] >= 1


def test_evaluate_library_f1(cfg):
    rng = np.random.default_rng(3)
    te = _rand(rng, 500)
    bg = _rand(rng, 40_000)
    for pos in (5_000, 15_000, 25_000, 35_000):
        bg[pos : pos + 500] = te
    genome = Genome.from_dict({"chr1": bg})
    gold = {"fam0#DNA": te}
    m_same = evaluate_library(genome, gold, gold, cfg)
    assert m_same["F1"] > 0.95
    # multi-threshold output (reference 0.8/0.95/0.99 recipe)
    assert set(m_same["at_coverage"]) == {"0.8", "0.95", "0.99"}
    assert m_same["at_coverage"]["0.99"]["F1"] > 0.95
    m_none = evaluate_library(genome, {"x#DNA": _rand(rng, 500)}, gold, cfg)
    assert m_none["F1"] < 0.3
    assert m_none["at_coverage"]["0.8"]["F1"] < 0.3


def test_clean_genome_drops_redundant(cfg):
    rng = np.random.default_rng(4)
    big = _rand(rng, 30_000)
    dup = big[2_000 : 12_000].copy()     # fully contained in big
    other = _rand(rng, 20_000)
    genome, name_map = clean_genome(
        {"c1": big, "c2": dup, "c3": other}, cfg)
    assert "c2" not in name_map
    assert len(genome.names) == 2
    assert genome.names == ["Chr1", "Chr2"]


def test_classify_by_homology():
    from hite_tpu.io.fasta import encode_seq
    from hite_tpu.pipeline.library import classify_by_homology

    rng = np.random.default_rng(9)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, 900))
    other = "".join("ACGT"[c] for c in rng.integers(0, 4, 700))
    merged = {
        "fam_0#Unknown": encode_seq(te),
        "fam_1#DNA/hAT": encode_seq(other),   # already labelled: untouched
    }
    curated = {"gold#LTR/Gypsy": encode_seq(te)}
    cfg = PipelineConfig()
    out = classify_by_homology(merged, curated, cfg)
    assert "fam_0#LTR/Gypsy" in out
    assert "fam_1#DNA/hAT" in out
    # no curated homolog -> label survives as Unknown
    merged2 = {"fam_0#Unknown": encode_seq(other[:600])}
    out2 = classify_by_homology(merged2, curated, cfg)
    assert "fam_0#Unknown" in out2


def test_evaluate_edta_confusion_matrix(cfg):
    from hite_tpu.pipeline.benchmark import evaluate_edta

    rng = np.random.default_rng(4)
    te = _rand(rng, 500)
    bg = _rand(rng, 40_000)
    for pos in (5_000, 15_000, 25_000, 35_000):
        bg[pos : pos + 500] = te
    genome = Genome.from_dict({"chr1": bg})
    gold = {"fam0#DNA": te}

    m_same = evaluate_edta(genome, gold, gold, cfg)
    assert m_same["F1"] > 0.95
    assert m_same["specificity"] > 0.95
    assert m_same["FDR"] < 0.05
    # TP+FN+FP+TN partitions the genome
    assert m_same["TP"] + m_same["FN"] + m_same["FP"] + m_same["TN"] \
        == genome.size

    # an unrelated test lib: zero TP, specificity stays high
    m_bad = evaluate_edta(genome, {"x#DNA": _rand(rng, 500)}, gold, cfg)
    assert m_bad["TP"] == 0 and m_bad["sensitivity"] == 0.0
    assert m_bad["specificity"] > 0.9


def test_family_level_metrics_divergence_gates(cfg):
    """RM2 protocol divergence gates: a ~10%-diverged full-length match is
    `present` (div<20%) but never `perfect`/`good` (div<5%)."""
    rng = np.random.default_rng(21)
    fam = _rand(rng, 800)
    noisy = fam.copy()
    muts = rng.random(len(noisy)) < 0.10
    noisy[muts] = (noisy[muts] + rng.integers(1, 4, muts.sum())) % 4
    gold = {"g0#DNA": fam}
    m = family_level_metrics({"t0#DNA": noisy}, gold, cfg)
    assert m["perfect"] == 0 and m["good"] == 0
    assert m["present"] == 1, m

    m2 = family_level_metrics({"t0#DNA": fam.copy()}, gold, cfg)
    assert m2["perfect"] == 1
