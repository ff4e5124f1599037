"""RNA-seq stage tests: trimming, mapping/counting, normalisation, DE."""

import math
import os

import numpy as np

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import decode_seq
from hite_tpu.pipeline import rnaseq as rs


def test_trim_read_sliding_window():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    qual = np.full(100, 35, np.int16)
    qual[60:] = 2  # quality crash at position 60
    out = rs.trim_read(codes, qual)
    assert out is not None
    # leading/trailing clip quals<3 then the window cut lands near 60
    assert 55 <= len(out) <= 61
    # everything low-quality -> dropped by MINLEN
    assert rs.trim_read(codes, np.full(100, 2, np.int16)) is None


def test_fastq_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    seqs = [rng.integers(0, 4, 80).astype(np.uint8) for _ in range(5)]
    path = str(tmp_path / "r.fastq")
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@read{i}\n{decode_seq(s)}\n+\n{'I' * len(s)}\n")
    got, quals = rs.read_fastq(path)
    assert len(got) == 5
    assert all((a == b).all() for a, b in zip(got, seqs))
    assert all((q == 40).all() for q in quals)


def _mk_genome_and_reads(rng, n_gene_reads=40, n_te_reads=20, read_len=80):
    bg = rng.integers(0, 4, 40_000).astype(np.uint8)
    genome = Genome.from_dict({"chr1": bg})
    # gene at [5000, 7000), TE at [20000, 21000) (flat == contig-local here)
    reads = []
    for _ in range(n_gene_reads):
        p = rng.integers(5000, 7000 - read_len)
        reads.append(bg[p:p + read_len].copy())
    for _ in range(n_te_reads):
        p = rng.integers(20_000, 21_000 - read_len)
        reads.append(bg[p:p + read_len].copy())
    genes = [rs.Feature("geneA", "chr1", 5001, 7000, "+")]
    tes = [rs.Feature("TE_1", "chr1", 20_001, 21_000, "+")]
    return genome, reads, genes, tes


def test_map_count_normalise():
    rng = np.random.default_rng(2)
    genome, reads, genes, tes = _mk_genome_and_reads(rng)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    table = rs.quantify_sample(genome, reads, genes + tes, cfg)
    assert table["geneA"]["counts"] >= 35      # most gene reads counted
    assert table["TE_1"]["counts"] >= 15
    # edgeR normalisation identities
    total = sum(v["counts"] for v in table.values())
    for v in table.values():
        assert math.isclose(v["cpm"], 1e6 * v["counts"] / total, rel_tol=1e-9)
    assert math.isclose(sum(v["tpm"] for v in table.values()), 1e6,
                        rel_tol=1e-6)


def test_feature_counts_ambiguous_dropped():
    feats = [rs.Feature("a", "c", 100, 200), rs.Feature("b", "c", 150, 250)]
    maps = [rs.ReadMapping("c", 160, 180),   # overlaps both -> dropped
            rs.ReadMapping("c", 100, 120),   # only a
            rs.ReadMapping("c", 230, 240),   # only b
            None]
    counts = rs.feature_counts(maps, feats)
    assert counts == {"a": 1, "b": 1}


def test_te_position_semantics():
    # gene [1000, 2000) strand +
    assert rs.te_position(1200, 1400, 1000, 2000, "+") == "Inside"
    assert rs.te_position(500, 900, 1000, 2000, "+") == "Upstream"
    assert rs.te_position(500, 900, 1000, 2000, "-") == "Downstream"
    assert rs.te_position(2100, 2300, 1000, 2000, "+") == "Downstream"
    assert rs.te_position(2100, 2300, 1000, 2000, "-") == "Upstream"
    assert rs.te_position(50_000, 50_100, 1000, 2000, "+") == "None"


def test_bh_fdr_matches_r():
    # R: p.adjust(c(.01,.02,.03,.04,.05), 'fdr') = .05 .05 .05 .05 .05
    p = np.array([0.01, 0.02, 0.03, 0.04, 0.05])
    assert np.allclose(rs.bh_fdr(p), 0.05)
    p = np.array([0.001, 0.5, np.nan])
    adj = rs.bh_fdr(p)
    assert math.isclose(adj[0], 0.002)
    assert math.isclose(adj[1], 0.5)
    assert math.isnan(adj[2])


def test_detect_de_genes_and_outputs(tmp_path):
    rng = np.random.default_rng(3)
    # 12 genomes: 6 with an Upstream TE insertion near geneX (high expr),
    # 6 without (low expr); geneY unaffected.
    expression = {"geneX": {}, "geneY": {}}
    associations = []
    for i in range(12):
        gname = f"g{i}"
        if i < 6:
            expression["geneX"][gname] = 100.0 + rng.normal(0, 2)
            associations.append(rs.GeneTEAssociation(
                "geneX", gname, "TE_1", "chr1", 900, 950, 1000, 2000,
                "Upstream"))
        else:
            expression["geneX"][gname] = 10.0 + rng.normal(0, 2)
        expression["geneY"][gname] = 50.0 + rng.normal(0, 2)

    results = rs.detect_de_genes(expression, associations)
    by_gene = {r.gene_name: r for r in results}
    assert by_gene["geneX"].significant
    assert by_gene["geneX"].direction == "up"
    assert by_gene["geneX"].insert_type == "Upstream"
    assert "geneY" not in by_gene  # no insertion group -> no test rows

    out = str(tmp_path / "de")
    rs.write_de_genes(out, results, plot=True)
    assert os.path.exists(os.path.join(out, "DE_genes_from_TEs.tsv"))
    assert os.path.exists(os.path.join(out, "all_gene_TEs_details.tsv"))
    with open(os.path.join(out, "DE_genes_from_TEs.tsv")) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 2 and lines[1].startswith("geneX\tUpstream")


def test_expression_table_roundtrip(tmp_path):
    per_sample = {
        "s1": {"geneA": {"counts": 10, "fpkm": 5.0, "tpm": 900.0, "cpm": 1.0}},
        "s2": {"geneA": {"counts": 2, "fpkm": 1.0, "tpm": 100.0, "cpm": 0.2},
               "geneB": {"counts": 7, "fpkm": 3.0, "tpm": 300.0, "cpm": 0.7}},
    }
    path = str(tmp_path / "gene_express.table")
    rs.merge_expression_tables(per_sample, path)
    expr = rs.expression_from_table(path)
    assert expr["geneA"] == {"s1": 900.0, "s2": 100.0}
    assert expr["geneB"] == {"s2": 300.0}  # NA cell skipped


def test_associations_and_gtf(tmp_path):
    genes = [rs.Feature("geneA", "chr1", 5001, 7000, "+")]
    tes = [rs.Feature("TE_1", "chr1", 4000, 4500, "+"),
           rs.Feature("TE_2", "chr1", 5500, 6000, "+"),
           rs.Feature("TE_3", "chr1", 30_000, 30_500, "+")]
    rows = rs.associate_genes_tes("g0", genes, tes)
    pos = {r.te_name: r.position for r in rows}
    assert pos == {"TE_1": "Upstream", "TE_2": "Inside"}
    path = str(tmp_path / "assoc.tsv")
    rs.write_associations(path, rows)
    assert open(path).readline().startswith("Gene_name\tGenome_name")

    # GTF reader
    gtf = str(tmp_path / "g.gtf")
    with open(gtf, "w") as fh:
        fh.write('chr1\thite\texon\t5001\t7000\t.\t+\t.\tgene_id "geneA";\n')
        fh.write('chr1\thite\tgene\t1\t10\t.\t+\t.\tgene_id "skipme";\n')
    feats = rs.read_gtf_features(gtf, feature_type="exon")
    assert len(feats) == 1 and feats[0].feature_id == "geneA"
    assert feats[0].start == 5001 and feats[0].end == 7000
