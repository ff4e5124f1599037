"""Pan-genome mode test: 3 genomes, core/dispensable/private partitioning."""

import os

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.coarse import CoarseParams
from hite_tpu.pipeline.pan import run_pan_pipeline


def _tir_te(rng, core_len=460, tir_len=20):
    tir = rng.integers(0, 4, tir_len).astype(np.uint8)
    while tir[0] == 3 and tir[1] == 2:
        tir = rng.integers(0, 4, tir_len).astype(np.uint8)
    return np.concatenate([tir, rng.integers(0, 4, core_len).astype(np.uint8),
                           (3 - tir)[::-1]])


def _plant(rng, bg, te, starts, tsd=5):
    for pos in starts:
        copy = te.copy()
        muts = rng.random(len(copy)) < 0.01
        copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
        t = rng.integers(0, 4, tsd).astype(np.uint8)
        bg[pos - tsd : pos] = t
        bg[pos + len(copy) : pos + len(copy) + tsd] = t
        bg[pos : pos + len(copy)] = copy


@pytest.mark.slow
def test_pan_pipeline(tmp_path):
    rng = np.random.default_rng(55)
    core_te = _tir_te(rng)          # planted in all 3 genomes
    disp_te = _tir_te(rng)          # planted in 2 genomes
    priv_te = _tir_te(rng)          # planted in 1 genome

    genomes = {}
    for gi in range(3):
        bg = rng.integers(0, 4, 64_000).astype(np.uint8)
        _plant(rng, bg, core_te, [8_000, 25_000, 41_000, 52_000, 57_000])
        if gi < 2:
            _plant(rng, bg, disp_te, [15_000, 33_000, 46_500, 60_500, 62_200])
        if gi == 0:
            _plant(rng, bg, priv_te, [11_500, 29_000, 44_000, 49_500, 55_000])
        genomes[f"g{gi}"] = Genome.from_dict({"chr1": bg})

    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    out = str(tmp_path / "pan")
    res = run_pan_pipeline(genomes, cfg, out_dir=out,
                           coarse_params=CoarseParams(seg_len=16_384,
                                                      pair_batch=16))
    assert len(res.pan_lib) >= 2
    assert os.path.exists(os.path.join(out, "panTE.fa"))
    assert os.path.exists(os.path.join(out, "pan_PAV.tsv"))

    # the core family must be seen in all three genomes
    assert max(res.occupancy.values()) == 3, res.occupancy
    assert "core" in set(res.classification.values()), res.classification
    # occupancy sanity: every family present in at least one genome
    assert all(v >= 1 for v in res.occupancy.values())
    # PAV matrix matches occupancy
    assert res.pav.shape == (len(res.pan_lib), 3)


def test_pan_benchmark(tmp_path):
    """panTE_benchmarking.nf equivalent: per-genome BM_HiTE of one lib."""
    import json as _json

    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.pan import pan_benchmark

    rng = np.random.default_rng(5)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, 600))
    gs = {}
    for i in range(2):
        g, _ = synthetic_genome(30_000, [te], [5], seed=10 + i,
                                mutation_rate=0.01)
        gs[f"g{i}.fa"] = g
    from hite_tpu.io.fasta import encode_seq
    lib = {"fam_0#Unknown": encode_seq(te)}
    cfg = PipelineConfig()
    metrics = pan_benchmark(gs, lib, lib, cfg, out_dir=str(tmp_path))
    assert set(metrics) == set(gs)
    for m in metrics.values():
        assert m["F1"] > 0.9, m          # lib vs itself: near-perfect
        assert m["BM_EDTA"]["F1"] > 0.9 and m["BM_EDTA"]["FDR"] < 0.1
    saved = _json.load(open(tmp_path / "pan_benchmark.json"))
    assert set(saved) == set(gs)


def test_preprocess_genome_list(tmp_path):
    from hite_tpu.pipeline.pan import preprocess_genome_list

    gdir = tmp_path / "genomes"; gdir.mkdir()
    (gdir / "a.fa").write_text(">chr1\nACGT\n")
    (gdir / "b.fa").write_text(">chr1\nACGT\n")
    gff = tmp_path / "a.gff"; gff.write_text("chr1\tx\tgene\t1\t4\t.\t+\t.\tID=g1\n")
    rna = tmp_path / "r1.fq"; rna.write_text("@r\nACGT\n+\nIIII\n")
    lst = tmp_path / "list.txt"
    lst.write_text(f"a.fa\t{gff}\t0\t{rna}\nb.fa\n")
    metas = preprocess_genome_list(str(lst), str(gdir), out_dir=str(tmp_path))
    assert len(metas) == 2
    assert metas[0]["gene_gff"] == str(gff)
    assert metas[0]["RNA"] == [str(rna)] and metas[0]["is_PE"] is False
    assert "RNA" not in metas[1]
    import json as _json
    saved = _json.load(open(tmp_path / "genome_metadata.json"))
    assert saved[1]["genome_name"] == "b.fa"


def test_ltr_insert_time_outputs(tmp_path):
    from hite_tpu.pipeline.ltr import LTRRecord, LTRResult
    from hite_tpu.pipeline.pan import ltr_insert_time_outputs
    from hite_tpu.pipeline.run import RunResult

    def rec(t, sf):
        return LTRRecord(0, 100, 0, 20, 80, 100, 0.98, t, superfamily=sf)

    per = {
        "g1": RunResult(libs={}, ltr=LTRResult(records=[
            rec(1.2e6, "LTR/Copia"), rec(3e6, "LTR/Gypsy"),
            rec(9e6, "LTR/Pao")])),
        "g2": RunResult(libs={}, ltr=LTRResult(records=[
            rec(2e6, "LTR/Copia")])),
    }
    csv_path = ltr_insert_time_outputs(per, str(tmp_path))
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "Genome,Insertion_Time,Classification"
    assert len(lines) == 4  # Pao excluded
    assert (tmp_path / "ltr_insert_time.pdf").exists()


def test_pan_downstream_analysis(tmp_path):
    """panHiTE stages 4-7: annotation + gene<->TE + RNA-seq + DE wiring."""
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.io.fasta import decode_seq, encode_seq
    from hite_tpu.pipeline.pan import PanResult, pan_downstream_analysis

    rng = np.random.default_rng(12)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, 500))
    gs, metas = {}, []
    for i in range(2):
        g, inserts = synthetic_genome(40_000, [te], [3], seed=20 + i,
                                      mutation_rate=0.0)
        name = f"g{i}.fa"
        gs[name] = g
        # gene next to the first TE insertion
        s0 = inserts[0][0]
        gene_s, gene_e = max(1, s0 - 3000), max(100, s0 - 1000)
        gff = tmp_path / f"{name}.gff"
        gff.write_text(f"chr1\tsrc\tgene\t{gene_s}\t{gene_e}\t.\t+\t.\t"
                       f'gene_id "geneA"\n')
        meta = {"genome_name": name, "gene_gff": str(gff)}
        # RNA reads from the gene body for genome 0 only
        if i == 0:
            seq = decode_seq(g.flat[gene_s - 1 + 50 : gene_s - 1 + 150])
            fq = tmp_path / "r.fq"
            with open(fq, "w") as fh:
                for r in range(6):
                    fh.write(f"@r{r}\n{seq}\n+\n{'I' * len(seq)}\n")
            meta["RNA"] = [str(fq)]
            meta["is_PE"] = False
        metas.append(meta)

    pan = PanResult(pan_lib={"fam_0#Unknown": encode_seq(te)}, per_genome={})
    cfg = PipelineConfig()
    out = str(tmp_path / "out")
    summary = pan_downstream_analysis(gs, pan, metas, cfg, out)
    assert summary["annotated"] == 2
    assert summary["associations"] >= 1
    assert summary["samples"] == 1
    assert os.path.exists(os.path.join(out, "gene_te_associations.tsv"))
    assert os.path.exists(os.path.join(out, "gene_express.table"))
    assert os.path.exists(os.path.join(out, "g0.fa.gff"))
    # the gene reads must land on geneA
    tbl = open(os.path.join(out, "gene_express.table")).read()
    assert "geneA" in tbl


def test_sweep_genome_copies_early_drop():
    """A candidate that reaches the copy cap after the first genome is
    excluded from the joins against later genomes
    (pan_recover_low_copy_TEs.py:326)."""
    from hite_tpu.pipeline.copies import CopyHit
    from hite_tpu.pipeline.pan import sweep_genome_copies

    cands = [np.zeros(100, np.uint8), np.ones(100, np.uint8)]
    calls = []

    def find(gname, seqs):
        calls.append((gname, len(seqs)))
        out = []
        for s in seqs:
            if s[0] == 0:  # candidate 0: saturates in genome A
                out.append([CopyHit(10 * i, 10 * i + 9, 0, 5)
                            for i in range(4)])
            else:          # candidate 1: accumulates slowly
                out.append([CopyHit(0, 9, 0, 5)])
        return out

    hits = sweep_genome_copies(["gA", "gB", "gC"], find, cands, max_copies=3)
    # candidate 0 was mapped only against gA; candidate 1 against all three
    assert calls == [("gA", 2), ("gB", 1), ("gC", 1)]
    assert len(hits["gA"][0]) == 4 and len(hits["gB"][0]) == 0
    assert all(len(hits[g][1]) == 1 for g in ("gA", "gB", "gC"))
