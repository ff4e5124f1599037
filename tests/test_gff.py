"""GFF / .out / .tbl writer format tests."""

import os

from hite_tpu.io.gff import (
    AnnotationHit, write_full_length_gff, write_gff, write_rm_out, write_tbl,
)


def _hits():
    return [
        AnnotationHit(contig="chr1", start=100, end=600, strand="+",
                      family="TIR_0", te_class="DNA/hAT", identity=0.97,
                      full_length=True),
        AnnotationHit(contig="chr1", start=900, end=1200, strand="-",
                      family="LTR_1", te_class="LTR/Gypsy", identity=0.88,
                      full_length=False),
    ]


def test_write_gff(tmp_path):
    p = str(tmp_path / "x.gff")
    write_gff(p, _hits())
    lines = open(p).read().splitlines()
    assert lines[0] == "##gff-version 3"
    cols = lines[1].split("\t")
    assert len(cols) == 9
    assert cols[0] == "chr1" and cols[3] == "100" and cols[4] == "600"
    assert "Classification=DNA/hAT" in cols[8]
    assert lines[2].split("\t")[6] == "-"


def test_write_rm_out(tmp_path):
    p = str(tmp_path / "x.out")
    write_rm_out(p, _hits())
    body = open(p).read().splitlines()
    assert "position in query" in body[0]
    data = [l for l in body if l.strip() and l.lstrip()[0].isdigit()]
    assert len(data) == 2
    assert "C" in data[1].split()  # minus strand marked C like RepeatMasker


def test_write_tbl(tmp_path):
    p = str(tmp_path / "x.tbl")
    write_tbl(p, _hits(), genome_bp=10_000)
    text = open(p).read()
    assert "total length: 10000 bp" in text
    assert "DNA" in text and "LTR" in text
    assert "bases masked: 802 bp" in text  # 501 + 301


def test_full_length_gff(tmp_path):
    p = str(tmp_path / "fl.gff")
    write_full_length_gff(p, _hits())
    lines = [l for l in open(p) if not l.startswith("#")]
    assert len(lines) == 1 and "TIR_0" in lines[0]


def test_annotation_identity_is_real_alignment_identity():
    """GFF Identity / .out div come from the SW kernel, not the seed proxy:
    a ~10%-mutated copy must score ~0.9, a clean copy ~1.0."""
    import numpy as np

    from hite_tpu.config import PipelineConfig
    from hite_tpu.genome import Genome
    from hite_tpu.pipeline.annotate import annotate_genome

    rng = np.random.default_rng(12)
    te = rng.integers(0, 4, 800).astype(np.uint8)
    bg = rng.integers(0, 4, 40_000).astype(np.uint8)
    bg[5_000:5_800] = te                       # exact copy
    noisy = te.copy()
    muts = rng.random(len(noisy)) < 0.10
    noisy[muts] = (noisy[muts] + rng.integers(1, 4, muts.sum())) % 4
    bg[20_000:20_800] = noisy                  # ~10% diverged copy
    genome = Genome.from_dict({"chr1": bg})

    lib = {"fam#DNA": te}
    hits = annotate_genome(genome, lib, PipelineConfig())
    def near(pos):
        return next((h for h in hits if abs(h.start - pos) <= 10), None)

    exact = near(5_001)
    div = near(20_001)
    assert exact is not None and div is not None, [h.start for h in hits]
    assert exact.identity > 0.98
    assert 0.82 < div.identity < 0.95, div.identity


def test_overlap_resolution_is_score_based():
    """A shorter high-identity hit beats a longer diverged one at a
    nested locus (RepeatMasker score semantics, pan_annotate_genome.py:27);
    longest-wins would pick the diverged hit."""
    from hite_tpu.io.gff import AnnotationHit
    from hite_tpu.pipeline.annotate import resolve_overlaps

    long_div = AnnotationHit(contig="c", start=100, end=1100, strand="+",
                             family="old", te_class="LTR", identity=0.70)
    short_clean = AnnotationHit(contig="c", start=400, end=800, strand="+",
                                family="new", te_class="DNA", identity=0.99)
    out = resolve_overlaps([long_div, short_clean])
    assert [h.family for h in out] == ["new"]

    # non-overlapping hits all survive
    far = AnnotationHit(contig="c", start=5000, end=5400, strand="+",
                        family="far", te_class="DNA", identity=0.9)
    out = resolve_overlaps([long_div, far])
    assert [h.family for h in out] == ["old", "far"]
