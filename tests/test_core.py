"""Core substrate tests: codecs, genome bookkeeping, intervals."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.io.fasta import encode_seq, decode_seq, revcomp as np_revcomp, read_fasta, write_fasta
from hite_tpu.genome import Genome, synthetic_genome, CONTIG_SPACER
from hite_tpu.ops import encode as enc
from hite_tpu.utils import intervals as iv


def test_encode_decode_roundtrip():
    s = "ACGTNacgtnRYK"
    codes = encode_seq(s)
    assert decode_seq(codes) == "ACGTNACGTNNNN"
    assert codes.dtype == np.uint8


def test_revcomp_host_vs_device():
    s = "ACGTTGCANNA"
    host = decode_seq(np_revcomp(encode_seq(s)))
    dev = decode_seq(np.asarray(enc.revcomp(jnp.asarray(encode_seq(s)))))
    assert host == dev == "TNNTGCAACGT"


def test_kmer_codes_match_naive():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=100).astype(np.uint8)
    codes[40] = 4  # an N
    k = 5
    got = np.asarray(enc.kmer_codes(jnp.asarray(codes), k))
    for i in range(100 - k + 1):
        window = codes[i : i + k]
        if (window >= 4).any():
            assert got[i] == -1
        else:
            expect = 0
            for b in window:
                expect = expect * 4 + int(b)
            assert got[i] == expect


def test_fasta_io_roundtrip(tmp_path):
    path = str(tmp_path / "x.fa")
    seqs = {"chr1": "ACGTACGTAC" * 13, "tig00002 extra desc": "TTTTGGGG"}
    with open(path, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")
    back = read_fasta(path)
    assert list(back.keys()) == ["chr1", "tig00002"]
    assert decode_seq(back["chr1"]) == seqs["chr1"]
    out = str(tmp_path / "y.fa")
    write_fasta(out, back)
    again = read_fasta(out)
    assert decode_seq(again["tig00002"]) == "TTTTGGGG"


def test_genome_coordinates():
    g = Genome.from_dict({"a": encode_seq("ACGT" * 25), "b": encode_seq("TTTT" * 10)})
    assert g.size == 140
    assert g.names == ["a", "b"]
    ci, local = g.contig_of(np.array([0, 99, 100 + CONTIG_SPACER]))
    assert list(ci) == [0, 0, 1]
    assert list(local) == [0, 99, 0]
    assert g.to_flat("b", 5) == 100 + CONTIG_SPACER + 5
    assert g.location_str(g.to_flat("b", 4), g.to_flat("b", 12)) == "b:4-12(+)"


def test_genome_segments_and_masking():
    g = Genome.from_dict({"a": np.zeros(1000, dtype=np.uint8)})
    segs = g.segment_view(256)
    assert segs.shape[1] == 256
    g.mask_intervals([(10, 20)])
    assert (g.masked[10:20] == 4).all()
    assert (g.flat[10:20] == 0).all()  # original untouched


def test_synthetic_genome_plants_copies():
    te = "ACGTTGCA" * 40  # 320bp
    g, ins = synthetic_genome(20_000, [te], [5], seed=1, mutation_rate=0.0)
    assert len(ins) == 5
    for ti, s, e in ins:
        assert decode_seq(g.flat[s:e]) == te


def test_interval_merge_and_coverage():
    m = iv.merge(np.array([[0, 10], [5, 20], [30, 40]]))
    assert m.tolist() == [[0, 20], [30, 40]]
    assert iv.total_length(np.array([[0, 10], [5, 20]])) == 20
    cov = iv.coverage_fraction(np.array([[0, 10], [15, 25], [100, 110]]),
                               np.array([[0, 5], [18, 30]]))
    assert np.allclose(cov, [0.5, 0.7, 0.0])


def test_interval_dedup_rounding():
    kept, idx = iv.dedup(np.array([[100, 200], [103, 197], [300, 400]]), q=10)
    assert len(kept) == 2


def test_mutual_overlap_groups():
    groups = iv.mutual_overlap_groups(
        np.array([[0, 100], [1, 99], [500, 600], [0, 50]]), frac=0.95
    )
    assert groups[0] == groups[1]
    assert groups[0] != groups[2]
    assert groups[0] != groups[3]
