"""Sort-merge lib-vs-genome join copy retrieval (ops/libjoin + join path).

Oracle = planted copies in a synthetic genome (the same contract the
segment-lookup path was validated against): every planted full-length copy
must be recovered by the join mapper, on both strands, with correct flat
coordinates.  Also cross-checks the join path against the legacy segment
path on identical inputs.
"""

import numpy as np
import pytest

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome, synthetic_genome
from hite_tpu.io.fasta import decode_seq, encode_seq
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex


def _rand_te(rng, L):
    return decode_seq(rng.integers(0, 4, size=L).astype(np.uint8))


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(7)
    tes = [_rand_te(rng, 900), _rand_te(rng, 420)]
    genome, ins = synthetic_genome(
        200_000, tes, [6, 8], seed=3, mutation_rate=0.01)
    return genome, tes, ins


def _hit_matches(h, s, e):
    ov = min(h.end, e) - max(h.start, s)
    return ov > 0.9 * (e - s)


def test_join_recovers_planted_copies(planted):
    genome, tes, ins = planted
    cfg = AlignConfig()
    finder = CopyFinder(GenomeIndex(genome, cfg))
    assert finder.strategy == "join"
    copies = finder.find_copies([encode_seq(t) for t in tes],
                                min_coverage=0.9)
    for ti in range(len(tes)):
        expected = [(s, e) for t, s, e in ins if t == ti]
        found = copies[ti]
        for s, e in expected:
            assert any(_hit_matches(h, s, e) for h in found), (ti, s, e)


def test_join_reverse_strand(planted):
    genome, tes, ins = planted
    cfg = AlignConfig()
    finder = CopyFinder(GenomeIndex(genome, cfg))
    rc = encode_seq(tes[0])
    rc = (3 - rc)[::-1].astype(np.uint8)       # revcomp query
    copies = finder.find_copies([rc], min_coverage=0.9)[0]
    expected = [(s, e) for t, s, e in ins if t == 0]
    assert copies, "rc query found no copies"
    for s, e in expected:
        hits = [h for h in copies if _hit_matches(h, s, e)]
        assert hits and all(h.strand == 1 for h in hits)


def test_join_matches_segment_path(planted):
    genome, tes, ins = planted
    cfg = AlignConfig()
    gindex = GenomeIndex(genome, cfg)
    cands = [encode_seq(t) for t in tes]
    join = CopyFinder(gindex, strategy="join").find_copies(
        cands, min_coverage=0.9)
    segs = CopyFinder(gindex, strategy="segments").find_copies(
        cands, min_coverage=0.9)
    for ti in range(len(tes)):
        seg_ivs = [(h.start, h.end) for h in segs[ti]]
        for s, e in seg_ivs:
            assert any(_hit_matches(h, s, e) for h in join[ti]), (ti, s, e)


def test_join_coverage_gate(planted):
    genome, tes, _ = planted
    cfg = AlignConfig()
    finder = CopyFinder(GenomeIndex(genome, cfg))
    # half a TE at min_coverage=0.95 of the FULL TE: the genome copies
    # cover the query fully but their subject spans are ~half the TE, so
    # a full-length query should not report half-length hits and vice versa
    half = encode_seq(tes[0])[:450]
    full_hits = finder.find_copies([encode_seq(tes[0])], min_coverage=0.95)[0]
    half_hits = finder.find_copies([half], min_coverage=0.95)[0]
    assert full_hits and half_hits
    assert all(h.end - h.start > 700 for h in full_hits)
    assert all(h.end - h.start < 600 for h in half_hits)


def test_join_empty_and_absent():
    rng = np.random.default_rng(11)
    genome = Genome.from_dict(
        {"c1": rng.integers(0, 4, size=50_000).astype(np.uint8)})
    cfg = AlignConfig()
    finder = CopyFinder(GenomeIndex(genome, cfg))
    absent = rng.integers(0, 4, size=300).astype(np.uint8)
    out = finder.find_copies([absent], min_coverage=0.95)
    # a random 300-mer should have no 95%-coverage copy in 50kb
    assert out[0] == [] or all(
        h.end - h.start < 400 for h in out[0])
    assert finder.find_copies([]) == []
