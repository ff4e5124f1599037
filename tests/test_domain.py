"""Protein-domain engine tests: translation, BLOSUM SW, domain scan."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.io.fasta import encode_seq
from hite_tpu.ops.protein import (
    AA_X, BLOSUM62, decode_protein, encode_protein, translate_frames,
)
from hite_tpu.ops.terminal import batched_local_align
from hite_tpu.pipeline.domain import DomainScanner, rescue_by_domain


def test_translate_known_codons():
    # ATG GCA TTT TAA -> M A F *
    seq = encode_seq("ATGGCATTTTAA" + "ACGT")
    fr = np.asarray(translate_frames(jnp.asarray(seq[None])))
    aa = decode_protein(fr[0, 0][:4])
    assert aa == "MAFX"  # stop translates to X


def test_translate_reverse_frame():
    from hite_tpu.io.fasta import revcomp
    # construct so that revcomp(seq) frame 0 reads CCC ATG TAC = P M Y
    seq = revcomp(encode_seq("CCCATGTACGGG"))
    fr = np.asarray(translate_frames(jnp.asarray(seq[None])))
    assert decode_protein(fr[0, 3][:3]) == "PMY"


def test_blosum_local_align():
    a = encode_protein("MKVLAAGGSTREEQ")
    b = encode_protein("XXMKVLAAGGSTREEQXX")
    al = batched_local_align(jnp.asarray(a[None]), jnp.asarray(b[None]),
                             submatrix=jnp.asarray(BLOSUM62),
                             mismatch=-4, gap=8, invalid_code=AA_X)
    assert int(al.matches[0]) == 14
    assert float(al.matches[0]) / float(al.alen[0]) == 1.0


def _random_orf(rng, n_aa):
    # random codons avoiding stops: use a safe codon set per aa
    aas = "ARNDCQEGHILKMFPSTWYV"
    codon_for = {"A": "GCA", "R": "CGA", "N": "AAC", "D": "GAC", "C": "TGC",
                 "Q": "CAA", "E": "GAA", "G": "GGA", "H": "CAC", "I": "ATC",
                 "L": "CTA", "K": "AAA", "M": "ATG", "F": "TTC", "P": "CCA",
                 "S": "TCA", "T": "ACA", "W": "TGG", "Y": "TAC", "V": "GTA"}
    prot = "".join(rng.choice(list(aas)) for _ in range(n_aa))
    nt = "".join(codon_for[a] for a in prot)
    return prot, nt


def test_domain_scan_finds_planted_orf():
    rng = np.random.default_rng(5)
    prot, nt = _random_orf(rng, 120)
    lib = {"DOM1": encode_protein(prot),
           "DOM2": encode_protein("".join(
               rng.choice(list("ARNDCQEGHILKMFPSTWYV")) for _ in range(150)))}
    scanner = DomainScanner(lib)
    cand = np.concatenate([
        rng.integers(0, 4, 77).astype(np.uint8), encode_seq(nt),
        rng.integers(0, 4, 90).astype(np.uint8)])
    hits = scanner.scan([cand])[0]
    assert hits, "planted ORF not found"
    best = hits[0]
    assert best.entry == "DOM1"
    assert best.identity > 0.95
    assert best.entry_cov > 0.9
    assert abs(best.q_start - 77) <= 12
    assert abs(best.q_end - (77 + len(nt))) <= 12


def test_domain_scan_reverse_strand():
    rng = np.random.default_rng(6)
    prot, nt = _random_orf(rng, 100)
    lib = {"DOM1": encode_protein(prot)}
    scanner = DomainScanner(lib)
    from hite_tpu.io.fasta import revcomp
    cand = np.concatenate([
        rng.integers(0, 4, 50).astype(np.uint8),
        revcomp(encode_seq(nt)),
        rng.integers(0, 4, 60).astype(np.uint8)])
    hits = scanner.scan([cand])[0]
    assert hits and hits[0].frame >= 3
    assert hits[0].entry_cov > 0.9


def test_rescue_by_domain():
    rng = np.random.default_rng(7)
    prot, nt = _random_orf(rng, 110)
    lib = {"DOM1": encode_protein(prot)}
    scanner = DomainScanner(lib)
    with_domain = encode_seq(nt)
    without = rng.integers(0, 4, 400).astype(np.uint8)
    mask = rescue_by_domain([with_domain, without], scanner)
    assert mask[0] and not mask[1]
