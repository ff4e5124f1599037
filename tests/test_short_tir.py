"""Short-TIR superfamily signature tests (get_short_tir_contigs rules)."""

import numpy as np

from hite_tpu.io.fasta import encode_seq, revcomp
from hite_tpu.pipeline.tir import _short_tir_signature


def _with_short_tir(rng, tir5="ACGGT", length=600):
    t5 = encode_seq(tir5)
    core = rng.integers(0, 4, length - 10).astype(np.uint8)
    return np.concatenate([t5, core, revcomp(t5)])


def test_hat_signature():
    rng = np.random.default_rng(0)
    sub = _with_short_tir(rng)
    assert _short_tir_signature(sub, 8, plant=True)       # hAT: TSD 8
    assert not _short_tir_signature(sub, 5, plant=True)   # wrong TSD size
    long = _with_short_tir(rng, length=5000)
    assert not _short_tir_signature(long, 8, plant=True)  # hAT must be <4kb


def test_mutator_signature():
    rng = np.random.default_rng(1)
    sub = _with_short_tir(rng)
    for s in (9, 10, 11):
        assert _short_tir_signature(sub, s, plant=True)


def test_cacta_signature():
    rng = np.random.default_rng(2)
    sub = _with_short_tir(rng, tir5="CACTA")
    assert _short_tir_signature(sub, 3, plant=True)
    assert not _short_tir_signature(sub, 3, plant=False)


def test_requires_inverted_terminals():
    rng = np.random.default_rng(3)
    sub = rng.integers(0, 4, 600).astype(np.uint8)  # random ends
    # overwhelmingly unlikely to have revcomp-identical 5-mers
    assert not _short_tir_signature(sub, 9, plant=True)


def test_ccc_signature_nonplant():
    rng = np.random.default_rng(4)
    core = rng.integers(0, 4, 580).astype(np.uint8)
    sub = np.concatenate([encode_seq("CCCGA"), core, revcomp(encode_seq("CCCGA"))])
    assert _short_tir_signature(sub, 5, plant=False)
