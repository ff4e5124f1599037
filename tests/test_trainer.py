"""Classifier training/eval tests on a synthetic two-family problem."""

import numpy as np
import pytest

from hite_tpu.models.trainer import (
    cross_validate, evaluate, label_to_class, make_dataset, train_classifier,
    save_params, load_params,
)


def test_label_mapping():
    assert label_to_class("hAT") is not None
    assert label_to_class("DNA/hAT-Charlie") == label_to_class("hAT")
    assert label_to_class("RC/Helitron") == label_to_class("Helitron")
    assert label_to_class("LTR/Gypsy") == label_to_class("Gypsy")
    assert label_to_class("TotallyUnknown/Thing") is None


def _synthetic_lib(rng, n_per=24):
    # two families with very different terminal + kmer composition
    lib = {}
    a_consensus = rng.integers(0, 2, 600).astype(np.uint8)        # A/C rich
    b_consensus = (rng.integers(0, 2, 600) + 2).astype(np.uint8)  # G/T rich
    for i in range(n_per):
        for cons, label, tag in ((a_consensus, "DNA/hAT", "a"),
                                 (b_consensus, "LTR/Gypsy", "b")):
            copy = cons.copy()
            muts = rng.random(len(copy)) < 0.05
            copy[muts] = rng.integers(0, 4, muts.sum())
            lib[f"{tag}{i}#{label}"] = copy
    return lib


def test_train_and_evaluate():
    rng = np.random.default_rng(0)
    lib = _synthetic_lib(rng)
    X, y, names = make_dataset(lib)
    assert len(X) == len(lib)
    n = len(X)
    order = np.random.default_rng(1).permutation(n)
    tr, te = order[: int(0.8 * n)], order[int(0.8 * n):]
    model, params, hist = train_classifier(X[tr], y[tr], epochs=25, seed=0)
    assert hist[-1] < hist[0]
    m = evaluate(model, params, X[te], y[te])
    assert m["accuracy"] > 0.85, m


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    lib = _synthetic_lib(rng, n_per=6)
    X, y, _ = make_dataset(lib)
    model, params, _ = train_classifier(X, y, epochs=3)
    p = str(tmp_path / "clf.pkl")
    save_params(p, params)
    params2 = load_params(p)
    m1 = evaluate(model, params, X, y)
    m2 = evaluate(model, params2, X, y)
    assert m1 == m2


def test_cross_validate_runs():
    rng = np.random.default_rng(3)
    lib = _synthetic_lib(rng, n_per=10)
    X, y, _ = make_dataset(lib)
    folds = cross_validate(X, y, folds=3, epochs=8)
    assert len(folds) == 3
    assert all("f1" in f for f in folds)
