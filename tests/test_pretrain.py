"""Synthetic training data + bundled default checkpoints."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.models import bundled_model_path
from hite_tpu.models.synthetic import (
    CLASS_SPECS, load_protein_pools, synthetic_frames, synthetic_library,
)
from hite_tpu.models.classifier import SuperfamilyCNN, WICKER_CLASSES
from hite_tpu.models.ltr_filter import LTRFilterCNN


def test_synthetic_library_labels_and_structure():
    lib = synthetic_library(n_per_class=2, seed=3)
    assert len(lib) == 2 * len(CLASS_SPECS)
    labels = {n.partition("#")[2] for n in lib}
    assert labels == set(WICKER_CLASSES)
    # structural checks: CACTA motif, LTR TG..CA termini, LINE polyA tail
    cacta = next(v for k, v in lib.items() if k.endswith("#CACTA"))
    assert [int(c) for c in cacta[:5]] == [1, 0, 1, 3, 0]  # CACTA
    copia = next(v for k, v in lib.items() if k.endswith("#Copia"))
    assert [int(c) for c in copia[:2]] == [3, 2]           # TG
    l1 = next(v for k, v in lib.items() if k.endswith("#L1"))
    assert (l1[-6:] == 0).all()                            # polyA


def test_protein_pools_feed_internals():
    pools = load_protein_pools()
    assert any(k.startswith("DNA/hAT") for k in pools)
    assert sum(len(v) for v in pools.values()) > 1000


def test_synthetic_frames_shapes():
    frames, labels = synthetic_frames(n=6, seed=0)
    assert frames.shape == (6, 100, 400)
    assert set(np.unique(labels)) <= {0, 1}


def test_bundled_checkpoints_load_and_predict():
    sf = bundled_model_path("superfamily_cnn.pkl")
    lf = bundled_model_path("ltr_filter_cnn.pkl")
    if sf is None or lf is None:
        pytest.skip("bundled checkpoints not built")
    from hite_tpu.models.trainer import load_params

    p1 = load_params(sf)
    from hite_tpu.models.features import classifier_features

    F = classifier_features(jnp.zeros((2, 64), jnp.uint8),
                            jnp.full((2,), 64, jnp.int32)).shape[1]
    logits = SuperfamilyCNN().apply(p1, jnp.zeros((2, F)))
    assert logits.shape == (2, 28)
    p2 = load_params(lf)
    l2 = LTRFilterCNN().apply(
        p2, jnp.zeros((1, 100, 400, 3)), jnp.zeros((1, 16, 16, 2)))
    assert l2.shape == (1, 2)


def test_bundled_superfamily_beats_chance():
    sf = bundled_model_path("superfamily_cnn.pkl")
    if sf is None:
        pytest.skip("bundled checkpoints not built")
    from hite_tpu.models.trainer import evaluate, load_params, make_dataset

    from hite_tpu.models.synthetic import synthetic_training_set

    lib, tsds, doms = synthetic_training_set(n_per_class=4, seed=99)
    X, y, _ = make_dataset(lib, tsds=tsds, domains=doms)
    metrics = evaluate(SuperfamilyCNN(), load_params(sf), X, y)
    assert metrics["accuracy"] > 3 * (1 / 28)


def test_tsd_domain_features_improve_accuracy():
    """The use_TSD-1 feature blocks separate TIR superfamilies whose
    terminal geometry overlaps (hAT/Merlin/P share short TIRs but differ
    in TSD length) — the round-1 gap VERDICT #7 (data_util.py:671-733,
    get_nonRedundant_lib.py:66-79)."""
    from hite_tpu.models.synthetic import synthetic_training_set
    from hite_tpu.models.trainer import evaluate, make_dataset, train_classifier

    classes = ["hAT", "Merlin", "P", "Mutator", "Tc1-Mariner", "PiggyBac"]
    lib, tsds, doms = synthetic_training_set(n_per_class=24, seed=5,
                                             classes=classes)
    ev = synthetic_training_set(n_per_class=8, seed=6, classes=classes)

    Xb, yb, _ = make_dataset(lib)                     # bare features
    Xf, yf, _ = make_dataset(lib, tsds=tsds, domains=doms)
    Eb, eyb, _ = make_dataset(ev[0])
    Ef, eyf, _ = make_dataset(ev[0], tsds=ev[1], domains=ev[2])

    mb, pb, _ = train_classifier(Xb, yb, epochs=12, seed=0)
    mf, pf, _ = train_classifier(Xf, yf, epochs=12, seed=0)
    acc_b = evaluate(mb, pb, Eb, eyb)["accuracy"]
    acc_f = evaluate(mf, pf, Ef, eyf)["accuracy"]
    assert acc_f > acc_b + 0.05, (acc_b, acc_f)
