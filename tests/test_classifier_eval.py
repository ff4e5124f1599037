"""Real-data classifier evaluation on the vendored curated library.

`data/test.ref` carries 78 curated families with `#Class` labels (the
reference's --species test set). The bundled SuperfamilyCNN checkpoint is
trained on the synthetic corpus PLUS the curated train fold
(models/pretrain.py) and must clear an accuracy floor on the held-out
curated eval fold — the first non-synthetic number for the NeuralTE
replacement (reference: bin/NeuralTE/src/CrossValidator.py).
"""

import numpy as np
import pytest

from hite_tpu.models import bundled_model_path


def test_curated_folds_are_disjoint_and_labeled():
    from hite_tpu.models.trainer import curated_dataset

    Xt, yt, nt = curated_dataset(fold="train")
    Xe, ye, ne = curated_dataset(fold="eval")
    assert len(nt) and len(ne)
    assert not set(nt) & set(ne)
    assert len(nt) + len(ne) >= 50          # 55 of 78 entries map to Wicker
    assert Xt.shape[1] == Xe.shape[1]


def test_bundled_checkpoint_accuracy_on_curated_eval_fold():
    from hite_tpu.models.classifier import SuperfamilyCNN
    from hite_tpu.models.trainer import curated_dataset, evaluate, load_params

    path = bundled_model_path("superfamily_cnn.pkl")
    if path is None:
        pytest.skip("bundled checkpoint absent")
    params = load_params(path)
    model = SuperfamilyCNN()
    X, y, names = curated_dataset(fold="eval")
    m = evaluate(model, params, X, y)
    # measured-minus-epsilon floors (VERDICT r3 #6): the bundled
    # checkpoint measures acc 0.630 / macro-F1 0.461 on this fold
    # (per-class table in DESIGN.md "Classifier on real data"); a
    # regression to half the measured quality must FAIL, not pass
    assert m["accuracy"] >= 0.6, m
    assert m["f1"] >= 0.4, m
