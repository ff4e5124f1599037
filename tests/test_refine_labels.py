"""Neural label refinement in library assembly."""

import dataclasses

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.models.trainer import make_dataset, save_params, train_classifier
from hite_tpu.pipeline.library import refine_labels

import sys
sys.path.insert(0, "tests")
from test_trainer import _synthetic_lib  # noqa: E402


def test_refine_labels(tmp_path):
    rng = np.random.default_rng(0)
    lib = _synthetic_lib(rng, n_per=24)
    X, y, names = make_dataset(lib)
    model, params, _ = train_classifier(X, y, epochs=25, seed=0)
    path = str(tmp_path / "clf.pkl")
    save_params(path, params)

    cfg = PipelineConfig()
    cfg = cfg.replace(classify=dataclasses.replace(
        cfg.classify, model_path=path, is_wicker=False))

    # an unknown entry drawn from family a (DNA/hAT) and a labeled one
    a_seq = lib["a0#DNA/hAT"]
    b_seq = lib["b0#LTR/Gypsy"]
    merged = {"fam1#Unknown": a_seq, "fam2#LTR/Gypsy": b_seq}
    out = refine_labels(merged, cfg)
    assert "fam2#LTR/Gypsy" in out                      # untouched
    fam1 = [n for n in out if n.startswith("fam1#")][0]
    assert fam1 == "fam1#DNA/hAT", fam1


def test_refine_respects_structural_class(tmp_path):
    """A structurally-confirmed class must not be overruled cross-class."""
    rng = np.random.default_rng(3)
    lib = _synthetic_lib(rng, n_per=24)
    X, y, names = make_dataset(lib)
    model, params, _ = train_classifier(X, y, epochs=25, seed=1)
    path = str(tmp_path / "clf.pkl")
    save_params(path, params)

    cfg = PipelineConfig()
    cfg = cfg.replace(classify=dataclasses.replace(
        cfg.classify, model_path=path, is_wicker=False))

    # feed an LTR-family sequence labelled as a structural TIR ("DNA"):
    # the refinement may only pick a DNA superfamily for it
    merged = {"t0#DNA": lib["b0#LTR/Gypsy"],
              "l0#LINE": lib["a1#DNA/hAT"]}
    out = refine_labels(merged, cfg)
    t0 = [n for n in out if n.startswith("t0#")][0]
    l0 = [n for n in out if n.startswith("l0#")][0]
    assert t0.partition("#")[2].startswith("DNA"), t0
    assert l0.partition("#")[2].split("/")[0] in ("LINE", "SINE"), l0
