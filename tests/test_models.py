"""Neural model + sharded training + graft entry tests (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from hite_tpu.models.classifier import SuperfamilyCNN, predict_labels, WICKER_CLASSES
from hite_tpu.models.features import (
    classifier_features, frame_image, kmer_frequencies,
)
from hite_tpu.models.ltr_filter import LTRFilterCNN, kmer_channels


def test_kmer_frequencies():
    seq = jnp.asarray(np.array([[0, 1, 2, 3, 0, 1, 2, 3]], np.uint8))
    f = np.asarray(kmer_frequencies(seq, jnp.asarray([8]), 2))
    assert f.shape == (1, 16)
    # ACGT ACGT: 2-mers AC,CG,GT,TA,AC,CG,GT -> AC x2, CG x2, GT x2, TA x1
    assert abs(f[0, 0 * 4 + 1] - 2 / 7) < 1e-6    # AC
    assert abs(f[0, 3 * 4 + 0] - 1 / 7) < 1e-6    # TA
    assert abs(f.sum() - 1.0) < 1e-5


def test_classifier_forward():
    rng = np.random.default_rng(0)
    seqs = jnp.asarray(rng.integers(0, 4, (4, 300)).astype(np.uint8))
    lens = jnp.asarray([300, 250, 300, 120])
    x = classifier_features(seqs, lens)
    model = SuperfamilyCNN()
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (4, 28)
    labels = predict_labels(logits, is_wicker=True)
    assert all(l in WICKER_CLASSES for l in labels)


def test_ltr_filter_forward():
    model = LTRFilterCNN()
    img = jnp.zeros((2, 100, 200, 3), jnp.float32)
    kmer = jnp.zeros((2, 16, 16, 2), jnp.float32)
    params = model.init(jax.random.key(0), img, kmer)
    logits = model.apply(params, img, kmer)
    assert logits.shape == (2, 2)


def test_frame_image():
    M = jnp.asarray(np.random.default_rng(1).integers(0, 6, (20, 200)).astype(np.uint8))
    img = frame_image(M, n_rows=100)
    assert img.shape == (100, 200, 3)
    assert float(img[50:].sum()) == 0.0  # padded rows empty


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 2)


def test_dryrun_multichip_8dev():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
