"""Training + evaluation for the TE superfamily classifier.

Re-implements NeuralTE's training stack (`bin/NeuralTE/src/Trainer.py`,
`CrossValidator.py` 5-fold CV, `utils/evaluate_util.py` metrics): labeled
TE libraries (headers `>name#Class/Subclass`) become feature vectors via
`models.features.classifier_features`, trained with the sharded optax step
(`models.train`) or a plain single-device loop, with accuracy / macro
precision / recall / F1 reporting and .msgpack checkpointing (replacing
Keras .h5 checkpoints, `CNN_Model.py:104-122`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hite_tpu.models.classifier import (
    SuperfamilyCNN, WICKER_CLASSES, WICKER_TO_RM,
)
from hite_tpu.models.features import classifier_features
from hite_tpu.pipeline.candidates import pad_seqs
from hite_tpu.utils.log import logger

RM_TO_WICKER = {v: k for k, v in WICKER_TO_RM.items()}
# common RepeatMasker aliases seen in Repbase-style libraries
RM_TO_WICKER.update({
    "DNA/CMC": "CACTA", "DNA/EnSpm": "CACTA", "DNA/CACTA": "CACTA",
    "DNA/hAT-Ac": "hAT", "DNA/hAT-Tip100": "hAT", "DNA/hAT-Charlie": "hAT",
    "DNA/TcMar-Tc1": "Tc1-Mariner", "DNA/TcMar-Mariner": "Tc1-Mariner",
    "DNA/MULE-MuDR": "Mutator", "DNA/MuDR": "Mutator",
    "DNA/PIF": "PIF-Harbinger", "DNA/Harbinger": "PIF-Harbinger",
    "LTR/ERV1": "Retrovirus", "LTR/ERVK": "Retrovirus",
    "LINE/CR1": "Jockey", "LINE/RTE-BovB": "RTE", "SINE/MIR": "tRNA",
    "RC/Helitron": "Helitron", "DNA/Helitron": "Helitron",
})


def label_to_class(label: str) -> Optional[int]:
    """`Class/Subclass` or Wicker name -> class index (None if unmapped)."""
    if label in WICKER_CLASSES:
        return WICKER_CLASSES.index(label)
    if label in RM_TO_WICKER:
        return WICKER_CLASSES.index(RM_TO_WICKER[label])
    head = label.split("-")[0]
    if head in RM_TO_WICKER:
        return WICKER_CLASSES.index(RM_TO_WICKER[head])
    return None


from functools import partial


def _features_core(mat, lens, term, tmat, tlens, dom_idx, *,
                   term_mode: str):
    """ONE fused device program per (shape, term_mode) — the eager
    per-op path paid a ~1s tunnel round trip for every jnp call
    (~30+ per batch; refine_labels + ltr.classify were 160 s of the
    8 Mbp warm stage map before this)."""
    from hite_tpu.models.features import locate_termini, tsd_feature

    if term_mode == "locate":
        term = locate_termini(mat, lens)
    elif term_mode == "fixed":
        term = None
    return classifier_features(
        mat, lens, term_lens=term,
        tsd_onehot=tsd_feature(tmat, tlens),
        domain_onehot=jax.nn.one_hot(dom_idx, 29, dtype=jnp.float32))


def _features_program(mat, lens, term, tmat, tlens, dom_idx, *,
                      term_mode: str):
    # executed through the explicit AOT cache: the modes differ in which
    # inputs are unused (jit prunes unused args), and plain jit dispatch
    # intermittently mixed up the variants' pruning metadata under
    # compilation load ("supplied 5 buffers but compiled program
    # expected 6") — see utils/jitcache.py
    from hite_tpu.utils.jitcache import aot_call

    return aot_call(f"features_{term_mode}",
                    partial(_features_core, term_mode=term_mode),
                    mat, lens, term, tmat, tlens, dom_idx)


def build_features(
    seqs: Sequence[np.ndarray],
    *,
    tsd_seqs: Optional[Sequence[np.ndarray]] = None,
    domain_classes: Optional[Sequence[Optional[int]]] = None,
    locate: bool = True,
    term_lens: Optional[np.ndarray] = None,   # [N] known terminal lengths
    batch: int = 256,
) -> np.ndarray:
    """Assemble the full NeuralTE-equivalent feature matrix [N, F].

    One shared assembly for training and every inference site: located
    termini (ltrsearch/itrsearch-equivalent scan unless locate=False),
    TSD one-hot block (`tsd_seqs`: per-row TSD codes or None), domain
    one-hot block (`domain_classes`: Wicker class index or None = absent).
    """
    from hite_tpu.pipeline.candidates import pad_rows

    n = len(seqs)
    out: List[np.ndarray] = []
    for b0 in range(0, n, batch):
        sub = list(seqs[b0 : b0 + batch])
        # rows padded to pow2: bounds jit variants across call sites
        mat, lens = pad_seqs(sub, n_rows=pad_rows(len(sub), min_rows=8))
        B = mat.shape[0]

        if term_lens is not None:
            tl = np.zeros(B, np.int32)
            tl[: len(sub)] = np.asarray(term_lens[b0 : b0 + batch], np.int32)
            mode = "given"
        else:
            tl = np.zeros(B, np.int32)
            mode = "locate" if locate else "fixed"

        tmat = np.full((B, 16), 4, np.int32)
        tlens = np.zeros(B, np.int32)
        if tsd_seqs is not None:
            for i in range(len(sub)):
                r = tsd_seqs[b0 + i]
                if r is None:
                    continue
                r = np.asarray(r)
                tmat[i, : min(len(r), 16)] = r[:16]
                tlens[i] = min(len(r), 16)

        dom_idx = np.full(B, 28, np.int32)
        if domain_classes is not None:
            for i in range(len(sub)):
                c = domain_classes[b0 + i]
                if c is not None:
                    dom_idx[i] = c

        X = _features_program(
            jnp.asarray(mat), jnp.asarray(lens), jnp.asarray(tl),
            jnp.asarray(tmat), jnp.asarray(tlens), jnp.asarray(dom_idx),
            term_mode=mode)
        out.append(np.asarray(X)[: len(sub)])
    return (np.concatenate(out) if out
            else np.zeros((0, 1), np.float32))


def make_dataset(
    lib: Dict[str, np.ndarray],
    max_len: int = 8192,
    tsds: Optional[Dict[str, str]] = None,
    domains: Optional[Dict[str, str]] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Labeled library -> (features [N, F], labels [N], kept names).

    tsds: optional {name: TSD string} (the use_TSD-1 feature block);
    domains: optional {name: Wicker class label} protein-domain evidence.
    """
    from hite_tpu.io.fasta import encode_seq

    seqs, labels, names = [], [], []
    for name, codes in lib.items():
        _, _, label = name.partition("#")
        cls = label_to_class(label)
        if cls is None:
            continue
        seqs.append(codes[:max_len])
        labels.append(cls)
        names.append(name)
    if not seqs:
        return np.zeros((0, 1)), np.zeros(0, np.int32), []
    tsd_seqs = None
    if tsds is not None:
        tsd_seqs = [encode_seq(tsds.get(n) or "") for n in names]
    dom_cls = None
    if domains is not None:
        dom_cls = [label_to_class(domains[n]) if domains.get(n) else None
                   for n in names]
    X = build_features(seqs, tsd_seqs=tsd_seqs, domain_classes=dom_cls)
    return X, np.array(labels, np.int32), names


TEST_REF = os.path.join(os.path.dirname(__file__), "..", "data", "test.ref")


def curated_dataset(
    fold: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """The vendored curated library (`data/test.ref`, 78 labeled families
    from the reference's --species test set) as a real-data classifier
    dataset, with the SAME feature evidence the pipeline computes at
    inference (protein-domain scan; no genome -> no TSD block).

    fold: None = all mappable entries; 'train'/'eval' = alternate entries
    of the name-sorted list (deterministic 50/50 split, so the bundled
    checkpoint can be trained on one half and honestly evaluated on the
    other — NeuralTE's CrossValidator.py protocol at our data scale).
    """
    from hite_tpu.config import DEFAULT
    from hite_tpu.io.fasta import read_fasta
    from hite_tpu.pipeline.library import library_feature_evidence

    lib = read_fasta(TEST_REF)
    names = sorted(n for n in lib
                   if label_to_class(n.partition("#")[2]) is not None)
    if fold == "train":
        names = names[::2]
    elif fold == "eval":
        names = names[1::2]
    seqs = [lib[n][:8192] for n in names]
    _tsd, dom_cls = library_feature_evidence(seqs, DEFAULT, None)
    domains = {n: (WICKER_CLASSES[c] if c is not None else None)
               for n, c in zip(names, dom_cls)}
    return make_dataset({n: lib[n] for n in names}, domains=domains)


def train_classifier(
    X: np.ndarray,
    y: np.ndarray,
    *,
    epochs: int = 30,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
    model: Optional[SuperfamilyCNN] = None,
):
    """Single-device training loop; returns (model, params, history)."""
    model = model or SuperfamilyCNN()
    rng = jax.random.key(seed)
    params = model.init(rng, jnp.asarray(X[:1]), train=False)
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, dkey):
        def loss_fn(p):
            logits = model.apply(p, xb, train=True, rngs={"dropout": dkey})
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(X)
    history = []
    np_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = np_rng.permutation(n)
        losses = []
        for b0 in range(0, n - batch_size + 1, batch_size):
            idx = order[b0 : b0 + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(X[idx]), jnp.asarray(y[idx]),
                jax.random.fold_in(rng, epoch * 10000 + b0))
            losses.append(float(loss))
        if n < batch_size:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(X), jnp.asarray(y),
                jax.random.fold_in(rng, epoch))
            losses.append(float(loss))
        history.append(float(np.mean(losses)))
    return model, params, history


_APPLY_CACHE: Dict[object, object] = {}


def jit_apply(model, params, *inputs):
    """Cached jitted inference apply — an eager flax `model.apply` walks
    the net one jnp op at a time, and each op is a separate tunnel
    dispatch (~1s each on the remote TPU).  Cached per model INSTANCE
    (flax modules are hashable frozen dataclasses), so same-class models
    with different hyperparameters do not share a stale architecture."""
    key = model
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, *xs: model.apply(p, *xs))
        _APPLY_CACHE[key] = fn
    return fn(params, *inputs)


def predict_logits(model, params, X: np.ndarray) -> np.ndarray:
    """Batch-padded jitted inference: rows pad to pow2 so arbitrary
    call-site batch sizes reuse a handful of compiled programs."""
    from hite_tpu.pipeline.candidates import pad_rows

    n = len(X)
    if n == 0:
        return np.zeros((0, len(WICKER_CLASSES)), np.float32)
    Bp = pad_rows(n, min_rows=8)
    Xp = np.zeros((Bp,) + X.shape[1:], X.dtype)
    Xp[:n] = X
    return np.asarray(jit_apply(model, params, jnp.asarray(Xp)))[:n]


def evaluate(model, params, X: np.ndarray, y: np.ndarray) -> Dict[str, float]:
    """Accuracy + macro precision/recall/F1 (evaluate_util.get_metrics)."""
    logits = predict_logits(model, params, np.asarray(X))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    acc = float((pred == y).mean()) if len(y) else 0.0
    precs, recs, f1s = [], [], []
    for c in np.unique(y):
        tp = int(((pred == c) & (y == c)).sum())
        fp = int(((pred == c) & (y != c)).sum())
        fn = int(((pred != c) & (y == c)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        precs.append(p)
        recs.append(r)
        f1s.append(2 * p * r / (p + r) if p + r else 0.0)
    return dict(accuracy=acc, precision=float(np.mean(precs)),
                recall=float(np.mean(recs)), f1=float(np.mean(f1s)))


def evaluate_per_class(model, params, X: np.ndarray,
                       y: np.ndarray) -> Dict[str, Dict[str, float]]:
    """Per-class precision/recall/F1/support table (the reference prints
    sklearn's classification_report in CrossValidator.py; this is the
    same breakdown, keyed by Wicker class name)."""
    logits = predict_logits(model, params, np.asarray(X))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    out: Dict[str, Dict[str, float]] = {}
    for c in np.unique(y):
        tp = int(((pred == c) & (y == c)).sum())
        fp = int(((pred == c) & (y != c)).sum())
        fn = int(((pred != c) & (y == c)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        out[WICKER_CLASSES[int(c)]] = dict(
            precision=round(p, 3), recall=round(r, 3),
            f1=round(2 * p * r / (p + r), 3) if p + r else 0.0,
            support=int((y == c).sum()))
    return out


def cross_validate(
    X: np.ndarray, y: np.ndarray, *, folds: int = 5, epochs: int = 20,
    seed: int = 0,
) -> List[Dict[str, float]]:
    """k-fold CV (NeuralTE CrossValidator.py)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(X))
    fold_metrics = []
    for f in range(folds):
        test_idx = order[f::folds]
        train_idx = np.setdiff1d(order, test_idx)
        model, params, _ = train_classifier(X[train_idx], y[train_idx],
                                            epochs=epochs, seed=seed + f)
        fold_metrics.append(evaluate(model, params, X[test_idx], y[test_idx]))
        logger.info("cv fold %d: %s", f, fold_metrics[-1])
    return fold_metrics


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(jax.tree.map(np.asarray, params), fh)


def load_params(path: str):
    with open(path, "rb") as fh:
        return jax.tree.map(jnp.asarray, pickle.load(fh))
