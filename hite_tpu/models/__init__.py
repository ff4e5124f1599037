"""Neural models (NeuralTE / HybridLTR equivalents) and their training."""

from __future__ import annotations

import os

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "models")


def bundled_model_path(name: str) -> str | None:
    """Absolute path of a bundled default checkpoint, or None if absent.

    The reference hard-wires model blobs relative to its repo root
    (`judge_LTR_transposons.py:251-264`); here the bundled defaults are the
    synthetic-data-pretrained parameters written by `models.pretrain`.
    """
    path = os.path.abspath(os.path.join(_MODELS_DIR, name))
    return path if os.path.exists(path) else None
