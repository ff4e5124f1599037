"""Copia/Gypsy pol domain-order evidence (domain.ltr_domain_order).

Parity target: NeuralTE's domain feature distinguishes Copia
(PR-INT-RT-RH) from Gypsy (PR-RT-RH-INT) pol layouts; with RepeatPeps
missing upstream, grammar-located motif ORDER stands in
(`/root/reference/bin/NeuralTE/src/Util.py` domain vector).
"""

import numpy as np

from hite_tpu.ops.protein import _CODONS
from hite_tpu.pipeline.domain import ltr_domain_order

_B = {"A": 0, "C": 1, "G": 2, "T": 3}
_AA_CODON = {}
for codon, aa in _CODONS.items():
    _AA_CODON.setdefault(aa, codon)


def _nt(aa_str: str) -> np.ndarray:
    return np.array([_B[b] for aa in aa_str for b in _AA_CODON[aa]],
                    np.uint8)


def _rt_block() -> str:
    # [LIVM]PQG ... [YF]xDD with a 20-aa gap
    return "LPQG" + "A" * 20 + "YADD"


def _int_block() -> str:
    # H-X(5)-H-X(28)-C-X(2)-C zinc-binding signature
    return "H" + "G" * 5 + "H" + "A" * 28 + "C" + "GG" + "C"


def _element(order: str) -> np.ndarray:
    rng = np.random.default_rng(17)
    spacer = "".join("GA"[(i % 2)] for i in range(60))
    if order == "copia":
        aa = "M" + spacer + _int_block() + spacer + _rt_block() + spacer
    else:
        aa = "M" + spacer + _rt_block() + spacer + _int_block() + spacer
    pre = rng.integers(0, 4, 3 * 7).astype(np.uint8)   # keep frame intact
    return np.concatenate([pre, _nt(aa)])


def test_domain_order_calls():
    copia = _element("copia")
    gypsy = _element("gypsy")
    rng = np.random.default_rng(23)
    noise = rng.integers(0, 4, 900).astype(np.uint8)
    out = ltr_domain_order([copia, gypsy, noise])
    assert out[0] == 1, out
    assert out[1] == 2, out
    assert out[2] == 0, out


def test_classify_uses_domain_order():
    from hite_tpu.genome import Genome
    from hite_tpu.config import PipelineConfig
    from hite_tpu.models.classifier import WICKER_TO_RM
    from hite_tpu.pipeline.ltr import LTRRecord, classify_ltr_records

    rng = np.random.default_rng(29)
    ltr = rng.integers(0, 4, 200).astype(np.uint8)
    interior = _element("gypsy")
    bg = rng.integers(0, 4, 20_000).astype(np.uint8)
    pos = 5000
    el = np.concatenate([ltr, interior, ltr])
    bg[pos : pos + len(el)] = el
    genome = Genome.from_dict({"chr1": bg})
    rec = LTRRecord(pos, pos + len(el), pos, pos + 200,
                    pos + len(el) - 200, pos + len(el), 0.97, 1e6)
    out = classify_ltr_records(genome, [rec], PipelineConfig())
    assert out[0].superfamily in ("Gypsy", WICKER_TO_RM["Gypsy"]), \
        out[0].superfamily
