"""Helitron module tests: LCV scoring + end-to-end detection."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.io.fasta import encode_seq, decode_seq
from hite_tpu.ops.lcv import default_banks, lcv_scores
from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover
from hite_tpu.pipeline.helitron import run_helitron_detection


def test_lcv_head_scoring():
    head, tail = default_banks()
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 1500).astype(np.uint8)
    seq[300:309] = encode_seq("TCTCTACTA")
    sc, _w = lcv_scores(jnp.asarray(seq[None]), head, tile=512)
    sc = np.asarray(sc)
    assert sc[0, 300] >= 4
    assert sc[0, :280].max() <= 2


def test_lcv_tail_scoring_width():
    head, tail = default_banks()
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 4, 1200).astype(np.uint8)
    inst = encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAG")
    seq[500 : 500 + len(inst)] = inst
    sc, w = lcv_scores(jnp.asarray(seq[None]), tail, tile=512)
    sc = np.asarray(sc)
    w = np.asarray(w)
    assert sc[0, 500] >= 1
    assert w[0, 500] == len(inst)


def _make_helitron_genome():
    rng = np.random.default_rng(7)
    head = encode_seq("TCTCTACTA")
    core = rng.integers(0, 4, 900).astype(np.uint8)
    tail_inst = encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")
    te = np.concatenate([head, core, tail_inst])
    bg = rng.integers(0, 4, 120_000).astype(np.uint8)
    starts = [15_000, 38_000, 61_000, 84_000, 103_000]
    for pos in starts:
        copy = te.copy()
        muts = rng.random(len(copy)) < 0.01
        copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
        bg[pos - 1] = 0        # host 'A' left of insertion (A|T target site)
        bg[pos + len(copy)] = 3  # host 'T'
        bg[pos : pos + len(copy)] = copy
    return Genome.from_dict({"chr1": bg}), starts, len(te)


@pytest.mark.slow
def test_helitron_end_to_end():
    genome, starts, te_len = _make_helitron_genome()
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    cands = coarse_discover(genome, cfg.align,
                            CoarseParams(seg_len=16_384, pair_batch=8))
    assert len(cands) >= 1
    result = run_helitron_detection(genome, cands, cfg)
    assert len(result.accepted) >= 1, "planted helitron family not detected"
    matched = any(
        any(abs(int(a_s) - p) <= 15 and abs(int(a_e) - (p + te_len)) <= 15
            for p in starts)
        for a_s, a_e in result.accepted.intervals)
    assert matched, (result.accepted.intervals, starts)


def test_lcv_gate_reverse_strand_padded_row():
    """Reverse-orientation element in a row shorter than its bucket width.

    Regression: lcv_gate used to revcomp the PADDED row, shifting the
    content into the tail so reverse-strand hits were lost whenever the
    candidate was shorter than the padding bucket.
    """
    from hite_tpu.pipeline.helitron import lcv_gate
    from hite_tpu.io.fasta import revcomp as np_revcomp

    rng = np.random.default_rng(11)
    head = encode_seq("TCTCTACTA")
    core = rng.integers(0, 4, 700).astype(np.uint8)
    tail_inst = encode_seq("CAATGAACG" + "ACGTACGTA" + "CTAGT")
    te = np.concatenate([head, core, tail_inst])
    te_rc = np_revcomp(te)

    bg = rng.integers(0, 4, 8000).astype(np.uint8)
    pos = 3000
    bg[pos : pos + len(te_rc)] = te_rc
    genome = Genome.from_dict({"chr1": bg})

    cfg = PipelineConfig()
    intervals = np.array([[pos, pos + len(te_rc)]], np.int64)
    got = lcv_gate(genome, intervals, cfg)
    assert len(got) >= 1, "reverse-strand LCV candidate missed"
    s, e = got[0]
    assert abs(int(s) - pos) <= 60 and abs(int(e) - (pos + len(te_rc))) <= 60
