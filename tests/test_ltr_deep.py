"""Deep LTR filter tests: frame matrices, rule judge, CNN path, training data."""

import numpy as np
import jax
import pytest

from hite_tpu.config import PipelineConfig, AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.copies import GenomeIndex, CopyFinder
from hite_tpu.pipeline.ltr import LTRRecord
from hite_tpu.pipeline.ltr_deep import (
    both_ends_frame, deep_filter_records, make_training_frames,
    rule_judge_frame,
)


@pytest.fixture(scope="module")
def ltr_scene():
    rng = np.random.default_rng(77)
    ltr = rng.integers(0, 4, 250).astype(np.uint8)
    element = np.concatenate([ltr, rng.integers(0, 4, 1800).astype(np.uint8), ltr])
    bg = rng.integers(0, 4, 100_000).astype(np.uint8)
    starts = [10_000, 30_000, 50_000, 70_000, 85_000]
    for pos in starts:
        copy = element.copy()
        muts = rng.random(len(copy)) < 0.01
        copy[muts] = (copy[muts] + rng.integers(1, 4, muts.sum())) % 4
        bg[pos : pos + len(copy)] = copy
    # a fake "LTR" that is actually interior to a larger repeat: plant a
    # bigger repeat containing it so flanks are homologous across copies
    big = rng.integers(0, 4, 3500).astype(np.uint8)
    for pos in (92_000, 96_000):
        bg[pos : pos + len(big)] = big
    genome = Genome.from_dict({"chr1": bg})
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))
    return genome, cfg, starts, len(element)


def test_rule_accepts_real_ltr(ltr_scene):
    genome, cfg, starts, el_len = ltr_scene
    gindex = GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)
    rec = LTRRecord(start=starts[0], end=starts[0] + el_len,
                    lltr_start=starts[0], lltr_end=starts[0] + 250,
                    rltr_start=starts[0] + el_len - 250,
                    rltr_end=starts[0] + el_len, identity=1.0, insert_time=0.0)
    copies = finder.find_copies([genome.extract(rec.start, rec.end)],
                                min_coverage=0.8)[0]
    assert len(copies) >= 4
    M = both_ends_frame(genome, rec, copies)
    assert M is not None
    assert rule_judge_frame(M)


def test_rule_vetoes_embedded_repeat(ltr_scene):
    genome, cfg, starts, el_len = ltr_scene
    gindex = GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)
    # candidate = interior slice of the big repeat: its copies' flanks ARE
    # homologous -> homology does not break at the boundary -> veto
    s, e = 92_000 + 800, 92_000 + 2_600
    copies = finder.find_copies([genome.extract(s, e)], min_coverage=0.8)[0]
    assert len(copies) >= 2
    rec = LTRRecord(start=s, end=e, lltr_start=s, lltr_end=s + 100,
                    rltr_start=e - 100, rltr_end=e, identity=1.0,
                    insert_time=0.0)
    M = both_ends_frame(genome, rec, copies)
    assert M is not None
    assert not rule_judge_frame(M)


def test_deep_filter_and_training_frames(ltr_scene):
    genome, cfg, starts, el_len = ltr_scene
    gindex = GenomeIndex(genome, cfg.align)
    recs = [LTRRecord(start=s, end=s + el_len, lltr_start=s,
                      lltr_end=s + 250, rltr_start=s + el_len - 250,
                      rltr_end=s + el_len, identity=0.99, insert_time=0.0)
            for s in starts[:2]]
    kept = deep_filter_records(genome, recs, cfg, gindex)
    assert len(kept) == 2

    imgs, kms, labels = make_training_frames(
        genome, recs, [(92_800, 94_600)], cfg, gindex)
    assert len(labels) >= 2
    assert set(labels.tolist()) == {0, 1}
    assert imgs.shape[1:] == (100, 400, 3)

    # CNN path executes with freshly initialized params
    from hite_tpu.models.ltr_filter import LTRFilterCNN
    import jax.numpy as jnp
    model = LTRFilterCNN()
    params = model.init(jax.random.key(0), jnp.asarray(imgs[:1]),
                        jnp.asarray(kms[:1]))
    kept2 = deep_filter_records(genome, recs, cfg, gindex, cnn_params=params,
                                low_copy_threshold=0)
    assert isinstance(kept2, list)


def test_cross_class_filter_reroutes_tir_pair(ltr_scene):
    """A fake LTR whose terminals are TIR-element copies must re-route."""
    from hite_tpu.pipeline.ltr_deep import cross_class_filter

    rng = np.random.default_rng(5)
    tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    while tir_t[0] == 3 and tir_t[1] == 2:
        tir_t = rng.integers(0, 4, 20).astype(np.uint8)
    tir_te = np.concatenate(
        [tir_t, rng.integers(0, 4, 360).astype(np.uint8), (3 - tir_t)[::-1]])
    bg = rng.integers(0, 4, 60_000).astype(np.uint8)
    starts = [10_000, 18_000, 30_000, 42_000]
    for pos in starts:
        tsd = rng.integers(0, 4, 5).astype(np.uint8)
        bg[pos - 5 : pos] = tsd
        bg[pos + len(tir_te) : pos + len(tir_te) + 5] = tsd
        bg[pos : pos + len(tir_te)] = tir_te
    genome = Genome.from_dict({"chr1": bg})
    cfg = PipelineConfig(align=AlignConfig(fixed_extend_base_threshold=2000))

    # fake intact-LTR record: left "terminal" = one full TIR copy,
    # right = the next copy, "internal" = 7.6kb of random background
    fake = LTRRecord(start=starts[0], end=starts[1] + len(tir_te),
                     lltr_start=starts[0], lltr_end=starts[0] + len(tir_te),
                     rltr_start=starts[1], rltr_end=starts[1] + len(tir_te),
                     identity=0.99, insert_time=0.0)
    kept, pools = cross_class_filter(genome, [fake], cfg)
    assert kept == []
    assert len(pools.get("tir", [])) == 1
    assert abs(len(pools["tir"][0]) - len(tir_te)) <= 10


def test_cross_class_filter_keeps_real_ltr(ltr_scene):
    from hite_tpu.pipeline.ltr_deep import cross_class_filter

    genome, cfg, starts, el_len = ltr_scene
    rec = LTRRecord(start=starts[0], end=starts[0] + el_len,
                    lltr_start=starts[0], lltr_end=starts[0] + 250,
                    rltr_start=starts[0] + el_len - 250,
                    rltr_end=starts[0] + el_len, identity=1.0,
                    insert_time=0.0)
    kept, pools = cross_class_filter(genome, [rec], cfg)
    assert len(kept) == 1 and not pools
