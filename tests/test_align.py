"""Alignment engine tests: seed matching, HSP runs, FMEA chains, coarse discovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome, synthetic_genome
from hite_tpu.io.fasta import encode_seq, decode_seq
from hite_tpu.ops import encode as enc
from hite_tpu.ops.kmer import build_index, lookup
from hite_tpu.ops.seedext import pair_hsps
from hite_tpu.ops.chain import chain_hsps
from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover
from hite_tpu.utils import intervals as iv


def test_kmer_index_lookup():
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, size=500).astype(np.uint8)
    k = 8
    idx = build_index(jnp.asarray(seq), k)
    km = np.asarray(enc.kmer_codes(jnp.asarray(seq), k))
    # every kmer must find its own position
    spos, valid = lookup(idx, jnp.asarray(km), max_hits=4)
    spos = np.asarray(spos)
    valid = np.asarray(valid)
    for i in range(len(km)):
        assert i in spos[i][valid[i]]


def test_pair_hsps_finds_shared_repeat():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, size=2000).astype(np.uint8)
    b = rng.integers(0, 4, size=2000).astype(np.uint8)
    repeat = rng.integers(0, 4, size=300).astype(np.uint8)
    a[500:800] = repeat
    b[1200:1500] = repeat
    k = 12
    q_km = enc.kmer_codes(jnp.asarray(a), k)
    idx = build_index(jnp.asarray(b), k)
    h = pair_hsps(q_km, idx, k=k, stride=1, max_hits=4, diag_band=32,
                  run_gap=64, min_seeds=4, min_hsp_len=30, max_hsps=64)
    qs = np.asarray(h.qs)[np.asarray(h.valid)]
    qe = np.asarray(h.qe)[np.asarray(h.valid)]
    ss = np.asarray(h.ss)[np.asarray(h.valid)]
    assert len(qs) >= 1
    # the HSP should cover most of the planted repeat on both sides
    best = np.argmax(qe - qs)
    assert qs[best] <= 520 and qe[best] >= 780
    assert abs(ss[best] - 1200) < 40


def test_chain_merges_split_hsps():
    from hite_tpu.ops.seedext import HSPs
    # two HSPs separated by a 500bp gap on both axes -> one chain at T=1000
    hsps = HSPs(
        qs=jnp.array([100, 900, 0, 0], jnp.int32),
        qe=jnp.array([400, 1200, 0, 0], jnp.int32),
        ss=jnp.array([5100, 5900, 0, 0], jnp.int32),
        se=jnp.array([5400, 6200, 0, 0], jnp.int32),
        nseeds=jnp.array([50, 40, 0, 0], jnp.int32),
        valid=jnp.array([True, True, False, False]),
    )
    ch = chain_hsps(hsps, extend_threshold=1000, max_chains=8, min_len=80)
    v = np.asarray(ch.valid)
    assert v.sum() == 1
    assert np.asarray(ch.qs)[0] == 100 and np.asarray(ch.qe)[0] == 1200
    assert np.asarray(ch.ss)[0] == 5100 and np.asarray(ch.se)[0] == 6200
    # with a tight threshold they stay separate
    ch2 = chain_hsps(hsps, extend_threshold=100, max_chains=8, min_len=80)
    assert np.asarray(ch2.valid).sum() == 2


def test_coarse_discover_synthetic():
    te = "".join("ACGT"[i % 4] for i in range(0))  # placeholder
    rng = np.random.default_rng(7)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, size=600))
    genome, ins = synthetic_genome(80_000, [te], [6], seed=3, mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    params = CoarseParams(seg_len=16_384, pair_batch=8, stride=2)
    cands = coarse_discover(genome, cfg, params)
    assert len(cands) >= 1
    # each planted copy should be covered >= 80% by some candidate
    planted = np.array([[s, e] for _, s, e in ins])
    cov = iv.coverage_fraction(planted, cands)
    assert (cov > 0.8).all(), cov
    # candidates should not hugely exceed planted copies (background is random)
    total_cand = iv.total_length(cands)
    total_te = iv.total_length(planted)
    assert total_cand < 3 * total_te + 2000
