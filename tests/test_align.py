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


def test_selfjoin_hsps_finds_repeat_pairs():
    """Direct + inverted repeat pairs come out of the global self-join."""
    from hite_tpu.ops.selfjoin import selfjoin_hsps

    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, size=8192).astype(np.uint8)
    repeat = rng.integers(0, 4, size=400).astype(np.uint8)
    g[1000:1400] = repeat
    g[5000:5400] = repeat
    # inverted copy of an independent element
    elem = rng.integers(0, 4, size=300).astype(np.uint8)
    g[2000:2300] = elem
    g[6500:6800] = np.asarray(enc.revcomp(jnp.asarray(elem)))
    L = len(g)
    hs = selfjoin_hsps(jnp.asarray(g), k=12, window=4, diag_band=32,
                       run_gap=96, min_seeds=4, min_hsp_len=30,
                       max_hsps=256)
    valid = np.asarray(hs.valid)
    qs = np.asarray(hs.qs)[valid]
    qe = np.asarray(hs.qe)[valid]
    ss = np.asarray(hs.ss)[valid]
    se = np.asarray(hs.se)[valid]
    # forward pair: q in [1000,1400), s in [5000,5400) forward coords
    fwd = (ss < L)
    hit = (qs >= 980) & (qe <= 1420) & fwd & (ss >= 4980) & (se <= 5420)
    assert hit.any()
    assert (qe[hit].max() - qs[hit].min()) >= 300
    # inverted pair: subject in rc virtual space; map back
    rc = ~fwd
    fs = 2 * L - se[rc]
    fe = 2 * L - ss[rc]
    inv_hit = (qs[rc] >= 1980) & (qe[rc] <= 2320) & (fs >= 6480) & (fe <= 6820)
    assert inv_hit.any()


def test_selfjoin_masked_regions_do_not_seed():
    from hite_tpu.ops.selfjoin import selfjoin_hsps

    rng = np.random.default_rng(6)
    g = rng.integers(0, 4, size=4096).astype(np.uint8)
    repeat = rng.integers(0, 4, size=300).astype(np.uint8)
    g[500:800] = repeat
    g[2000:2300] = repeat
    g_masked = g.copy()
    g_masked[450:850] = 4   # N-mask the first copy
    hs = selfjoin_hsps(jnp.asarray(g_masked), k=12, window=4, diag_band=32,
                       run_gap=96, min_seeds=4, min_hsp_len=30, max_hsps=128)
    valid = np.asarray(hs.valid)
    qs = np.asarray(hs.qs)[valid]
    qe = np.asarray(hs.qe)[valid]
    # nothing may seed inside the masked window
    assert not ((qs < 850) & (qe > 450)).any()


def test_chain_hsps_host_interleaved_copies():
    """Interleaved subject copies chain independently (multi-open-chain)."""
    from hite_tpu.ops.chain import chain_hsps_host

    # one query region aligning to two subject copies, HSPs interleaved in
    # query order: (q0->sA, q0'->sB, q1->sA, q1'->sB)
    qs = np.array([100, 150, 600, 650])
    qe = np.array([400, 450, 900, 950])
    ss = np.array([10_000, 50_000, 10_500, 50_500])
    se = np.array([10_300, 50_300, 10_800, 50_800])
    chains = chain_hsps_host(qs, qe, ss, se, extend_threshold=1000,
                             min_len=80)
    assert len(chains) == 2
    chains = chains[np.argsort(chains[:, 2])]
    assert tuple(chains[0]) == (100, 900, 10_000, 10_800)
    assert tuple(chains[1]) == (150, 950, 50_000, 50_800)
    # tight threshold: nothing merges -> 4 chains
    chains2 = chain_hsps_host(qs, qe, ss, se, extend_threshold=50,
                              min_len=80)
    assert len(chains2) == 4


def test_coarse_selfjoin_matches_pairgrid_recall():
    rng = np.random.default_rng(11)
    te = "".join("ACGT"[c] for c in rng.integers(0, 4, size=700))
    genome, ins = synthetic_genome(80_000, [te], [6], seed=4,
                                   mutation_rate=0.03)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    planted = np.array([[s, e] for _, s, e in ins])
    cands = coarse_discover(
        genome, cfg, CoarseParams(strategy="selfjoin"), use_masked=False)
    cov = iv.coverage_fraction(planted, cands)
    assert (cov > 0.8).all(), cov
    total_cand = iv.total_length(cands)
    assert total_cand < 3 * iv.total_length(planted) + 2000


def test_selfjoin_budget_slices_equivalence():
    """Sliced scan section finds the same chains as one big budget.

    Runs split at slice borders re-merge during FMEA chaining, so the
    candidate intervals must match.
    """
    from hite_tpu.config import AlignConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover

    rng = np.random.default_rng(2)
    tes = ["".join("ACGT"[c] for c in rng.integers(0, 4, L))
           for L in (500, 1200)]
    genome, _ = synthetic_genome(120_000, tes, [12, 6], seed=7,
                                 mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    big = coarse_discover(genome, cfg, CoarseParams(max_seed_pairs=1 << 18))
    # small budget saturates -> adaptive retry with slices
    small = coarse_discover(
        genome, cfg, CoarseParams(max_seed_pairs=1 << 12,
                                  max_budget_slices=64))
    assert len(big) > 0
    # every "big" candidate is recovered (within dedup rounding slack)
    def key(iv):
        return {(int(s) // 20, int(e) // 20) for s, e in iv}
    missing = key(big) - key(small)
    assert not missing, (len(big), len(small), list(missing)[:5])


def test_selfjoin_chunked_equivalence():
    """Chunked selfjoin (large-genome path) finds the single-shot set."""
    from hite_tpu.config import AlignConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.coarse import CoarseParams, coarse_discover

    rng = np.random.default_rng(4)
    tes = ["".join("ACGT"[c] for c in rng.integers(0, 4, L))
           for L in (400, 900)]
    # copy density such that every chunk holds >=2 copies per family —
    # like the reference's 400MB chunks, copies that never share a chunk
    # cannot pair (chunk-local discovery, main.py:508-639)
    genome, _ = synthetic_genome(400_000, tes, [24, 14], seed=11,
                                 mutation_rate=0.02)
    cfg = AlignConfig(fixed_extend_base_threshold=2000)
    whole = coarse_discover(genome, cfg, CoarseParams())
    chunked = coarse_discover(
        genome, cfg, CoarseParams(max_selfjoin_bp=1 << 17),
        max_repeat_len=5_000)  # halo >> planted TE length
    assert len(whole) > 0
    # every whole-genome repeat locus must be >=90%-covered by a chunked
    # candidate (exact boundary variants differ: chunking changes which
    # copy pairs with which, and boundaries are re-derived by MSA anyway)
    for s, e in whole:
        cov = 0
        for cs, ce in chunked:
            cov = max(cov, min(e, ce) - max(s, cs))
        assert cov >= 0.9 * (e - s), (s, e, cov)
