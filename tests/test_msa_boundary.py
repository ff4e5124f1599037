"""Anchor-projection MSA + homology boundary adjudication tests."""

import numpy as np
import jax.numpy as jnp

from hite_tpu.ops.msa import project_to_center
from hite_tpu.ops.boundary import (
    adaptive_threshold, column_stats, consensus, row_tsd_votes, search_boundary,
)


def make_family(rng, te_len=600, flank=100, n_copies=20, mut=0.02,
                tsd=None, indel=True):
    te = rng.integers(0, 4, te_len).astype(np.uint8)
    center = np.concatenate([
        rng.integers(0, 4, flank), te, rng.integers(0, 4, flank)
    ]).astype(np.uint8)
    copies = []
    for c in range(n_copies):
        body = te.copy()
        muts = rng.random(te_len) < mut
        body[muts] = (body[muts] + rng.integers(1, 4, muts.sum())) % 4
        if indel and c % 3 == 0:
            pos = int(rng.integers(100, te_len - 100))
            body = np.delete(body, slice(pos, pos + int(rng.integers(1, 6))))
        if tsd is not None:
            t = rng.integers(0, 4, tsd).astype(np.uint8)
            lf = np.concatenate([rng.integers(0, 4, flank - tsd), t])
            rf = np.concatenate([t, rng.integers(0, 4, flank - tsd)])
        else:
            lf = rng.integers(0, 4, flank)
            rf = rng.integers(0, 4, flank)
        copies.append(np.concatenate([lf, body, rf]).astype(np.uint8))
    L = max(len(c) for c in copies)
    mat = np.full((n_copies, L), 4, np.uint8)
    lens = np.zeros(n_copies, np.int32)
    for i, c in enumerate(copies):
        mat[i, : len(c)] = c
        lens[i] = len(c)
    return center, te, mat, lens


def test_projection_recovers_te_columns():
    rng = np.random.default_rng(0)
    center, te, copies, lens = make_family(rng)
    M = np.asarray(project_to_center(jnp.asarray(center), jnp.asarray(copies),
                                     jnp.asarray(lens)))
    flank = 100
    te_cols = M[:, flank : flank + len(te)]
    agree = (te_cols == center[flank : flank + len(te)][None]).mean()
    assert agree > 0.9, agree
    # flank columns are unrelated context: ~25% agreement
    flank_cols = M[:, :flank - 5]
    match = (flank_cols == center[: flank - 5][None])
    nongap = flank_cols < 4
    assert (match & nongap).sum() / max(nongap.sum(), 1) < 0.45


def test_boundary_search_finds_element_ends():
    rng = np.random.default_rng(1)
    center, te, copies, lens = make_family(rng)
    M = project_to_center(jnp.asarray(center), jnp.asarray(copies),
                          jnp.asarray(lens))
    thr = adaptive_threshold(jnp.int32(copies.shape[0]))
    stats = column_stats(M, thr)
    left = search_boundary(stats.homo, jnp.int32(100), side="left")
    right = search_boundary(stats.homo, jnp.int32(100 + len(te)), side="right")
    assert bool(left.found) and bool(right.found)
    assert abs(int(left.pos) - 100) <= 6, int(left.pos)
    assert abs(int(right.pos) - 700) <= 6, int(right.pos)


def test_boundary_rejects_all_homologous():
    # homology continuing past the anchor on both sides -> false positive
    homo = jnp.ones(400, jnp.bool_)
    call = search_boundary(homo, jnp.int32(100), side="left")
    assert not bool(call.found)


def test_consensus_majority():
    rng = np.random.default_rng(2)
    center, te, copies, lens = make_family(rng, mut=0.05, indel=False)
    M = project_to_center(jnp.asarray(center), jnp.asarray(copies),
                          jnp.asarray(lens))
    cons, support = consensus(M)
    cons = np.asarray(cons)
    te_match = (cons[100:700] == te).mean()
    assert te_match > 0.97, te_match


def test_row_tsd_votes():
    rng = np.random.default_rng(3)
    center, te, copies, lens = make_family(rng, tsd=5, indel=False)
    M = project_to_center(jnp.asarray(center), jnp.asarray(copies),
                          jnp.asarray(lens))
    votes = np.asarray(row_tsd_votes(M, jnp.int32(100), jnp.int32(700),
                                     sizes=(5, 8)))
    assert votes[0] >= copies.shape[0] // 2, votes
    # size-8 TSDs were not planted
    assert votes[1] < votes[0]
