"""Randomized fuzzing of the interval algebra against brute-force oracles.

ROADMAP quality item: the interval/cluster code underpins candidate dedup,
annotation merging and the BM_HiTE evaluator, so it is verified here against
O(N * genome) bitmap oracles on many random inputs.
"""

import numpy as np
import pytest

from hite_tpu.utils import intervals as iv

SPAN = 2_000


def _rand_intervals(rng, n, span=SPAN, max_len=120):
    s = rng.integers(0, span - 1, size=n)
    l = rng.integers(1, max_len, size=n)
    return np.stack([s, np.minimum(s + l, span)], axis=1).astype(np.int64)


def _bitmap(ivs, span=SPAN):
    m = np.zeros(span, dtype=bool)
    for a, b in ivs:
        m[a:b] = True
    return m


@pytest.mark.parametrize("seed", range(20))
def test_merge_matches_bitmap(seed):
    rng = np.random.default_rng(seed)
    ivs = _rand_intervals(rng, int(rng.integers(1, 60)))
    merged = iv.merge(ivs)
    # same covered set
    assert (_bitmap(merged) == _bitmap(ivs)).all()
    # disjoint, sorted, non-adjacent
    assert (merged[:, 1] > merged[:, 0]).all()
    if len(merged) > 1:
        assert (merged[1:, 0] > merged[:-1, 1]).all()


@pytest.mark.parametrize("seed", range(10))
def test_merge_gap_matches_bitmap_dilation(seed):
    rng = np.random.default_rng(100 + seed)
    ivs = _rand_intervals(rng, int(rng.integers(1, 40)))
    gap = int(rng.integers(1, 50))
    merged = iv.merge(ivs, gap=gap)
    # oracle: greedy over sorted intervals
    order = np.argsort(ivs[:, 0])
    exp = []
    for a, b in ivs[order]:
        if exp and a <= exp[-1][1] + gap:
            exp[-1][1] = max(exp[-1][1], b)
        else:
            exp.append([a, b])
    assert merged.tolist() == exp


@pytest.mark.parametrize("seed", range(20))
def test_total_length_matches_bitmap(seed):
    rng = np.random.default_rng(200 + seed)
    ivs = _rand_intervals(rng, int(rng.integers(1, 80)))
    assert iv.total_length(ivs) == int(_bitmap(ivs).sum())


@pytest.mark.parametrize("seed", range(20))
def test_coverage_fraction_matches_bitmap(seed):
    rng = np.random.default_rng(300 + seed)
    targets = _rand_intervals(rng, int(rng.integers(1, 30)))
    by = _rand_intervals(rng, int(rng.integers(0, 40)))
    got = iv.coverage_fraction(targets, by)
    bm = _bitmap(by)
    for t, (a, b) in enumerate(targets):
        exp = bm[a:b].sum() / max(b - a, 1)
        assert got[t] == pytest.approx(exp), (a, b)


@pytest.mark.parametrize("seed", range(10))
def test_dedup_rounding_oracle(seed):
    rng = np.random.default_rng(400 + seed)
    ivs = _rand_intervals(rng, int(rng.integers(1, 60)))
    q = int(rng.integers(1, 20))
    kept, keep_idx = iv.dedup(ivs, q=q)
    # oracle: first occurrence of each rounded tuple survives
    seen = set()
    exp_idx = []
    rounded = ((ivs + q // 2) // q * q)
    for i, r in enumerate(map(tuple, rounded)):
        if r not in seen:
            seen.add(r)
            exp_idx.append(i)
    assert keep_idx.tolist() == exp_idx
    assert (kept == ivs[exp_idx]).all()


def _oracle_groups(ivs, frac):
    """Brute-force union-find over ALL pairs (no sorted early-exit)."""
    n = len(ivs)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(n):
            ov = min(ivs[i, 1], ivs[j, 1]) - max(ivs[i, 0], ivs[j, 0])
            li = ivs[i, 1] - ivs[i, 0]
            lj = ivs[j, 1] - ivs[j, 0]
            if ov >= frac * li and ov >= frac * lj:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    return [find(i) for i in range(n)]


@pytest.mark.parametrize("seed", range(10))
def test_mutual_overlap_groups_match_bruteforce(seed):
    rng = np.random.default_rng(500 + seed)
    # overlapping clusters: draw centers, jitter copies around them
    centers = rng.integers(0, SPAN, size=int(rng.integers(1, 8)))
    rows = []
    for c in centers:
        ln = int(rng.integers(40, 200))
        for _ in range(int(rng.integers(1, 5))):
            j = int(rng.integers(-3, 4))
            rows.append((c + j, c + ln + int(rng.integers(-3, 4))))
    ivs = np.array(rows, dtype=np.int64)
    ivs = ivs[ivs[:, 1] > ivs[:, 0]]
    got = iv.mutual_overlap_groups(ivs, frac=0.95)
    exp = _oracle_groups(ivs, 0.95)
    # same partition (labels may differ)
    got_part = {}
    exp_part = {}
    for i, (g, e) in enumerate(zip(got, exp)):
        got_part.setdefault(g, set()).add(i)
        exp_part.setdefault(e, set()).add(i)
    assert sorted(map(sorted, got_part.values())) == \
        sorted(map(sorted, exp_part.values()))
