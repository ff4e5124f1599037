"""Property/oracle tests: kernels vs brute-force NumPy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.ops.terminal import batched_local_align
from hite_tpu.utils import intervals as iv


def brute_sw(a, b, match=2, mismatch=-3, gap=4):
    """Reference Smith-Waterman score (no traceback)."""
    La, Lb = len(a), len(b)
    H = np.zeros((La + 1, Lb + 1), np.int64)
    best = 0
    for i in range(1, La + 1):
        for j in range(1, Lb + 1):
            sub = match if (a[i - 1] == b[j - 1] and a[i - 1] < 4 and
                            b[j - 1] < 4) else mismatch
            H[i, j] = max(0, H[i - 1, j - 1] + sub,
                          H[i - 1, j] - gap, H[i, j - 1] - gap)
            best = max(best, H[i, j])
    return best


@pytest.mark.parametrize("seed", range(6))
def test_sw_score_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    La, Lb = 40, 50
    a = rng.integers(0, 4, La).astype(np.uint8)
    b = rng.integers(0, 4, Lb).astype(np.uint8)
    if seed % 2 == 0:  # plant some homology
        core = rng.integers(0, 4, 15).astype(np.uint8)
        a[10:25] = core
        b[20:35] = core
    al = batched_local_align(jnp.asarray(a[None]), jnp.asarray(b[None]))
    assert int(al.score[0]) == brute_sw(a, b)


@pytest.mark.parametrize("seed", range(8))
def test_coverage_fraction_matches_bruteforce(seed):
    rng = np.random.default_rng(100 + seed)
    n_t, n_c = rng.integers(1, 20), rng.integers(0, 20)
    targets = np.sort(rng.integers(0, 1000, (n_t, 2)), axis=1)
    targets[:, 1] += 1
    cover = np.sort(rng.integers(0, 1000, (n_c, 2)), axis=1)
    cover[:, 1] += 1
    got = iv.coverage_fraction(targets, cover)
    # brute force with a basepair bitmap
    bitmap = np.zeros(2001, bool)
    for s, e in cover:
        bitmap[s:e] = True
    for t, (s, e) in enumerate(targets):
        expect = bitmap[s:e].mean()
        assert abs(got[t] - expect) < 1e-9, (t, got[t], expect)


@pytest.mark.parametrize("seed", range(8))
def test_merge_matches_bruteforce(seed):
    rng = np.random.default_rng(200 + seed)
    n = rng.integers(1, 30)
    ivs = np.sort(rng.integers(0, 500, (n, 2)), axis=1)
    ivs[:, 1] += 1
    merged = iv.merge(ivs)
    # brute force
    bitmap = np.zeros(502, bool)
    for s, e in ivs:
        bitmap[s:e] = True
    assert iv.total_length(merged) == int(bitmap.sum())
    # merged intervals are disjoint + sorted
    assert (merged[1:, 0] > merged[:-1, 1]).all() if len(merged) > 1 else True


def test_native_merge_matches_python():
    from hite_tpu.native import runtime

    if not runtime.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(7)
    ivs = np.sort(rng.integers(0, 500, (40, 2)), axis=1)
    ivs[:, 1] += 1
    a = iv.merge(ivs)
    b = runtime.merge_intervals(ivs)
    assert np.array_equal(a, b)
