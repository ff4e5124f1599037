"""Pallas SW kernel parity vs the JAX reference implementation (interpret
mode on CPU; the real kernel runs on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.ops.terminal import batched_local_align
from hite_tpu.ops.terminal_pallas import batched_local_align_pallas


@pytest.mark.parametrize("seed", range(4))
def test_pallas_sw_matches_jax(seed):
    rng = np.random.default_rng(seed)
    B, La, Lb = 4, 60, 70
    a = rng.integers(0, 4, (B, La)).astype(np.uint8)
    b = rng.integers(0, 4, (B, Lb)).astype(np.uint8)
    # plant homology in half the rows
    for r in range(0, B, 2):
        core = rng.integers(0, 4, 25).astype(np.uint8)
        a[r, 10:35] = core
        b[r, 30:55] = core
    ref = batched_local_align(jnp.asarray(a), jnp.asarray(b))
    got = batched_local_align_pallas(jnp.asarray(a), jnp.asarray(b),
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(got.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(got.matches),
                                  np.asarray(ref.matches))
    np.testing.assert_array_equal(np.asarray(got.alen), np.asarray(ref.alen))
    np.testing.assert_array_equal(np.asarray(got.qs), np.asarray(ref.qs))
    np.testing.assert_array_equal(np.asarray(got.qe), np.asarray(ref.qe))
    np.testing.assert_array_equal(np.asarray(got.ss), np.asarray(ref.ss))
    np.testing.assert_array_equal(np.asarray(got.se), np.asarray(ref.se))


def test_pallas_sw_with_n_bases():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, (2, 40)).astype(np.uint8)
    b = a.copy()
    a[0, 15:20] = 4   # N block
    ref = batched_local_align(jnp.asarray(a), jnp.asarray(b))
    got = batched_local_align_pallas(jnp.asarray(a), jnp.asarray(b),
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(got.score), np.asarray(ref.score))
