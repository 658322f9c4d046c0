"""Brute-force matcher tests (parity with features.cu:165-304 semantics)."""

import numpy as np
import jax.numpy as jnp

from popsift_tpu.ops.match import match_brute_force_jit


def test_exact_match_accepted():
    rng = np.random.default_rng(0)
    r = rng.random((20, 128)).astype(np.float32)
    l = r[[3, 7, 11]] + 0.001  # near-exact copies
    best, second, accept, d1, d2 = match_brute_force_jit(
        jnp.asarray(l), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(best), [3, 7, 11])
    assert np.all(np.asarray(accept))


def test_ambiguous_match_rejected():
    rng = np.random.default_rng(1)
    base = rng.random(128).astype(np.float32)
    r = np.stack([base + 0.01, base + 0.011, rng.random(128)]).astype(
        np.float32)
    l = base[None]
    best, second, accept, d1, d2 = match_brute_force_jit(
        jnp.asarray(l), jnp.asarray(r))
    # two near-identical right candidates -> ratio test fails
    assert not bool(accept[0])


def test_second_best_distinct():
    rng = np.random.default_rng(2)
    l = rng.random((5, 128)).astype(np.float32)
    r = rng.random((9, 128)).astype(np.float32)
    best, second, accept, d1, d2 = match_brute_force_jit(
        jnp.asarray(l), jnp.asarray(r))
    assert np.all(np.asarray(best) != np.asarray(second))
    assert np.all(np.asarray(d1) <= np.asarray(d2))


def test_invalid_right_columns_excluded():
    rng = np.random.default_rng(3)
    r = rng.random((6, 128)).astype(np.float32)
    l = r[[5]]
    r_valid = jnp.asarray([True] * 5 + [False])
    best, second, accept, d1, d2 = match_brute_force_jit(
        jnp.asarray(l), jnp.asarray(r), None, r_valid)
    assert int(best[0]) != 5
