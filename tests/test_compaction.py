"""Hierarchical mask compaction: equivalence with the naive reference
semantics + block-overflow behaviour."""

import numpy as np
import jax
import jax.numpy as jnp

from popsift_tpu.ops.extrema import compact_mask, _BLOCK, _PER_BLOCK


def naive(mask, cap):
    lin = np.nonzero(mask.reshape(-1))[0]
    kept = lin[:cap]
    return kept, len(lin)


def test_matches_naive_on_random_masks():
    rng = np.random.default_rng(0)
    for density in (0.0001, 0.001, 0.005):
        mask = rng.random((3, 64, 512)) < density
        cap = 256
        x, y, z, valid, count, overflow = jax.jit(
            lambda m: compact_mask(m, cap))(jnp.asarray(mask))
        kept, total = naive(mask, cap)
        got = (np.asarray(z) * 64 + np.asarray(y)) * 512 + np.asarray(x)
        n = int(count)
        assert n == min(total, cap)
        np.testing.assert_array_equal(got[:n], kept[:n])
        assert int(overflow) == total - n


def test_block_overflow_counted():
    # more than _PER_BLOCK survivors in one block: extras are dropped but
    # counted as overflow (capacity-clamp semantics)
    mask = np.zeros((1, 1, _BLOCK), bool)
    mask[0, 0, :: _BLOCK // (_PER_BLOCK + 4)] = True
    n_set = mask.sum()
    assert n_set > _PER_BLOCK
    x, y, z, valid, count, overflow = compact_mask(
        jnp.asarray(mask), 64)
    assert int(count) == _PER_BLOCK
    assert int(overflow) == n_set - _PER_BLOCK
    # the kept ones are the first in raster order
    np.testing.assert_array_equal(
        np.asarray(x)[:_PER_BLOCK],
        np.nonzero(mask[0, 0])[0][:_PER_BLOCK])


def test_empty_mask():
    mask = jnp.zeros((2, 16, 128), bool)
    x, y, z, valid, count, overflow = compact_mask(mask, 128)
    assert int(count) == 0
    assert int(overflow) == 0
    assert not bool(valid.any())


def test_cross_block_order():
    mask = np.zeros((1, 8, 2048), bool)  # spans multiple blocks
    pts = [(0, 5), (1, 100), (3, 1500), (7, 2000)]
    for yy, xx in pts:
        mask[0, yy, xx] = True
    x, y, z, valid, count, _ = compact_mask(jnp.asarray(mask), 16)
    assert int(count) == 4
    got = sorted(zip(np.asarray(y)[:4].tolist(),
                     np.asarray(x)[:4].tolist()))
    assert got == pts
