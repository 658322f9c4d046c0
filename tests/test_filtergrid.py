"""Grid-filter tests: budget enforcement + scale ordering."""

import numpy as np
import jax.numpy as jnp
import pytest

from popsift_tpu.config import Config, GridFilterMode
from popsift_tpu.ops.extrema import InitialExtrema
from popsift_tpu.ops.filtergrid import grid_filter_keep_masks, recompact


def make_ext(cells, sigmas, cap=16):
    n = len(cells)
    pad = cap - n
    return InitialExtrema(
        xpos=jnp.asarray(np.pad(np.arange(n, dtype=np.float32), (0, pad))),
        ypos=jnp.zeros(cap, jnp.float32),
        lpos=jnp.ones(cap, jnp.int32),
        sigma=jnp.asarray(np.pad(np.asarray(sigmas, np.float32), (0, pad))),
        cell=jnp.asarray(np.pad(np.asarray(cells, np.int32), (0, pad))),
        valid=jnp.asarray([True] * n + [False] * pad),
        count=jnp.int32(n),
        overflow=jnp.int32(0),
    )


def test_no_trigger_below_budget():
    e = make_ext([0, 1, 2, 3], [1, 1, 1, 1])
    keeps = grid_filter_keep_masks([e], budget=10, grid_size=2,
                                   mode=GridFilterMode.RANDOM_SCALE)
    np.testing.assert_array_equal(np.asarray(keeps[0][:4]), True)


def test_budget_enforced():
    # 12 extrema all in cell 0, budget 4 (well under 12/1.1)
    e = make_ext([0] * 12, list(range(12)))
    keeps = grid_filter_keep_masks([e], budget=4, grid_size=2,
                                   mode=GridFilterMode.RANDOM_SCALE)
    kept = int(np.asarray(keeps[0]).sum())
    assert kept <= 6  # newlimit lands within rounding slack of the budget
    assert kept >= 3


def test_scale_ordering_down_keeps_largest():
    e = make_ext([0] * 8, [1, 8, 2, 7, 3, 6, 4, 5])
    keeps = grid_filter_keep_masks([e], budget=3, grid_size=2,
                                   mode=GridFilterMode.LARGEST_SCALE_FIRST)
    kept_sigma = np.asarray(e.sigma)[np.asarray(keeps[0])]
    dropped_sigma = np.asarray(e.sigma[:8])[~np.asarray(keeps[0][:8])]
    assert kept_sigma.min() > dropped_sigma.max()


def test_scale_ordering_up_keeps_smallest():
    e = make_ext([0] * 8, [1, 8, 2, 7, 3, 6, 4, 5])
    keeps = grid_filter_keep_masks([e], budget=3, grid_size=2,
                                   mode=GridFilterMode.SMALLEST_SCALE_FIRST)
    kept_sigma = np.asarray(e.sigma)[np.asarray(keeps[0])]
    dropped_sigma = np.asarray(e.sigma[:8])[~np.asarray(keeps[0][:8])]
    assert kept_sigma.max() < dropped_sigma.min()


def test_balanced_cells_share_budget():
    # 8 in cell 0, 8 in cell 3
    e = make_ext([0] * 8 + [3] * 8, [1] * 16, cap=20)
    keeps = grid_filter_keep_masks([e], budget=8, grid_size=2,
                                   mode=GridFilterMode.RANDOM_SCALE)
    k = np.asarray(keeps[0])
    kept0 = k[:8].sum()
    kept3 = k[8:16].sum()
    assert kept0 == kept3  # symmetric cells keep the same count


def test_recompact():
    e = make_ext([0, 1, 2, 3], [1, 2, 3, 4], cap=8)
    keep = jnp.asarray([True, False, True, False] + [False] * 4)
    out = recompact(e, keep)
    assert int(out.count) == 2
    np.testing.assert_allclose(np.asarray(out.sigma[:2]), [1, 3])
    np.testing.assert_array_equal(np.asarray(out.valid[:3]),
                                  [True, True, False])


def test_end_to_end_filter(textured_image):
    from popsift_tpu.extract import get_extractor, normalize_input
    h, w = textured_image.shape
    cfg_all = Config()
    fn_all, _ = get_extractor(cfg_all, w, h)
    res_all = fn_all(normalize_input(textured_image))
    total_all = sum(int(od["count"]) for od in res_all["octaves"])
    assert total_all > 10

    budget = max(4, total_all // 3)
    cfg = Config()
    cfg.set_filter_max_extrema(budget)
    fn, _ = get_extractor(cfg, w, h)
    res = fn(normalize_input(textured_image))
    total = sum(int(od["count"]) for od in res["octaves"])
    assert total < total_all
    # within the reference's rounding slack (n cells over-keep at most)
    assert total <= budget + cfg.filter_grid_size ** 2 + 1
