"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.config import Config
from popsift_tpu.ops.match import match_brute_force_jit
from popsift_tpu.parallel.batch import (batched_extractor, make_mesh,
                                        sharded_match, sfm_frontend_step)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    return make_mesh(data=4, model=2)


def _images(batch, h=48, w=64):
    rng = np.random.default_rng(0)
    imgs = []
    for b in range(batch):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w), np.float32)
        for (cx, cy, s) in [(20 + b, 16, 2.5), (44 - b, 32, 3.5)]:
            img += np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * s * s)))
        imgs.append(np.clip(img, 0, 1))
    return np.stack(imgs)


def test_batched_extract_matches_single(mesh):
    imgs = _images(4)
    cfg = Config()
    fn, plan = batched_extractor(cfg, 64, 48, mesh)
    res = fn(jnp.asarray(imgs))
    counts = np.asarray(
        sum(od["count"] for od in res["octaves"]))
    assert counts.shape == (4,)
    assert np.all(counts >= 1)

    # single-image pipeline agrees with the batched one
    from popsift_tpu.extract import get_extractor
    single_fn, _ = get_extractor(cfg, 64, 48)
    single = single_fn(jnp.asarray(imgs[0]))
    single_count = sum(int(od["count"]) for od in single["octaves"])
    assert int(counts[0]) == single_count


def test_sharded_match_equals_dense(mesh):
    rng = np.random.default_rng(1)
    l = rng.random((32, 128)).astype(np.float32)
    r = rng.random((16, 128)).astype(np.float32)
    rv = np.ones(16, bool)

    matcher = sharded_match(mesh)
    g1i, g2i, acc, g1v, g2v = matcher(
        jnp.asarray(l), jnp.asarray(r), jnp.asarray(rv))

    b, s, a, d1, d2 = match_brute_force_jit(jnp.asarray(l), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(g1i), np.asarray(b))
    np.testing.assert_allclose(np.asarray(g1v), np.asarray(d1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2v), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(a))


def test_sfm_frontend_step_compiles_and_runs(mesh):
    imgs = _images(4)
    cfg = Config()
    step, plan = sfm_frontend_step(cfg, 64, 48, mesh, desc_cap=256)
    out = step(jnp.asarray(imgs))
    assert out["desc"].shape[0] == 4
    assert out["match_counts"].shape == (3,)
    # identical-ish consecutive images should produce some matches
    assert int(np.asarray(out["match_counts"]).sum()) >= 0


def test_sfm_frontend_uneven_batch(mesh):
    """pad_batch + img_valid: padded frames yield no descriptors and no
    matches, and real frames' results equal the even-batch run."""
    from popsift_tpu.parallel.batch import pad_batch

    cfg = Config()
    imgs3 = _images(3)
    padded, valid = pad_batch(imgs3, mesh)
    assert padded.shape[0] == 4 and list(valid) == [True] * 3 + [False]

    step, _ = sfm_frontend_step(cfg, 64, 48, mesh, desc_cap=256)
    out = step(jnp.asarray(padded), jnp.asarray(valid))
    # the padded frame has no valid descriptors
    assert int(np.asarray(out["desc_valid"][3]).sum()) == 0
    # match 2->3 involves the padded frame: zero matches
    assert int(np.asarray(out["match_counts"][2])) == 0

    # real frames match the even-batch reference run
    imgs4 = _images(4)
    ref = step(jnp.asarray(imgs4), jnp.ones((4,), bool))
    np.testing.assert_array_equal(
        np.asarray(out["desc_valid"][:3]), np.asarray(ref["desc_valid"][:3]))
    np.testing.assert_array_equal(
        np.asarray(out["match_counts"][:2]),
        np.asarray(ref["match_counts"][:2]))
