"""Descriptor extraction tests: invariants + numpy golden reference for the
loop-family trilinear binning."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.constants import build_const_info, M_PI2, M_4RPI
from popsift_tpu.config import Config
from popsift_tpu.ops import descriptors as D
from popsift_tpu.ops import gradients as G


def np_loop_descriptor(mag, theta, x, y, sigma, ang, w, h):
    """Straight-line numpy port of the loop-mode math
    (s_desc_loop.cu:18-139) for golden comparison."""
    sbp = abs(3.0 * sigma)
    cos_t, sin_t = math.cos(ang), math.sin(ang)
    desc = np.zeros((4, 4, 8), np.float64)
    rad = int(math.ceil(2.5 * math.sqrt(2) * sbp)) + 2
    cx, cy = int(round(x)), int(round(y))
    for ii in range(max(1, cy - rad), min(h - 2, cy + rad) + 1):
        for jj in range(max(1, cx - rad), min(w - 2, cx + rad) + 1):
            dx, dy = jj - x, ii - y
            ux = (cos_t * dx + sin_t * dy) / sbp
            uy = (cos_t * dy - sin_t * dx) / sbp
            ww = math.exp(-(ux * ux + uy * uy) / 8.0)
            m = mag[ii, jj]
            th = theta[ii, jj] - ang
            while th < 0:
                th += M_PI2
            while th >= M_PI2:
                th -= M_PI2
            tth = th * M_4RPI
            fo = int(math.floor(tth))
            do0 = tth - fo
            for ty in range(4):
                wy = 1.0 - abs(uy - (ty - 1.5))
                if wy <= 0:
                    continue
                for tx in range(4):
                    wx = 1.0 - abs(ux - (tx - 1.5))
                    if wx <= 0:
                        continue
                    wgt = ww * wx * wy * m
                    desc[ty, tx, fo % 8] += (1 - do0) * wgt
                    desc[ty, tx, (fo + 1) % 8] += do0 * wgt
    return desc.reshape(128).astype(np.float32)


@pytest.fixture(scope="module")
def texture():
    rng = np.random.default_rng(7)
    img = rng.random((64, 80)).astype(np.float32) * 100
    for _ in range(3):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    return img


def _loop_desc(texture, x, y, sigma, ang):
    h, w = texture.shape
    stack = jnp.asarray(texture[None])
    mag, theta = G.gradient_fields(stack)
    win = D.desc_window_size(1.6, 3)
    from popsift_tpu.kernels.windows import aligned_window_dims
    pad_y, pad_x = aligned_window_dims(win)
    field = G.padded_gradient_field(stack, pad_y, pad_x)
    f = jax.jit(lambda fld: D.loop_descriptors(
        fld, pad_y, pad_x,
        jnp.asarray([x], jnp.float32), jnp.asarray([y], jnp.float32),
        jnp.asarray([0], jnp.int32), jnp.asarray([sigma], jnp.float32),
        jnp.asarray([ang], jnp.float32), jnp.asarray([True]),
        w, h, win))
    return np.asarray(f(field))[0], np.asarray(mag)[0], \
        np.asarray(theta)[0]


def test_loop_descriptor_matches_numpy_golden(texture):
    h, w = texture.shape
    for (x, y, sigma, ang) in [(40.3, 30.7, 1.6, 0.0),
                               (35.0, 25.0, 2.2, 0.9),
                               (50.5, 40.1, 1.2, -2.0)]:
        got, mag, theta = _loop_desc(texture, x, y, sigma, ang)
        want = np_loop_descriptor(mag, theta, x, y, sigma, ang, w, h)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_loop_descriptor_invalid_slot_zero(texture):
    h, w = texture.shape
    stack = jnp.asarray(texture[None])
    win = D.desc_window_size(1.6, 3)
    from popsift_tpu.kernels.windows import aligned_window_dims
    pad_y, pad_x = aligned_window_dims(win)
    field = G.padded_gradient_field(stack, pad_y, pad_x)
    out = D.loop_descriptors(
        field, pad_y, pad_x, jnp.asarray([40.0]), jnp.asarray([30.0]),
        jnp.asarray([0]), jnp.asarray([1.6]), jnp.asarray([0.0]),
        jnp.asarray([False]), w, h, win)
    assert float(jnp.abs(out).sum()) == 0.0


def test_grid_descriptor_runs_and_nonzero(texture):
    cfg = Config()
    consts = build_const_info(cfg)
    h, w = texture.shape
    stack = jnp.asarray(texture[None])
    f = jax.jit(lambda s: D.grid_descriptors(
        s, jnp.asarray([40.0]), jnp.asarray([30.0]), jnp.asarray([0]),
        jnp.asarray([1.6]), jnp.asarray([0.5]), jnp.asarray([True]),
        consts.desc_gauss, consts.desc_tile))
    out = np.asarray(f(stack))
    assert out.shape == (1, 128)
    assert np.abs(out).sum() > 0
    assert np.all(out >= 0)


def test_rotation_covariance_loop(texture):
    """Rotating the query angle by 90 deg on a 90-deg-rotated image gives
    (nearly) the same descriptor."""
    h, w = texture.shape
    # use a square central crop rotated by 90 degrees
    crop = texture[:64, 8:72]
    rot = np.rot90(crop, k=-1).copy()  # clockwise
    x, y, sigma = 30.0, 30.0, 1.8

    d0, _, _ = _loop_desc(crop, x, y, sigma, 0.0)
    # point (x,y) maps to (63-y, x) under clockwise rot90; gradients rotate
    # by +90deg
    d1, _, _ = _loop_desc(rot, 63.0 - y, x, sigma, math.pi / 2)
    # compare after normalisation (boundary effects are small but nonzero)
    d0 = d0 / (np.linalg.norm(d0) + 1e-9)
    d1 = d1 / (np.linalg.norm(d1) + 1e-9)
    assert np.dot(d0, d1) > 0.98


def test_normalize_rootsift():
    rng = np.random.default_rng(0)
    d = jnp.asarray(np.abs(rng.random((3, 128))).astype(np.float32))
    valid = jnp.asarray([True, True, False])
    out = np.asarray(D.normalize_rootsift(d, 0, valid))
    # unit L2 after rootsift (sqrt of L1-normalised)
    np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[1]), 1.0, rtol=1e-5)
    assert np.all(out[2] == 0.0)
    # norm multiplier scales by 2^9
    out9 = np.asarray(D.normalize_rootsift(d, 9, valid))
    np.testing.assert_allclose(np.linalg.norm(out9[0]), 512.0, rtol=1e-4)


def test_normalize_l2_clamps():
    d = np.zeros((1, 128), np.float32)
    d[0, 0] = 10.0
    d[0, 1:] = 0.1
    out = np.asarray(D.normalize_l2(jnp.asarray(d), 0,
                                    jnp.asarray([True])))
    # after clamping at 0.2*norm, renormalised to unit L2
    np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-5)
    assert out[0, 0] < 10.0 * 0.2  # the spike was clamped


def test_desc_window_size_reasonable():
    win = D.desc_window_size(1.6, 3)
    # must cover 2*2.5*sqrt(2)*3*sigma_max
    assert win >= 2.5 * math.sqrt(2) * 2 * 3 * 1.6 * 2 ** (5 / 3)
    assert win % 8 == 0
