"""Orientation assignment tests on synthetic gradient fields."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from popsift_tpu.ops import gradients as G
from popsift_tpu.ops import orientation as O


def test_gradient_fields_simple_ramp():
    # image with constant horizontal ramp -> dx = 2, dy = 0 (central diff)
    img = np.tile(np.arange(16, dtype=np.float32), (12, 1))
    stack = jnp.asarray(img[None])
    mag, theta = jax.jit(G.gradient_fields)(stack)
    mag = np.asarray(mag)[0]
    theta = np.asarray(theta)[0]
    np.testing.assert_allclose(mag[2:-2, 2:-2], 2.0, rtol=1e-6)
    np.testing.assert_allclose(theta[2:-2, 2:-2], 0.0, atol=1e-6)


def test_gradient_clamped_borders():
    img = np.tile(np.arange(8, dtype=np.float32), (8, 1))
    mag, _ = G.gradient_fields(jnp.asarray(img[None]))
    # border central difference uses the clamped edge pixel -> 1.0
    assert float(mag[0, 3, 0]) == 1.0


def _run_orientation(img, x, y, sigma=1.6):
    stack = jnp.asarray(img[None].astype(np.float32))
    win = O.ori_window_size(1.6, 3)
    from popsift_tpu.kernels.windows import aligned_window_dims
    pad_y, pad_x = aligned_window_dims(win)
    field = G.padded_gradient_field(stack, pad_y, pad_x)
    h, w = img.shape
    xp = jnp.asarray([x], jnp.float32)
    yp = jnp.asarray([y], jnp.float32)
    lp = jnp.asarray([0], jnp.int32)
    sg = jnp.asarray([sigma], jnp.float32)
    vd = jnp.asarray([True])
    f = jax.jit(lambda fld: O.assign_orientations(
        fld, pad_y, pad_x, xp, yp, lp, sg, vd, w, h, win))
    return f(field)


def test_dominant_orientation_of_ramp():
    """Image increasing along +x: gradient angle 0 => orientation near 0."""
    img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
    num, oris = _run_orientation(img, 32.0, 32.0)
    assert int(num[0]) >= 1
    assert abs(float(oris[0, 0])) < math.pi / 36 + 1e-3


def test_dominant_orientation_rotated():
    """Gradient along +y (image increases downwards): angle pi/2."""
    img = np.tile(np.arange(64, dtype=np.float32)[:, None], (1, 64))
    num, oris = _run_orientation(img, 32.0, 32.0)
    assert int(num[0]) >= 1
    assert abs(float(oris[0, 0]) - math.pi / 2) < math.pi / 36 + 1e-3


def test_diagonal_orientation():
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = xx + yy  # gradient (1,1) -> 45 deg
    num, oris = _run_orientation(img, 32.0, 32.0)
    assert int(num[0]) >= 1
    assert abs(float(oris[0, 0]) - math.pi / 4) < math.pi / 36 + 1e-3


def test_two_peaks_multiple_orientations():
    """Two quadrants with orthogonal gradients produce 2+ orientations."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.where(xx < 32, xx * 2.0, yy * 2.0).astype(np.float32)
    num, oris = _run_orientation(img, 32.0, 32.0, sigma=2.5)
    assert int(num[0]) >= 2


def test_invalid_slot_gets_zero():
    img = np.tile(np.arange(32, dtype=np.float32), (32, 1))
    stack = jnp.asarray(img[None])
    win = O.ori_window_size(1.6, 3)
    from popsift_tpu.kernels.windows import aligned_window_dims
    pad_y, pad_x = aligned_window_dims(win)
    field = G.padded_gradient_field(stack, pad_y, pad_x)
    num, oris = O.assign_orientations(
        field, pad_y, pad_x, jnp.asarray([16.0]), jnp.asarray([16.0]),
        jnp.asarray([0]), jnp.asarray([1.6]),
        jnp.asarray([False]), 32, 32, win)
    assert int(num[0]) == 0


def test_smoothing_circular():
    h = jnp.asarray(np.eye(1, 36, 0, dtype=np.float32))
    sm = np.asarray(O.smooth_histogram_vlfeat(h))[0]
    # mass is preserved and spread circularly (bin 35 and 1 equal)
    assert sm.sum() == np.float32(1.0) or abs(sm.sum() - 1.0) < 1e-5
    assert abs(sm[1] - sm[35]) < 1e-7
