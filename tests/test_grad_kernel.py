"""Fused gradient-field kernel (kernels/grad.py) vs the XLA form."""

import jax.numpy as jnp
import numpy as np

from popsift_tpu.kernels.dispatch import kernel_interpret  # noqa: F401
from popsift_tpu.kernels.grad import (_grad_field_pallas, _round8,
                                      _round128, grad_field_ok)
from popsift_tpu.ops import gradients as G


def _pallas_field_interpret(stack):
    L, H, W = stack.shape
    bh = 32 if H >= 32 else _round8(max(H, 8))
    hp = (-(-H // bh)) * bh
    wp = _round128(W)
    padded = jnp.pad(stack, ((0, 0), (8, hp - H + 8), (128, wp - W + 128)),
                     mode="edge")
    return _grad_field_pallas(padded, H, W, interpret=True)


def test_grad_kernel_matches_xla():
    rng = np.random.default_rng(3)
    L, H, W = 3, 70, 200            # unaligned dims on purpose
    stack = jnp.asarray(rng.random((L, H, W)).astype(np.float32) * 255.0)
    got = np.asarray(_pallas_field_interpret(stack))
    assert got.shape == (2 * L, 96, 256)   # ceil(70/32)*32, round128(200)

    mag, theta = G.gradient_fields(stack)
    ref = np.asarray(G.interleave_field(mag, theta))
    # valid region only; alignment surplus is edge-replicated filler
    np.testing.assert_allclose(got[:, :H, :W][0::2], ref[0::2],
                               rtol=1e-5, atol=1e-4)
    # atan2 is the Cephes polynomial (max err ~2e-7 rad), mag uses
    # sqrt(dx^2+dy^2) instead of hypot
    np.testing.assert_allclose(got[:, :H, :W][1::2], ref[1::2],
                               rtol=0, atol=1e-5)


def test_grad_kernel_edge_rows_are_finite():
    rng = np.random.default_rng(5)
    stack = jnp.asarray(rng.random((2, 40, 135)).astype(np.float32))
    got = np.asarray(_pallas_field_interpret(stack))
    assert np.isfinite(got).all()


def test_grad_field_ok_gates():
    assert grad_field_ok((6, 2160, 3840))
    assert grad_field_ok((6, 135, 240))
    assert not grad_field_ok((6, 16, 3840))    # too short
    assert not grad_field_ok((6, 2160, 120))   # one lane tile


def test_gradient_field_dispatch_padded_cpu():
    """With pads requested (the CPU/small-octave path) the dispatcher
    returns the padded XLA interleaved field."""
    rng = np.random.default_rng(7)
    stack = jnp.asarray(rng.random((2, 24, 40)).astype(np.float32))
    f = G.gradient_field(stack, 16, 128)
    assert f.shape == (4, 24 + 32, 40 + 256)
    mag, theta = G.gradient_fields(stack)
    np.testing.assert_allclose(
        np.asarray(f)[0, 16:40, 128:168], np.asarray(mag)[0],
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f)[1, 16:40, 128:168], np.asarray(theta)[0],
        rtol=1e-6, atol=1e-6)
