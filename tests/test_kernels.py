"""Pallas kernels in interpreter mode (CPU-covered kernel code paths)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.kernels.windows import (aligned_window_dims, align_starts,
                                         gather_windows_aligned_pallas)
from popsift_tpu.kernels.blur import _sep_blur_pallas, _round8, _round128
from popsift_tpu.kernels.dispatch import disable_pallas, pallas_enabled


def test_aligned_window_dims():
    assert aligned_window_dims(48) == (56, 256)
    assert aligned_window_dims(112) == (120, 256)
    assert aligned_window_dims(1) == (8, 128)


def test_align_starts():
    ya, xa = align_starts(jnp.asarray([17, 8, 0]), jnp.asarray([200, 128, 1]))
    np.testing.assert_array_equal(np.asarray(ya), [16, 8, 0])
    np.testing.assert_array_equal(np.asarray(xa), [128, 128, 0])


def test_gather_kernel_interpret():
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.random((3, 64, 384)).astype(np.float32))
    win = 16
    wy, wx = aligned_window_dims(win)
    lp = jnp.asarray([0, 2, 1], jnp.int32)
    ya = jnp.asarray([0, 8, 40], jnp.int32)
    xa = jnp.asarray([0, 128, 0], jnp.int32)
    out = np.asarray(gather_windows_aligned_pallas(
        field, lp, ya, xa, win, interpret=True))
    f = np.asarray(field)
    for i in range(3):
        np.testing.assert_allclose(
            out[i], f[int(lp[i]), int(ya[i]):int(ya[i]) + wy,
                      int(xa[i]):int(xa[i]) + wx])


def test_blur_kernel_interpret():
    rng = np.random.default_rng(1)
    h, w = 40, 256
    img = rng.random((h, w)).astype(np.float32)
    span = 5
    taps = np.array([0.4, 0.2, 0.1, 0.04, 0.01], np.float32)
    taps /= taps[0] + 2 * taps[1:].sum()

    halo = _round8(span - 1)
    pad_x = _round128(span - 1)
    bh = 32
    h_pad = (-(-h // bh)) * bh
    padded = jnp.asarray(np.pad(
        img, ((halo, halo + h_pad - h), (pad_x, pad_x)), mode="edge"))
    got = np.asarray(_sep_blur_pallas(
        padded, tuple(float(t) for t in taps), span,
        tuple(float(t) for t in taps), span, 2.0, h, w, interpret=True))

    from popsift_tpu.ops.pyramid import blur_1d
    want = np.asarray(blur_1d(
        blur_1d(jnp.asarray(img), taps, span, -1) * 2.0,
        taps, span, -2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_disable_pallas_context():
    assert not pallas_enabled()  # cpu backend in tests
    with disable_pallas():
        assert not pallas_enabled()


def test_detect_kernel_interpret():
    """Tiled roll-based detection == the XLA slicing formulation."""
    from popsift_tpu.config import SiftMode
    from popsift_tpu.kernels.detect import detect_pallas
    from popsift_tpu.ops.extrema import detect_candidates

    rng = np.random.default_rng(7)
    for (h, w) in ((64, 144), (136, 600)):
        dog = rng.standard_normal((5, h, w)).astype(np.float32) * 3.0
        for mode in (SiftMode.POPSIFT, SiftMode.VLFEAT, SiftMode.OPENCV):
            want = np.asarray(detect_candidates(
                jnp.asarray(dog), mode, 1.2))
            got = np.asarray(detect_pallas(
                jnp.asarray(dog), mode, 1.2, interpret=True))
            np.testing.assert_array_equal(got, want)


def test_detect_packed_kernel_interpret():
    """Fused detect+bitpack: unpacked words == the dense mask, and
    compact_words == compact_mask (coordinates, counts, overflow)."""
    from popsift_tpu.config import SiftMode
    from popsift_tpu.kernels.detect import detect_packed_pallas
    from popsift_tpu.ops.extrema import (compact_mask, compact_words,
                                         detect_candidates)

    rng = np.random.default_rng(11)
    for (h, w) in ((64, 144), (136, 600)):
        # sparse impulses on a smooth floor: realistic extrema density so
        # neither path's per-block survivor budget binds
        dog = rng.normal(0.0, 0.05, (5, h, w)).astype(np.float32)
        n_imp = h * w // 500
        zz = rng.integers(0, 5, n_imp)
        yy = rng.integers(1, h - 1, n_imp)
        xx = rng.integers(1, w - 1, n_imp)
        dog[zz, yy, xx] += (np.sign(rng.normal(size=n_imp))
                            * rng.uniform(4, 40, n_imp)).astype(np.float32)
        for mode in (SiftMode.POPSIFT, SiftMode.VLFEAT, SiftMode.OPENCV):
            mask = np.asarray(detect_candidates(jnp.asarray(dog), mode, 1.2))
            words = np.asarray(detect_packed_pallas(
                jnp.asarray(dog), mode, 1.2, interpret=True))
            levels, G, Wp = words.shape
            bits = ((words[:, :, None, :]
                     >> np.arange(32)[None, None, :, None]) & 1)
            unpacked = bits.astype(bool).reshape(levels, G * 32, Wp)
            np.testing.assert_array_equal(unpacked[:, :h, :w], mask)
            assert not unpacked[:, h:, :].any()
            assert not unpacked[:, :, w:].any()
            a = compact_mask(jnp.asarray(mask), 2048)
            b = compact_words(jnp.asarray(words), 2048)
            for va, vb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(va),
                                              np.asarray(vb))


def test_blur_with_dog_interpret():
    from popsift_tpu.kernels.blur import sep_blur_fused_with_dog
    from popsift_tpu.ops import pyramid as ops_pyr
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((48, 256)).astype(np.float32) * 255)
    taps = np.asarray([0.4, 0.2, 0.08, 0.02], np.float32)
    out, dog = sep_blur_fused_with_dog(img, taps, 4, interpret=True)
    want = ops_pyr.blur_1d(img, taps, 4, axis=-1)
    want = ops_pyr.blur_1d(want, taps, 4, axis=-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dog), np.asarray(want - img),
                               atol=1e-4, rtol=1e-6)


def test_kernel_interpret_resolution(monkeypatch):
    """POPSIFT_TPU_DEBUG routes every kernel into interpret mode unless a
    caller chose explicitly (the PopSift_ERRCHK_AFTER_KERNEL analog)."""
    from popsift_tpu.kernels import dispatch
    assert dispatch.kernel_interpret(True) is True
    assert dispatch.kernel_interpret(False) is False
    monkeypatch.setattr(dispatch, "_DEBUG", True)
    assert dispatch.debug_mode() is True
    assert dispatch.kernel_interpret() is True
    assert dispatch.kernel_interpret(False) is False
    monkeypatch.setattr(dispatch, "_DEBUG", False)
    assert dispatch.kernel_interpret() is False


def test_debug_mode_enables_nan_checks():
    import os
    import subprocess
    import sys

    code = ("import popsift_tpu, jax; "
            "print('nan-check:', jax.config.jax_debug_nans)")
    env = {**os.environ, "POPSIFT_TPU_DEBUG": "1", "JAX_PLATFORMS": "cpu"}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "nan-check: True" in out.stdout


def _binwin_fixture(seed=7, L=3, h=72, w=150, n=24, pad=None, win=32):
    """Padded [mag; theta] field + slot arrays for the fused bin kernels."""
    from popsift_tpu.ops.gradients import padded_gradient_field
    rng = np.random.default_rng(seed)
    stack = rng.random((L, h, w)).astype(np.float32)
    for _ in range(2):
        stack = (stack + np.roll(stack, 1, 1) + np.roll(stack, 1, 2)) / 3
    pad_y, pad_x = pad or (win + 8, 256)
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    x = rng.uniform(2, w - 3, n).astype(np.float32)
    y = rng.uniform(2, h - 3, n).astype(np.float32)
    lv = rng.integers(0, L, n).astype(np.int32)
    sig = rng.uniform(1.2, 3.2, n).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    valid = rng.random(n) < 0.85
    return bothp, pad_y, pad_x, x, y, lv, sig, ang, valid, h, w


def test_ori_hist_fused_kernel_interpret():
    """Fused window+36-bin kernel (interpret) == the XLA chunked form."""
    from popsift_tpu.kernels import binwin
    from popsift_tpu.ops import orientation as ops_ori

    (bothp, pad_y, pad_x, x, y, lv, sig, ang, valid, h, w) = \
        _binwin_fixture(win=40)
    win = 40
    ref = ops_ori._hist_chunked(bothp, x, y, lv, sig, valid, w, h, win,
                                pad_y, pad_x, bothp.shape[0] // 2, 8)
    L = bothp.shape[0] // 2
    rx = jnp.round(jnp.asarray(x)).astype(jnp.int32)
    half = win // 2
    x0 = rx - half + pad_x
    y0 = jnp.round(jnp.asarray(y)).astype(jnp.int32) - half + pad_y
    lp = jnp.clip(jnp.asarray(lv), 0, L - 1)
    win_y = binwin._win_rows(win)
    Hp, Wp = bothp.shape[1], bothp.shape[2]
    ya = jnp.clip((y0 // 8) * 8, 0, Hp - win_y)
    xa = jnp.clip((x0 // 128) * 128, 0, Wp - 256)
    got = np.asarray(binwin.ori_hist_fused_pallas(
        bothp, 2 * lp, 2 * lp + 1, ya, xa, x0 - xa, x, y, sig,
        jnp.asarray(valid, jnp.int32), win, w, h, pad_y, pad_x,
        interpret=True))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_desc_loop_fused_kernel_interpret():
    """Fused window+4x4x8 descriptor kernel (interpret) == XLA form."""
    from popsift_tpu.constants import DESC_MAGNIFY
    from popsift_tpu.kernels import binwin
    from popsift_tpu.ops import descriptors as ops_desc

    (bothp, pad_y, pad_x, x, y, lv, sig, ang, valid, h, w) = \
        _binwin_fixture(seed=9, win=48, pad=(64, 256))
    win = 48
    ref = ops_desc.loop_descriptors(bothp, pad_y, pad_x, x, y, lv, sig,
                                    ang, valid, w, h, win, chunk=8)
    L = bothp.shape[0] // 2
    rx = jnp.round(jnp.asarray(x)).astype(jnp.int32)
    half = win // 2
    x0 = rx - half + pad_x
    y0 = jnp.round(jnp.asarray(y)).astype(jnp.int32) - half + pad_y
    lp = jnp.clip(jnp.asarray(lv), 0, L - 1)
    win_y = binwin._win_rows(win)
    Hp, Wp = bothp.shape[1], bothp.shape[2]
    ya = jnp.clip((y0 // 8) * 8, 0, Hp - win_y)
    xa = jnp.clip((x0 // 128) * 128, 0, Wp - 256)
    got = np.asarray(binwin.desc_loop_fused_pallas(
        bothp, 2 * lp, 2 * lp + 1, ya, xa, x0 - xa, x, y, sig, ang,
        jnp.asarray(valid, jnp.int32), win, w, h, pad_y, pad_x,
        DESC_MAGNIFY, interpret=True))
    r = np.asarray(ref)
    np.testing.assert_allclose(got, r,
                               atol=1e-4 * max(1.0, float(np.abs(r).max())))


def test_ori_hist_stack_kernel_interpret(monkeypatch):
    """Stack-input fused kernel (in-kernel gradients, interpret) == the
    XLA chunked form over the precomputed gradient field — including
    keypoints near image borders (gates make the clamped slab origin
    invisible).  (The stack kernels are gated off by default — see
    binwin.stack_kernel_ok — but their numerics stay covered here.)"""
    monkeypatch.setenv("POPSIFT_TPU_STACK_KERNELS", "1")
    from popsift_tpu.kernels import binwin
    from popsift_tpu.ops import orientation as ops_ori
    from popsift_tpu.ops.gradients import padded_gradient_field

    rng = np.random.default_rng(21)
    L, h, w = 3, 80, 420
    stack = rng.random((L, h, w)).astype(np.float32)
    for _ in range(2):
        stack = (stack + np.roll(stack, 1, 1) + np.roll(stack, 1, 2)) / 3
    win = 40
    assert binwin.stack_kernel_ok(stack.shape, win)
    n = 16
    x = np.concatenate([rng.uniform(2, w - 3, n - 4),
                        [1.2, w - 2.3, 5.0, w - 5.0]]).astype(np.float32)
    y = np.concatenate([rng.uniform(2, h - 3, n - 4),
                        [1.1, h - 2.2, h - 4.0, 2.5]]).astype(np.float32)
    lv = rng.integers(0, L, n).astype(np.int32)
    sig = rng.uniform(1.2, 3.2, n).astype(np.float32)
    valid = np.ones(n, bool)

    pad_y, pad_x = 64, 256
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    ref = ops_ori._hist_chunked(bothp, x, y, lv, sig, valid, w, h, win,
                                pad_y, pad_x, L, 8)

    lp, ya, xa, dxm, ox1, oy1 = binwin._stack_origins(
        jnp.asarray(stack), jnp.asarray(lv), jnp.asarray(x),
        jnp.asarray(y), win)
    got = np.asarray(binwin.ori_hist_stack_pallas(
        jnp.asarray(stack), lp, ya, xa, dxm, ox1, oy1, x, y, sig,
        jnp.asarray(valid, jnp.int32), win, w, h, interpret=True))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_desc_loop_stack_kernel_interpret(monkeypatch):
    """Stack-input fused descriptor kernel (interpret) == XLA form."""
    monkeypatch.setenv("POPSIFT_TPU_STACK_KERNELS", "1")
    from popsift_tpu.constants import DESC_MAGNIFY
    from popsift_tpu.kernels import binwin
    from popsift_tpu.ops import descriptors as ops_desc
    from popsift_tpu.ops.gradients import padded_gradient_field

    rng = np.random.default_rng(23)
    L, h, w = 2, 96, 400
    stack = rng.random((L, h, w)).astype(np.float32)
    for _ in range(2):
        stack = (stack + np.roll(stack, 1, 1) + np.roll(stack, 1, 2)) / 3
    win = 48
    assert binwin.stack_kernel_ok(stack.shape, win)
    n = 12
    x = np.concatenate([rng.uniform(2, w - 3, n - 4),
                        [1.5, w - 2.5, 3.0, w - 4.0]]).astype(np.float32)
    y = np.concatenate([rng.uniform(2, h - 3, n - 4),
                        [1.4, h - 2.1, 2.0, h - 3.5]]).astype(np.float32)
    lv = rng.integers(0, L, n).astype(np.int32)
    sig = rng.uniform(1.0, 2.2, n).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    valid = np.ones(n, bool)

    pad_y, pad_x = 64, 256
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    with disable_pallas():
        ref = ops_desc.loop_descriptors(bothp, pad_y, pad_x, x, y, lv,
                                        sig, ang, valid, w, h, win,
                                        chunk=8)
    lp, ya, xa, dxm, ox1, oy1 = binwin._stack_origins(
        jnp.asarray(stack), jnp.asarray(lv), jnp.asarray(x),
        jnp.asarray(y), win)
    got = np.asarray(binwin.desc_loop_stack_pallas(
        jnp.asarray(stack), lp, ya, xa, dxm, ox1, oy1, x, y, sig,
        ang, jnp.asarray(valid, jnp.int32), win, w, h, DESC_MAGNIFY,
        interpret=True))
    r = np.asarray(ref)
    np.testing.assert_allclose(got, r,
                               atol=1e-4 * max(1.0, float(np.abs(r).max())))
