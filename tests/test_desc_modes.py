"""All five descriptor modes: run end-to-end and agree with each other
(after normalisation) on smooth texture — the analog of the cross-variant
consistency script (testScripts/TEST.sh.in)."""

import numpy as np
import pytest

from popsift_tpu.config import Config, DescMode
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(11)
    h, w = 80, 96
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(6):
        cx = rng.uniform(15, w - 15)
        cy = rng.uniform(15, h - 15)
        s = rng.uniform(2, 4)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    return np.clip(img * 180, 0, 255).astype(np.uint8)


def _extract(image, mode):
    h, w = image.shape
    cfg = Config()
    cfg.set_desc_mode(mode)
    fn, _ = get_extractor(cfg, w, h)
    res = fn(normalize_input(image))
    return assemble_features(res, cfg.get_upscale_factor())


@pytest.fixture(scope="module")
def all_modes(image):
    return {m: _extract(image, m) for m in DescMode}


def test_all_modes_run(all_modes):
    for mode, feats in all_modes.items():
        assert feats.get_feature_count() > 0, mode
        d = feats.get_descriptors()
        assert np.all(np.isfinite(d)), mode
        norms = np.linalg.norm(d, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4,
                                   err_msg=str(mode))


def test_same_keypoints_across_modes(all_modes):
    base = all_modes[DescMode.LOOP]
    kp = sorted((f.xpos, f.ypos, f.sigma) for f in base)
    for mode, feats in all_modes.items():
        other = sorted((f.xpos, f.ypos, f.sigma) for f in feats)
        np.testing.assert_allclose(np.asarray(kp), np.asarray(other),
                                   rtol=1e-6, err_msg=str(mode))


def test_modes_agree_loosely(all_modes):
    """Descriptors from different sampling strategies describe the same
    patch: cosine similarity should be high (TEST.sh.in compares desc
    files pairwise)."""
    def desc_map(feats):
        out = {}
        for f in feats:
            key = (round(f.xpos, 2), round(f.ypos, 2))
            if f.num_ori > 0:
                out[key] = f.desc[0]
        return out

    base = desc_map(all_modes[DescMode.LOOP])
    for mode in (DescMode.ILOOP, DescMode.GRID, DescMode.IGRID,
                 DescMode.NOTILE):
        other = desc_map(all_modes[mode])
        sims = []
        for key, d in base.items():
            if key in other and other[key] is not None:
                sims.append(float(np.dot(d, other[key])))
        assert sims, f"no common keypoints for {mode}"
        assert np.mean(sims) > 0.93, (mode, np.mean(sims))


def test_grid_windowed_matches_plane():
    """The TPU window-DMA grid-family path must reproduce the
    whole-plane-gather formulation (same math, window-local sampling,
    edge padding standing in for texture clamp addressing)."""
    import jax.numpy as jnp

    from popsift_tpu.constants import build_const_info
    from popsift_tpu.ops import descriptors as ops_desc

    rng = np.random.default_rng(9)
    L, h, w = 4, 88, 144
    stack = rng.random((L, h, w)).astype(np.float32)
    for _ in range(2):
        stack = (stack + np.roll(stack, 1, 1) + np.roll(stack, 1, 2)) / 3

    cap = 96
    x = rng.uniform(1, w - 2, cap).astype(np.float32)   # incl. near-border
    y = rng.uniform(1, h - 2, cap).astype(np.float32)
    lv = rng.integers(0, L, cap).astype(np.int32)
    sig = rng.uniform(1.6, 5.0, cap).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, cap).astype(np.float32)
    valid = rng.random(cap) < 0.9

    cfg = Config()
    consts = build_const_info(cfg)
    win = ops_desc.desc_window_size(cfg.sigma, cfg.levels)
    pad_y, pad_x = 120, 256

    stackp = jnp.pad(jnp.asarray(stack),
                     ((0, 0), (pad_y, pad_y), (pad_x, pad_x)),
                     mode="edge")
    for rounded in (False, True):
        ref = np.asarray(ops_desc.grid_descriptors(
            jnp.asarray(stack), x, y, lv, sig, ang, valid,
            consts.desc_gauss, consts.desc_tile, rounded=rounded))
        out = np.asarray(ops_desc.grid_descriptors_windowed(
            stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
            win=win, desc_gauss=consts.desc_gauss,
            desc_tile=consts.desc_tile, rounded=rounded))
        np.testing.assert_allclose(
            out, ref, atol=1e-3 * max(1.0, float(np.abs(ref).max())))

    # MXU-contracted bilinear sampling (the TPU notile/igrid speed
    # path): separable triangle matmuls must reproduce the gather
    # formulation to float rounding
    for rounded in (False, True):
        ref = np.asarray(ops_desc.grid_descriptors_windowed(
            stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
            win=win, desc_gauss=consts.desc_gauss,
            desc_tile=consts.desc_tile, rounded=rounded))
        out = np.asarray(ops_desc.grid_descriptors_windowed_mm(
            stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
            win=win, desc_gauss=consts.desc_gauss,
            desc_tile=consts.desc_tile, rounded=rounded))
        np.testing.assert_allclose(
            out, ref, atol=2e-4 * max(1.0, float(np.abs(ref).max())))

    # iloop: doubly-separable matmul sampling vs gather taps
    ref = np.asarray(ops_desc.iloop_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
        win=win))
    out = np.asarray(ops_desc.iloop_descriptors_windowed_mm(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
        win=win))
    np.testing.assert_allclose(
        out, ref, atol=2e-4 * max(1.0, float(np.abs(ref).max())))

    # iloop: whole-plane vs windowed
    ref = np.asarray(ops_desc.iloop_descriptors(
        jnp.asarray(stack), x, y, lv, sig, ang, valid))
    out = np.asarray(ops_desc.iloop_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, w, h, win))
    np.testing.assert_allclose(
        out, ref, atol=1e-3 * max(1.0, float(np.abs(ref).max())))

    # grid (rounded integer taps): one-hot matmul taps vs gather taps
    ref = np.asarray(ops_desc.grid_rounded_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
        win=win))
    out = np.asarray(ops_desc.grid_rounded_descriptors_windowed_mm(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, h=h, w=w,
        win=win))
    np.testing.assert_allclose(
        out, ref, atol=2e-4 * max(1.0, float(np.abs(ref).max())))

    # grid (rounded integer taps): whole-plane vs windowed
    ref = np.asarray(ops_desc.grid_rounded_descriptors(
        jnp.asarray(stack), x, y, lv, sig, ang, valid))
    out = np.asarray(ops_desc.grid_rounded_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, valid, w, h, win))
    np.testing.assert_allclose(
        out, ref, atol=1e-3 * max(1.0, float(np.abs(ref).max())))
