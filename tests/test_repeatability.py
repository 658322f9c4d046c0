"""End-to-end accuracy: keypoints repeat under known transforms."""

import numpy as np
import pytest

from popsift_tpu.config import Config
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features
from popsift_tpu.eval.repeatability import evaluate_pair, warp_affine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    h, w = 160, 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(25):
        cx = rng.uniform(20, w - 20)
        cy = rng.uniform(20, h - 20)
        s = rng.uniform(2.0, 6.0)
        img += rng.uniform(0.3, 1.0) * np.exp(
            -(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))) \
            * rng.choice([-1.0, 1.0])
    img = img - img.min()
    img = img / img.max()
    return (img * 255).astype(np.uint8)


def _extract(img):
    h, w = img.shape
    cfg = Config()
    fn, _ = get_extractor(cfg, w, h)
    return assemble_features(fn(normalize_input(img)),
                             cfg.get_upscale_factor())


def _run(scene, A, t):
    warped = warp_affine(scene, A, t)
    fa = _extract(scene)
    fb = _extract(warped)
    return evaluate_pair(fa, fb, A, t, warped.shape)


def test_identity_repeatability(scene):
    res = _run(scene, np.eye(2), np.zeros(2))
    assert res.n_ref > 10
    assert res.repeatability > 0.99
    assert res.matching_score > 0.99


def test_translation_repeatability(scene):
    res = _run(scene, np.eye(2), np.array([7.0, -4.0]))
    assert res.repeatability > 0.85
    assert res.matching_score > 0.85


def test_rotation_repeatability(scene):
    th = np.deg2rad(12)
    A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    # rotate around the image centre
    c = np.array([100.0, 80.0])
    t = c - A @ c
    res = _run(scene, A, t)
    assert res.repeatability > 0.75
    assert res.matching_score > 0.75


def test_scale_repeatability(scene):
    A = np.eye(2) * 1.15
    res = _run(scene, A, np.zeros(2))
    assert res.repeatability > 0.75
