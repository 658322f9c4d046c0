"""Unit coverage for tools/oxford_protocol.py's non-extraction parts
(the sequence generator, ground-truth transforms, and descriptor-L2
stat) — the extraction-heavy protocol itself runs on the TPU via the
tool (PARITY_r05.json records its output)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import oxford_protocol as oxp  # noqa: E402


def _scene():
    rng = np.random.default_rng(3)
    img = rng.random((60, 80)).astype(np.float32)
    img = np.kron(img, np.ones((2, 2), np.float32))[:96, :128]
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
    return (img / img.max() * 255).astype(np.uint8)


def test_scene_files_exist_and_load():
    for name in oxp.FAMILIES:
        img = oxp.load_scene(name)
        assert img.shape == (480, 640) and img.dtype == np.uint8


def test_make_sequence_families():
    img = _scene()
    for family in ("blur", "jpeg", "light", "zoomrot", "viewpoint"):
        seq = oxp.make_sequence(img, family)
        assert len(seq) == 5
        for k, (im, A, t) in enumerate(seq, start=2):
            assert im.shape == img.shape and im.dtype == np.uint8
            if family in ("blur", "jpeg", "light"):
                np.testing.assert_array_equal(A, np.eye(2))
                np.testing.assert_array_equal(t, np.zeros(2))
            else:
                # centre is a fixed point of the ground-truth transform
                c = np.array([img.shape[1] / 2.0, img.shape[0] / 2.0])
                np.testing.assert_allclose(A @ c + t, c, atol=1e-9)
        # photometric families must not be the identity image
        assert any(not np.array_equal(im, img) for im, _, _ in seq)


def test_blur_and_jpeg_change_monotonically():
    img = _scene()
    blur = [im for im, _, _ in oxp.make_sequence(img, "blur")]
    # stronger blur -> lower variance, monotonically
    vs = [float(np.var(b.astype(np.float64))) for b in blur]
    assert all(a > b for a, b in zip(vs, vs[1:]))
    jp = [im for im, _, _ in oxp.make_sequence(img, "jpeg")]
    errs = [float(np.mean(np.abs(j.astype(float) - img.astype(float))))
            for j in jp]
    assert errs[-1] > errs[0]


class _FakeFeats:
    """Minimal FeaturesHost stand-in for desc_l2_stats."""

    def __init__(self, x, y, num_ori, desc):
        self._soa = dict(xpos=np.asarray(x, np.float32),
                         ypos=np.asarray(y, np.float32),
                         num_ori=np.asarray(num_ori, np.int32),
                         desc_idx=np.arange(len(x))[:, None]
                         .repeat(4, 1).astype(np.int64))
        self._desc = np.asarray(desc, np.float32)

    def get_feature_count(self):
        return len(self._soa["xpos"])

    def get_descriptors(self):
        return self._desc


def test_desc_l2_stats_identity_pair():
    rng = np.random.default_rng(0)
    n = 12
    x = rng.uniform(10, 100, n)
    y = rng.uniform(10, 100, n)
    d = rng.random((n, 128)).astype(np.float32)
    fa = _FakeFeats(x, y, np.ones(n), d)
    fb = _FakeFeats(x, y, np.ones(n), d)
    l2 = oxp.desc_l2_stats(fa, fb, np.eye(2), np.zeros(2))
    assert l2 == 0.0
    # perturbed descriptors -> positive, bounded L2
    fb2 = _FakeFeats(x, y, np.ones(n), d + 0.01)
    l2b = oxp.desc_l2_stats(fa, fb2, np.eye(2), np.zeros(2))
    assert 0.0 < l2b < 0.2
