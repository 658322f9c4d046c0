"""Capacity-clamp / overflow semantics + bucket-hysteresis stress.

The reference grows extrema buffers between stages and clamps counters to
max_extrema with a device-wide barrier (s_extrema.cu:549-557,
sift_pyramid.cu:179-209).  Our analog: static per-octave capacities with
deterministic raster-order clamping and overflow counters
(ops/extrema.py compact_mask/compact_extrema, extract.py make_plan).
These tests drive counts INTO the clamp and assert the semantics; the
bucket-hysteresis logic of staged.StagedExtractor._update_buckets gets a
direct unit test (it silently clamps features if it under-sizes)."""

import numpy as np
import pytest

from popsift_tpu.config import Config
from popsift_tpu.extract import get_extractor, make_plan, normalize_input
from popsift_tpu.features import assemble_features


@pytest.fixture(scope="module")
def dense_image():
    """High keypoint density: hard-edged random blocks at several scales."""
    rng = np.random.default_rng(5)
    h, w = 192, 256
    img = np.zeros((h, w), np.float32)
    for cell in (4, 8, 16):
        base = rng.random((h // cell + 1, w // cell + 1)).astype(np.float32)
        img += np.kron(base, np.ones((cell, cell), np.float32))[:h, :w]
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def _extract(config, image):
    fn, _ = get_extractor(config, image.shape[1], image.shape[0],
                          return_pyramid=False)
    return fn(normalize_input(image))


def test_overflow_counters_and_clamp(dense_image):
    """With a tiny capacity, counts clamp to cap, overflow counters report
    the drops, and the kept extrema are the raster-order prefix of the
    uncapped run (our documented deterministic analog of the reference's
    atomic-order clamp)."""
    big = Config()
    small = Config()
    small.ext_capacity = 32

    rb = _extract(big, dense_image)
    rs = _extract(small, dense_image)

    clamped_any = False
    for ob, os_ in zip(rb["octaves"], rs["octaves"]):
        cb = int(ob["count"])
        cs = int(os_["count"])
        assert cs <= 32
        if cb > 32:
            clamped_any = True
            assert cs == 32
            # overflow counter reports at least the post-refinement drops
            assert int(os_["overflow"]) >= cb - 32
            # raster-order prefix semantics: the survivors are the first
            # 32 extrema of the uncapped run
            np.testing.assert_allclose(
                np.asarray(os_["x"])[:32], np.asarray(ob["x"])[:32],
                rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(os_["sigma"])[:32],
                np.asarray(ob["sigma"])[:32], rtol=1e-5)
        else:
            assert cs == cb
    assert clamped_any, "test scene must actually overflow the capacity"


def test_overflowed_features_still_assemble(dense_image):
    cfg = Config()
    cfg.ext_capacity = 32
    res = _extract(cfg, dense_image)
    feats = assemble_features(res, cfg.get_upscale_factor())
    assert feats.get_feature_count() > 0
    # every emitted feature must be finite and in-image
    for f in feats:
        assert np.isfinite(f.xpos) and np.isfinite(f.ypos)
        assert np.isfinite(f.sigma) and f.sigma > 0


def test_max_extrema_plan_clamp():
    """config.max_extrema bounds every octave's capacity (the
    s_extrema.cu:549-557 clamp is a *plan* property here)."""
    cfg = Config()
    cfg.max_extrema = 100
    plan = make_plan(cfg, 1920, 1080)
    assert all(c <= 100 for c in plan.ext_caps)


class TestBucketHysteresis:
    """Direct unit tests of StagedExtractor._update_buckets
    (staged.py): the optimistic buckets may never under-size the next
    fetch relative to the count they were adapted to."""

    @pytest.fixture()
    def ex(self, textured_image):
        from popsift_tpu.staged import StagedExtractor
        h, w = textured_image.shape
        return StagedExtractor(Config(), w, h)

    def _feed(self, ex, cand, ext, ori):
        n = ex.plan.octaves
        ex._update_buckets([cand] * n, [ext] * n, [ori] * n)
        return ex._last_buckets, ex._last_key5

    def test_bucket_covers_count(self, ex):
        for cand, ext, ori in [(10, 5, 6), (500, 300, 350), (64, 64, 80),
                               (5000, 2000, 2500), (1, 1, 1), (0, 0, 0)]:
            (cks, ks, bs), key5 = self._feed(ex, cand, ext, ori)
            for o in range(ex.plan.octaves):
                assert cks[o] >= min(cand, ex.plan.cand_caps[o])
                # ext bucket must cover the observed count up to both the
                # ext capacity AND the candidate buffer it reads from
                assert ks[o] >= min(ext, ex.plan.ext_caps[o], cks[o] or
                                    ex.plan.ext_caps[o])
                assert bs[o] >= min(ori, ex.plan.ori_caps[o])
            # totals cover the sum of clamped per-octave counts
            _, _, _, ft, bt = key5
            assert ft >= sum(min(ext, ks[o])
                             for o in range(ex.plan.octaves))
            assert bt >= sum(min(ori, bs[o])
                             for o in range(ex.plan.octaves))

    def test_stable_under_repeat(self, ex):
        a = self._feed(ex, 300, 200, 240)
        b = self._feed(ex, 300, 200, 240)
        c = self._feed(ex, 280, 190, 230)  # small dip: no shrink
        assert a == b == c

    def test_shrinks_only_far_below(self, ex):
        self._feed(ex, 5000, 3000, 3600)
        big = ex._last_buckets
        self._feed(ex, 4000, 900, 1100)  # above 1/8: keep
        assert ex._last_buckets[1] == big[1]
        self._feed(ex, 100, 40, 50)      # below 1/8: shrink
        assert all(k <= b for k, b in zip(ex._last_buckets[1], big[1]))
        assert any(k < b for k, b in zip(ex._last_buckets[1], big[1])
                   if b > 128)

    def test_growth_with_headroom(self, ex):
        (_, ks, _), _ = self._feed(ex, 1000, 700, 800)
        for o in range(ex.plan.octaves):
            cap = min(ex.plan.ext_caps[o], ex.plan.cand_caps[o])
            want = min(700, cap)
            assert ks[o] >= want
