"""Staged extraction must match the monolithic pipeline exactly."""

import numpy as np

from popsift_tpu.config import Config
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features
from popsift_tpu.staged import StagedExtractor, bucket


def test_bucket():
    assert bucket(0) == 0
    assert bucket(1) == 128
    assert bucket(128) == 128
    assert bucket(129) == 160   # quarter-power steps
    assert bucket(2303) == 2560
    assert bucket(5000) == 5120
    # monotone and covering
    prev = 0
    for n in range(1, 3000, 7):
        b = bucket(n)
        assert b >= n
        assert b >= prev or n <= prev
        prev = b


def test_staged_matches_monolithic(blob_image):
    h, w = blob_image.shape
    cfg = Config()
    norm = normalize_input(blob_image)

    mono_fn, _ = get_extractor(cfg, w, h)
    mono = assemble_features(mono_fn(norm), cfg.get_upscale_factor())

    staged = StagedExtractor(cfg, w, h)
    st = assemble_features(staged.extract(norm), cfg.get_upscale_factor())

    assert st.get_feature_count() == mono.get_feature_count()
    assert st.get_descriptor_count() == mono.get_descriptor_count()

    a = sorted((f.xpos, f.ypos, f.sigma, f.num_ori) for f in mono)
    b = sorted((f.xpos, f.ypos, f.sigma, f.num_ori) for f in st)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    da = np.sort(mono.get_descriptors(), axis=0)
    db = np.sort(st.get_descriptors(), axis=0)
    np.testing.assert_allclose(da, db, rtol=1e-4, atol=1e-5)


def test_staged_reuses_compiled_buckets(blob_image):
    h, w = blob_image.shape
    staged = StagedExtractor(Config(), w, h)
    norm = normalize_input(blob_image)
    staged.extract(norm)
    n2 = len(staged._stage2)
    n3 = len(staged._stage3)
    staged.extract(norm)
    assert len(staged._stage2) == n2
    assert len(staged._stage3) == n3
