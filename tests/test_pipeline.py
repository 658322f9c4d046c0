"""End-to-end extraction + PopSift pipeline API tests."""

import io

import numpy as np
import pytest

import popsift_tpu as ps
from popsift_tpu.config import Config, ProcessingMode, ImageMode, NormMode
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features

pytestmark = pytest.mark.slow


def test_extract_finds_blobs(blob_image):
    h, w = blob_image.shape
    fn, plan = get_extractor(Config(), w, h)
    res = fn(normalize_input(blob_image))
    feats = assemble_features(res, 1.0)
    assert feats.get_feature_count() >= 3
    # a keypoint near each blob (input-image coordinates)
    pts = np.array([[f.xpos, f.ypos] for f in feats])
    for target in [(40, 30), (90, 60), (64, 20)]:
        dist = np.hypot(pts[:, 0] - target[0], pts[:, 1] - target[1])
        assert dist.min() < 2.0, f"no keypoint near {target}"


def test_extract_descriptor_norm(blob_image):
    h, w = blob_image.shape
    fn, plan = get_extractor(Config(), w, h)
    res = fn(normalize_input(blob_image))
    feats = assemble_features(res, 1.0)
    d = feats.get_descriptors()
    assert d.shape[1] == 128
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)  # RootSift default


def test_extract_classic_norm(blob_image):
    h, w = blob_image.shape
    cfg = Config()
    cfg.set_norm_mode(NormMode.CLASSIC)
    fn, plan = get_extractor(cfg, w, h)
    res = fn(normalize_input(blob_image))
    feats = assemble_features(res, 1.0)
    norms = np.linalg.norm(feats.get_descriptors(), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_pipeline_enqueue_get(blob_image):
    h, w = blob_image.shape
    with ps.PopSift(Config()) as p:
        job = p.enqueue(w, h, blob_image)
        feats = job.get()
        assert feats is not None
        assert feats.get_feature_count() >= 3
        assert feats.get_descriptor_count() >= feats.get_feature_count()


def test_pipeline_multiple_jobs(blob_image, textured_image):
    with ps.PopSift(Config()) as p:
        jobs = []
        for img in (blob_image, textured_image, blob_image):
            h, w = img.shape
            jobs.append(p.enqueue(w, h, img))
        counts = [j.get().get_feature_count() for j in jobs]
        assert counts[0] == counts[2]  # deterministic
        assert all(c > 0 for c in counts)


def test_pipeline_byte_mode_rejects_float(blob_image):
    with ps.PopSift(Config()) as p:
        h, w = blob_image.shape
        with pytest.raises(RuntimeError):
            p.enqueue(w, h, blob_image.astype(np.float32))


def test_pipeline_float_images(blob_image):
    h, w = blob_image.shape
    with ps.PopSift(Config(), imode=ImageMode.FLOAT) as p:
        job = p.enqueue(w, h, blob_image.astype(np.float32) / 256.0)
        feats = job.get()
        assert feats.get_feature_count() >= 1


def test_pipeline_matching_mode(blob_image):
    h, w = blob_image.shape
    with ps.PopSift(Config(), mode=ProcessingMode.MATCHING) as p:
        l_job = p.enqueue(w, h, blob_image)
        r_job = p.enqueue(w, h, blob_image)
        lf = l_job.get_dev()
        rf = r_job.get_dev()
        assert lf is not None and rf is not None
        best, second, accept, d1, d2 = lf.match(rf)
        # identical images: everything matches itself
        assert np.all(best == np.arange(len(best)))
        # self-distance is 0 so ratio test accepts
        assert accept.sum() == len(accept)


def test_deprecated_init_execute(blob_image):
    h, w = blob_image.shape
    with ps.PopSift(Config()) as p:
        p.init(w, h)
        feats = p.execute(blob_image)
        assert feats.get_feature_count() >= 3


def test_feature_print_format(blob_image):
    h, w = blob_image.shape
    with ps.PopSift(Config()) as p:
        feats = p.enqueue(w, h, blob_image).get()
    buf = io.StringIO()
    feats.print(buf)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == feats.get_descriptor_count()
    first = lines[0].split()
    # x y 1/sigma^2 0 1/sigma^2 + 128 floats (features.cu:310-330)
    assert len(first) == 5 + 128
    assert first[3] == "0"
    assert float(first[2]) == pytest.approx(float(first[4]))


def test_oversized_image_rejected():
    cfg = Config()
    with ps.PopSift(cfg) as p:
        job = p.enqueue(40000, 40000,
                        np.zeros((1, 1), np.uint8))  # dims checked first
        assert job is None


def test_upscale_factor_scaling(blob_image):
    """downsampling=0 (no upscale) halves the octave-0 size; keypoint
    coordinates remain in input-image space."""
    h, w = blob_image.shape
    cfg = Config()
    cfg.set_downsampling(0.0)
    fn, plan = get_extractor(cfg, w, h)
    assert plan.dims[0] == (w, h)
    res = fn(normalize_input(blob_image))
    feats = assemble_features(res, cfg.get_upscale_factor())
    pts = np.array([[f.xpos, f.ypos] for f in feats])
    assert len(pts) > 0
    dist = np.hypot(pts[:, 0] - 40, pts[:, 1] - 30)
    assert dist.min() < 2.0


def test_config_equaccording_static_key():
    a, b = Config(), Config()
    assert a == b
    b.set_sigma(1.8)
    assert a != b


def test_config_snapshot_per_job(textured_image):
    """A configure() call must not affect jobs already enqueued
    (popsift.cpp:79-89 refuses reconfiguration after allocation; here the
    job carries its enqueue-time config)."""
    h, w = textured_image.shape
    cfg_a = Config()
    cfg_b = Config(threshold=0.2)  # far fewer keypoints

    with ps.PopSift(cfg_a) as p:
        ref_a = p.enqueue(w, h, textured_image).get().get_feature_count()
        p.configure(cfg_b)
        ref_b = p.enqueue(w, h, textured_image).get().get_feature_count()
        assert ref_b < ref_a  # the two configs genuinely differ

    with ps.PopSift(cfg_a) as p:
        job1 = p.enqueue(w, h, textured_image)
        p.configure(cfg_b)  # must not affect job1
        job2 = p.enqueue(w, h, textured_image)
        assert job1.get().get_feature_count() == ref_a
        assert job2.get().get_feature_count() == ref_b


def test_invalid_desc_transfer_rejected():
    with pytest.raises(ValueError):
        Config(desc_transfer="fp32")
    cfg = Config()
    with pytest.raises(ValueError):
        cfg.set_desc_transfer("half")
    cfg.set_desc_transfer("f32")
    assert cfg.desc_transfer == "f32"


def test_failed_upload_isolated(blob_image):
    """A job whose upload fails must not poison healthy jobs batched with
    it, and must surface its original error."""
    h, w = blob_image.shape
    with ps.PopSift(Config()) as p:
        # inject an upload failure: a job object whose image access raises
        bad = p.enqueue(w, h, blob_image)
        good = [p.enqueue(w, h, blob_image) for _ in range(3)]
        # simulate stage-1 failure on 'bad' by racing is impossible from
        # here; instead drive the stage-2 entry points directly
        for j in good:
            assert j.get().get_feature_count() >= 3
        assert bad.get().get_feature_count() >= 3

    # direct unit check of the dispatch path with a failed-upload job
    from popsift_tpu.pipeline import SiftJob
    with ps.PopSift(Config()) as p:
        job = SiftJob(w, h, blob_image, config=p._config)
        job.set_error(RuntimeError("boom: original upload error"))
        p._pool.acquire()
        p._queue_stage2.put(job)
        with pytest.raises(RuntimeError, match="boom"):
            job.get()
