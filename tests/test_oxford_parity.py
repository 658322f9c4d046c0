"""Oxford parity harness (tools/oxford_parity.py).

The real comparison needs the Oxford affine dataset and a tree of
reference-produced dumps (testOxfordDataset.sh.in's reference.tgz) —
neither can be downloaded here, so the dataset-driven test skips with a
reason unless POPSIFT_OXFORD_DATASET / POPSIFT_OXFORD_REFERENCE point at
them.  The harness machinery itself is validated by self-comparison:
a produced output tree compared against itself must pass at 100%."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import oxford_parity  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene_image():
    rng = np.random.default_rng(11)
    h, w = 96, 128
    img = rng.random((h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def test_self_parity(scene_image, tmp_path):
    out = str(tmp_path / "output-img1")
    oxford_parity.produce_output_tree(scene_image, out)

    for sub in ("dir-octave", "dir-dog"):
        ok, msg = oxford_parity.compare_pgm_dir(
            os.path.join(out, sub), os.path.join(out, sub), 1.0, 0.02)
        assert ok, msg
    ok, msg = oxford_parity.compare_features(
        os.path.join(out, "features.txt"),
        os.path.join(out, "features.txt"), 1.5, 0.99, 0.05)
    assert ok, msg
    assert "100.00%" in msg


def test_detects_divergence(scene_image, tmp_path):
    """A corrupted tree must FAIL the comparison (the harness can't be
    trivially green)."""
    out = str(tmp_path / "output-img1")
    bad = str(tmp_path / "bad")
    oxford_parity.produce_output_tree(scene_image, out)

    import shutil
    shutil.copytree(out, bad)
    # perturb one pyramid level by 8 grey levels
    from popsift_tpu.io.pgm import read_pgm, write_pgm
    d = os.path.join(bad, "dir-octave")
    name = sorted(os.listdir(d))[0]
    img = read_pgm(os.path.join(d, name))
    write_pgm(os.path.join(d, name),
              np.clip(img.astype(np.int16) + 8, 0, 255).astype(np.uint8))
    ok, msg = oxford_parity.compare_pgm_dir(
        os.path.join(out, "dir-octave"), d, 1.0, 0.02)
    assert not ok, msg

    # shift keypoint coordinates
    feats = os.path.join(bad, "features.txt")
    with open(feats) as f:
        lines = f.readlines()
    with open(feats, "w") as f:
        for ln in lines:
            t = ln.split()
            t[0] = str(float(t[0]) + 5.0)
            f.write(" ".join(t) + "\n")
    ok, msg = oxford_parity.compare_features(
        os.path.join(out, "features.txt"), feats, 1.5, 0.99, 0.05)
    assert not ok, msg


def test_oxford_dataset():
    data = os.environ.get("POPSIFT_OXFORD_DATASET")
    ref = os.environ.get("POPSIFT_OXFORD_REFERENCE")
    if not (data and ref and os.path.isdir(data) and os.path.isdir(ref)):
        pytest.skip("Oxford dataset/reference tree not available: set "
                    "POPSIFT_OXFORD_DATASET and POPSIFT_OXFORD_REFERENCE "
                    "(see testScripts/downloadOxfordDataset.sh.in)")
    rc = oxford_parity.main(["--dataset", data, "--reference", ref,
                             "--out", "/tmp/oxford-parity-test"])
    assert rc == 0
