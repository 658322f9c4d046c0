"""Golden regression values on a fixed synthetic scene.

The reference's fidelity harness compares byte-identical dumps against
stored goldens (testScripts/testOxfordDataset.sh.in).  Ours pins feature /
descriptor counts and a descriptor-mass checksum per SiftMode on a fixed
scene.  If a numerics change is *intentional*, update the constants and
say why in the commit message."""

import numpy as np
import pytest

from popsift_tpu.config import Config, SiftMode
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features

GOLDEN = {
    SiftMode.POPSIFT: (240, 307, 2706.9),
    SiftMode.VLFEAT: (240, 306, 2697.19),
    SiftMode.OPENCV: (188, 237, 2122.31),
}


@pytest.mark.parametrize("mode", list(GOLDEN))
def test_golden_counts(textured_image, mode):
    h, w = textured_image.shape
    cfg = Config()
    cfg.set_mode(mode)
    fn, _ = get_extractor(cfg, w, h)
    feats = assemble_features(fn(normalize_input(textured_image)), 1.0)
    n_ext, n_desc, mass = GOLDEN[mode]
    assert feats.get_feature_count() == n_ext
    assert feats.get_descriptor_count() == n_desc
    got_mass = float(np.abs(feats.get_descriptors()).sum())
    assert got_mass == pytest.approx(mass, rel=1e-3)
