"""--log debug dump tree.

Reproduces the reference's golden-state dump layout
(Octave::download_and_save_array, sift_octave.cu:111-188, and
Pyramid::save_descriptors, sift_pyramid.cu:88-106): every pyramid level and
DoG level as PGM + raw float dumps under dir-octave/* and descriptors under
dir-desc/ + dir-fpt/ — the fidelity harness of testOxfordDataset.sh.in.
"""

from __future__ import annotations

import os

import numpy as np

from .config import Config
from .extract import get_extractor, normalize_input
from .io.pgm import write_pgm


def _ensure(p: str) -> None:
    os.makedirs(p, exist_ok=True)


def format_desc_row(x: float, y: float, sigma: float, ori_rad: float,
                    desc, with_orientation: bool) -> str:
    """One text row of Pyramid::writeDescriptor (sift_pyramid.cu:401-444),
    byte-compatible with the C++ ostream output: setprecision(5) default
    float format (= %.5g) throughout, trailing space before the newline.
    Verified against a g++-compiled golden in tests/test_parity_format.py.

    with_orientation=True is the dir-desc format (x y sigma dom_ori);
    False is the dir-fpt format (x y 1/s^2 0 1/s^2)."""
    import math
    if with_orientation:
        dom = ori_rad / (2.0 * math.pi) * 360.0
        if dom < 0:
            dom += 360.0
        head = f"{x:.5g} {y:.5g} {sigma:.5g} {dom:.5g} "
    else:
        sv = 1.0 / (sigma * sigma)
        head = f"{x:.5g} {y:.5g} {sv:.5g} 0 {sv:.5g} "
    return head + " ".join(f"{float(v):.5g}" for v in desc) + " \n"


def dump_all(config: Config, job, basename: str, base_dir: str = ".") -> None:
    """Dump pyramid/DoG images and descriptor text files for one job."""
    fn, plan = get_extractor(config, job._w, job._h, return_pyramid=True)
    result = fn(normalize_input(job._image_data))

    # directory layout mirrors Octave::download_and_save_array
    # (sift_octave.cu:119-137): dir-octave (unscaled pgm),
    # dir-octave-dump (raw float), dir-dog (scaled pgm),
    # dir-dog-txt (offset-by-127 pgm-style), dir-dog-dump (raw float)
    oct_dir = os.path.join(base_dir, "dir-octave")
    octd_dir = os.path.join(base_dir, "dir-octave-dump")
    dog_dir = os.path.join(base_dir, "dir-dog")
    dogt_dir = os.path.join(base_dir, "dir-dog-txt")
    dogd_dir = os.path.join(base_dir, "dir-dog-dump")
    for d in (oct_dir, octd_dir, dog_dir, dogt_dir, dogd_dir):
        _ensure(d)

    for o, stack in enumerate(result["pyramid"]):
        arr = np.asarray(stack)
        for lvl in range(arr.shape[0]):
            name = f"{basename}-o-{o}-l-{lvl}"
            write_pgm(os.path.join(oct_dir, name + ".pgm"),
                      np.clip(arr[lvl], 0, 255).astype(np.uint8))
            arr[lvl].astype(np.float32).tofile(
                os.path.join(octd_dir, name + ".dump"))
    for o, dog in enumerate(result["dog"]):
        arr = np.asarray(dog)
        for lvl in range(arr.shape[0]):
            name = f"d-{basename}-o-{o}-l-{lvl}"
            lo, hi = float(arr[lvl].min()), float(arr[lvl].max())
            scale = 255.0 / (hi - lo) if hi > lo else 1.0
            write_pgm(os.path.join(dog_dir, name + ".pgm"),
                      ((arr[lvl] - lo) * scale).astype(np.uint8))
            write_pgm(os.path.join(dogt_dir, name + ".txt.pgm"),
                      np.clip(arr[lvl] + 127.0, 0, 255).astype(np.uint8))
            arr[lvl].astype(np.float32).tofile(
                os.path.join(dogd_dir, name + ".dump"))

    # descriptor text dumps (save_descriptors writes both orientations-
    # and shape-matrix-style headers, sift_pyramid.cu:401-444)
    from .features import assemble_features
    feats = assemble_features(result, config.get_upscale_factor())
    up = config.get_upscale_factor()

    desc_dir = os.path.join(base_dir, "dir-desc")
    fpt_dir = os.path.join(base_dir, "dir-fpt")
    _ensure(desc_dir)
    _ensure(fpt_dir)

    def write(path: str, with_orientation: bool) -> None:
        with open(path, "w") as of:
            for f in feats:
                # writeDescriptor scales the (already prep_features-scaled)
                # coordinates again by 2^(octave-up) — reproduced faithfully
                # (sift_pyramid.cu:407-412)
                s = 2.0 ** (f.debug_octave - up)
                for k in range(f.num_ori):
                    d = f._descriptors[int(f.desc_idx[k])]
                    of.write(format_desc_row(
                        f.xpos * s, f.ypos * s, f.sigma * s,
                        float(f.orientation[k]), d, with_orientation))

    write(os.path.join(desc_dir, f"desc-{basename}.txt"), True)
    write(os.path.join(fpt_dir, f"desc-{basename}.txt"), False)
