"""Build a parity pack: our --log output trees, bundled for offline diff
against a reference-binary run.

The canonical accuracy protocol (testOxfordDataset.sh.in, BASELINE.md)
compares every pyramid/DoG level and the sorted features/keypoints/
descriptors text files against reference-produced outputs.  This
environment has no network (no Oxford dataset, no reference GPU), so the
comparison must happen OUTSIDE: this tool produces, for each input
image, the exact output tree the reference script arranges —

    <pack>/<name>/output-<name>/
        dir-octave/pyramid-o-O-l-L.pgm
        dir-dog/d-pyramid-o-O-l-L.pgm
        features.txt     (sort -n, LC_ALL=C)
        keypoints.txt    (sort -n of dir-fpt/desc-pyramid.txt)
        descriptors.txt  (sort -n of dir-desc/desc-pyramid.txt)

— byte-compatible text formats (C++ ostream setprecision semantics,
verified by tests/test_parity_format.py against g++-compiled goldens),
so one run of `popsift-demo --log --gauss-mode vlfeat --desc-mode loop
--popsift-mode --root-sift --downsampling -1` on the same images is a
drop-in `diff -r` / tolerance compare via tools/oxford_parity.py.

Usage:
    python tools/parity_pack.py --images <dir-or-pgm...> --out pack.tgz
    python tools/parity_pack.py --synthetic 2 --out pack.tgz   # no data
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tarfile
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synthetic_scene(seed: int, h: int = 480, w: int = 640) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for cell, amp in ((64, 1.0), (32, 0.5), (16, 0.25), (8, 0.12)):
        base = rng.random((h // cell + 2, w // cell + 2)).astype(np.float32)
        up = np.kron(base, np.ones((cell, cell), np.float32))[:h, :w]
        img += amp * up
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def _collect_images(paths: list[str]) -> list[tuple[str, np.ndarray]]:
    from popsift_tpu.io.pgm import read_pgm
    out = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if name.lower().endswith((".pgm", ".ppm")):
                    out.append((os.path.splitext(name)[0],
                                read_pgm(os.path.join(p, name))))
        else:
            out.append((os.path.splitext(os.path.basename(p))[0],
                        read_pgm(p)))
    return out


def build_pack(images: list[tuple[str, np.ndarray]], out_path: str) -> None:
    from tools.oxford_parity import produce_output_tree

    with tempfile.TemporaryDirectory() as tmp:
        manifest = {
            "protocol": ("--log --gauss-mode vlfeat --desc-mode loop "
                         "--popsift-mode --root-sift --downsampling -1"),
            "reference_script": "testScripts/testOxfordDataset.sh.in",
            "compare_with": "tools/oxford_parity.py --reference <this-pack>",
            "images": {},
        }
        for name, img in images:
            tree = os.path.join(tmp, name, f"output-{name}")
            produce_output_tree(img, tree)
            manifest["images"][name] = {
                "h": int(img.shape[0]), "w": int(img.shape[1]),
            }
            print(f"# packed {name} ({img.shape[1]}x{img.shape[0]})",
                  file=sys.stderr)
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with tarfile.open(out_path, "w:gz") as tf:
            tf.add(tmp, arcname="parity-pack")
    print(f"# wrote {out_path} "
          f"({os.path.getsize(out_path) / 1e6:.1f} MB)", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", nargs="*", default=[],
                    help="PGM files or directories of PGMs")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="pack N synthetic scenes instead (no dataset)")
    ap.add_argument("--out", default="parity-pack.tgz")
    args = ap.parse_args()

    images = _collect_images(args.images)
    for i in range(args.synthetic):
        images.append((f"synthetic{i}", _synthetic_scene(100 + i)))
    if not images:
        ap.error("no images: pass --images or --synthetic N")
    build_pack(images, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
