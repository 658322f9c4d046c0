"""Oxford-dataset parity harness against reference-produced dumps.

Mirrors /root/reference/testScripts/testOxfordDataset.sh.in: for every
scene/image of the Oxford affine dataset it runs the reference protocol
config (--log --gauss-mode vlfeat --desc-mode loop --popsift-mode
--root-sift --downsampling -1), produces the same output tree
(output-<img>/{dir-octave, dir-dog, features.txt, keypoints.txt,
descriptors.txt}), and compares it against a tree of reference-produced
outputs — with float tolerances instead of the script's byte-exact cmp
(we change arithmetic: no 9-bit fixed-point texture interpolation on TPU).

Usage:
    python tools/oxford_parity.py --dataset /path/to/oxford \
        --reference /path/to/reference-tree [--out /tmp/oxford-parity] \
        [--scenes boat bikes ...] [--images img1 img2 ...]

Layout expectations (both trees, as produced by the reference script):
    <reference>/<scene>/output-<img>/dir-octave/pyramid-o-O-l-L.pgm
    <reference>/<scene>/output-<img>/dir-dog/d-pyramid-o-O-l-L.pgm
    <reference>/<scene>/output-<img>/features.txt     (sorted)
    <reference>/<scene>/output-<img>/keypoints.txt    (sorted)
    <reference>/<scene>/output-<img>/descriptors.txt  (sorted)
The dataset tree holds <scene>/imgN.pgm or imgN.ppm.

Pass criteria (per image):
  * pyramid / DoG PGMs: mean |diff| <= --tol-img-mean grey levels and
    <= --tol-img-frac of pixels differ by more than 2 levels,
  * keypoints: >= --min-repeatability of reference keypoints have a
    counterpart within --kp-eps px and 20% relative sigma,
  * descriptors: median L2 distance between matched descriptor pairs
    <= --tol-desc-l2 (descriptors scaled to unit-norm convention).

Exit status 0 iff every compared image passes; prints a parity table.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = ["boat", "bikes", "trees", "graf", "wall", "bark", "leuven", "ubc"]
IMAGES = ["img1", "img2", "img3", "img4", "img5", "img6"]


def reference_protocol_config():
    """The exact flag set of testOxfordDataset.sh.in's popsift-demo call."""
    from popsift_tpu.config import (Config, GaussMode, SiftMode, DescMode,
                                    NormMode, LogMode)
    c = Config()
    c.set_gauss_mode(GaussMode.VLFEAT_COMPUTE)     # --gauss-mode vlfeat
    c.set_mode(SiftMode.POPSIFT)                   # --popsift-mode
    c.set_desc_mode(DescMode.LOOP)                 # --desc-mode loop
    c.set_norm_mode(NormMode.ROOT_SIFT)            # --root-sift
    c.set_downsampling(-1.0)                       # --downsampling -1
    c.set_log_mode(LogMode.ALL)                    # --log
    # reference parity: exact f32 descriptor download
    c.set_desc_transfer("f32")
    return c


class _JobShim:
    """Minimal job object for debugdump.dump_all."""

    def __init__(self, image: np.ndarray):
        self._h, self._w = image.shape
        self._image_data = image


def produce_output_tree(image: np.ndarray, out_dir: str) -> None:
    """Run extraction + dump and arrange the reference script's layout
    (the mv/sort block of testOxfordDataset.sh.in)."""
    from popsift_tpu.debugdump import dump_all

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    config = reference_protocol_config()
    dump_all(config, _JobShim(image), "pyramid", base_dir=out_dir)

    # sort -n exactly like the script (testOxfordDataset.sh.in:67-71):
    # GNU sort's numeric-prefix ordering + byte-wise last-resort tie
    # break, under LC_ALL=C, so the produced files are drop-in
    # diffable against a reference-binary run's sorted outputs
    def sort_into(src: str, dst: str) -> None:
        import subprocess
        env = dict(os.environ, LC_ALL="C")
        try:
            with open(dst, "w") as f:
                subprocess.run(["sort", "-n", src], stdout=f, env=env,
                               check=True)
            return
        except (OSError, subprocess.CalledProcessError):
            pass  # no coreutils: approximate in Python
        with open(src) as f:
            lines = f.readlines()
        lines.sort(key=lambda ln: (float(ln.split()[0] or 0), ln))
        with open(dst, "w") as f:
            f.writelines(lines)

    sort_into(os.path.join(out_dir, "dir-fpt", "desc-pyramid.txt"),
              os.path.join(out_dir, "keypoints.txt"))
    sort_into(os.path.join(out_dir, "dir-desc", "desc-pyramid.txt"),
              os.path.join(out_dir, "descriptors.txt"))
    # features.txt in the script is the sorted output-features.txt,
    # whose rows are the same "x y 1/s^2 0 1/s^2 d0..d127" format as
    # keypoints.txt but in final image coordinates (features.print());
    # dump_all's dir-fpt file carries the double-scaling quirk of the
    # --log path, so regenerate print()-format rows here
    from popsift_tpu.extract import get_extractor, normalize_input
    from popsift_tpu.features import assemble_features
    cfg = reference_protocol_config()
    fn, _ = get_extractor(cfg, image.shape[1], image.shape[0],
                          return_pyramid=True)
    feats = assemble_features(fn(normalize_input(image)),
                              cfg.get_upscale_factor())
    raw = os.path.join(out_dir, "output-features.txt")
    with open(raw, "w") as f:
        feats.print(f, write_as_uchar=False)
    sort_into(raw, os.path.join(out_dir, "features.txt"))
    os.remove(raw)

    # trim to the compared layout
    for d in ("dir-octave-dump", "dir-dog-txt", "dir-dog-dump",
              "dir-desc", "dir-fpt"):
        shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)


def _read_pgm_u8(path: str) -> np.ndarray:
    from popsift_tpu.io.pgm import read_pgm
    return read_pgm(path)


def compare_pgm_dir(ours: str, refs: str, tol_mean: float,
                    tol_frac: float) -> tuple[bool, str]:
    names = sorted(os.listdir(refs)) if os.path.isdir(refs) else []
    if not names:
        return True, "no reference images"
    worst_mean = worst_frac = 0.0
    n = 0
    for name in names:
        mine = os.path.join(ours, name)
        if not os.path.exists(mine):
            return False, f"missing {name}"
        a = _read_pgm_u8(mine).astype(np.int16)
        b = _read_pgm_u8(os.path.join(refs, name)).astype(np.int16)
        if a.shape != b.shape:
            return False, f"shape mismatch {name}: {a.shape} vs {b.shape}"
        d = np.abs(a - b)
        worst_mean = max(worst_mean, float(d.mean()))
        worst_frac = max(worst_frac, float((d > 2).mean()))
        n += 1
    ok = worst_mean <= tol_mean and worst_frac <= tol_frac
    return ok, (f"{n} levels, worst mean |d|={worst_mean:.3f}, "
                f"worst frac(|d|>2)={worst_frac:.4f}")


def _load_rows(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse 'x y a b c d0..d127' rows -> (keypoints Nx3 [x,y,sigma],
    descriptors Nx128).  sigma is recovered from the 1/sigma^2 column."""
    kps, descs = [], []
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if len(t) < 5:
                continue
            x, y = float(t[0]), float(t[1])
            inv_s2 = float(t[2])
            sig = 1.0 / math.sqrt(inv_s2) if inv_s2 > 0 else 0.0
            kps.append((x, y, sig))
            if len(t) >= 133:
                descs.append([float(v) for v in t[5:133]])
    return (np.asarray(kps, np.float64).reshape(-1, 3),
            np.asarray(descs, np.float64).reshape(-1, 128))


def compare_features(ours: str, refs: str, kp_eps: float,
                     min_rep: float, tol_l2: float) -> tuple[bool, str]:
    if not os.path.exists(refs):
        return True, "no reference features"
    ka, da = _load_rows(ours)
    kb, db = _load_rows(refs)
    if len(kb) == 0:
        return len(ka) == 0, f"ref empty, ours {len(ka)}"
    # nearest-neighbour by position + relative sigma
    matched = 0
    l2s = []
    for i in range(len(kb)):
        d = np.hypot(ka[:, 0] - kb[i, 0], ka[:, 1] - kb[i, 1]) \
            if len(ka) else np.array([np.inf])
        j = int(np.argmin(d))
        if d[j] < kp_eps and (kb[i, 2] <= 0 or ka[j, 2] <= 0
                              or 0.8 < ka[j, 2] / kb[i, 2] < 1.25):
            matched += 1
            if len(da) and len(db):
                na = da[j] / max(np.linalg.norm(da[j]), 1e-12)
                nb = db[i] / max(np.linalg.norm(db[i]), 1e-12)
                l2s.append(float(np.linalg.norm(na - nb)))
    rep = matched / len(kb)
    med_l2 = float(np.median(l2s)) if l2s else 0.0
    ok = rep >= min_rep and med_l2 <= tol_l2
    return ok, (f"repeatability {rep * 100:.2f}% ({matched}/{len(kb)}), "
                f"median desc L2 {med_l2:.4f}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="Oxford dataset dir (scene/imgN.pgm|ppm)")
    ap.add_argument("--reference", required=True,
                    help="reference output tree (scene/output-imgN/...)")
    ap.add_argument("--out", default="/tmp/oxford-parity")
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--images", nargs="*", default=IMAGES)
    ap.add_argument("--tol-img-mean", type=float, default=1.0)
    ap.add_argument("--tol-img-frac", type=float, default=0.02)
    ap.add_argument("--kp-eps", type=float, default=1.5)
    ap.add_argument("--min-repeatability", type=float, default=0.99)
    ap.add_argument("--tol-desc-l2", type=float, default=0.05)
    args = ap.parse_args(argv)

    from popsift_tpu.io.pgm import read_pgm

    rows = []
    all_ok = True
    for scene in args.scenes:
        for img in args.images:
            src = None
            for ext in (".pgm", ".ppm"):
                p = os.path.join(args.dataset, scene, img + ext)
                if os.path.exists(p):
                    src = p
                    break
            ref_dir = os.path.join(args.reference, scene, f"output-{img}")
            if src is None or not os.path.isdir(ref_dir):
                continue
            out_dir = os.path.join(args.out, scene, f"output-{img}")
            produce_output_tree(read_pgm(src), out_dir)

            ok1, m1 = compare_pgm_dir(
                os.path.join(out_dir, "dir-octave"),
                os.path.join(ref_dir, "dir-octave"),
                args.tol_img_mean, args.tol_img_frac)
            ok2, m2 = compare_pgm_dir(
                os.path.join(out_dir, "dir-dog"),
                os.path.join(ref_dir, "dir-dog"),
                args.tol_img_mean, args.tol_img_frac)
            ok3, m3 = compare_features(
                os.path.join(out_dir, "features.txt"),
                os.path.join(ref_dir, "features.txt"),
                args.kp_eps, args.min_repeatability, args.tol_desc_l2)
            ok = ok1 and ok2 and ok3
            all_ok &= ok
            rows.append((scene, img, ok, m1, m2, m3))
            print(f"{scene}/{img}: {'OK ' if ok else 'BAD'} | "
                  f"pyramid: {m1} | dog: {m2} | features: {m3}")

    if not rows:
        print("No (dataset image, reference output) pairs found — "
              "nothing compared.", file=sys.stderr)
        return 2
    n_ok = sum(1 for r in rows if r[2])
    print(f"\n{n_ok}/{len(rows)} images pass parity.")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
