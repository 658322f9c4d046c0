"""Oxford-protocol-shaped repeatability/matching evaluation on REAL
photographs (round-4 VERDICT task 8).

The reference's accuracy harness runs 8 scenes x 6 images of the Oxford
affine dataset and byte-compares dumps against stored goldens
(/root/reference/testScripts/testOxfordDataset.sh.in).  The dataset is
not fetchable here (zero egress), so this tool reproduces the PROTOCOL
SHAPE on checked-in real photographs (tests/data/scenes/*.pgm — crops of
the sample photographs shipped with matplotlib / scikit-learn / pygame):
8 scenes x 6 images, where img2..img6 apply the Oxford transformation
families at increasing magnitude with KNOWN ground-truth homographies —

  zoom+rotation (bark/boat), gaussian blur (bikes/trees), viewpoint
  affine (graf/wall), decreasing light (leuven), jpeg compression (ubc)

— and measures, per SiftMode, what the Oxford evaluation measures:
keypoint repeatability, descriptor matching score (Lowe-ratio matches
that are geometrically correct), and the median descriptor L2 between
geometrically matched pairs.  Pass bar mirrors BASELINE.md: mean img1-2
repeatability >= 0.60 and mean matching score >= 0.45 at the easiest
transform level (the published Oxford curves fall well below 50% at the
hardest levels for every detector; the early levels are the
discriminative ones for implementation bugs).

Usage:
    python tools/oxford_protocol.py [--modes popsift vlfeat opencv]
        [--scenes hopper china ...] [--out PARITY_r05.json]
"""

from __future__ import annotations

import argparse
import io
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data", "scenes")

# scene -> Oxford transformation family (8 scenes, one per Oxford scene
# slot; the family decides how img2..img6 are derived from img1)
FAMILIES = {
    "hopper": "zoomrot",      # ~bark
    "china": "blur",          # ~bikes
    "china_l": "zoomrot",     # ~boat
    "flower": "viewpoint",    # ~graf
    "flower_r": "light",      # ~leuven
    "camera": "blur",         # ~trees
    "average": "jpeg",        # ~ubc
    "street": "viewpoint",    # ~wall
}


def load_scene(name: str) -> np.ndarray:
    from popsift_tpu.io.pgm import read_pgm
    return np.asarray(read_pgm(os.path.join(SCENE_DIR, f"{name}.pgm")),
                      np.uint8)


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    span = max(int(math.ceil(3 * sigma)), 1)
    xs = np.arange(-span, span + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    f = img.astype(np.float64)
    f = np.apply_along_axis(
        lambda r: np.convolve(np.pad(r, span, mode="edge"), k,
                              mode="valid"), 1, f)
    f = np.apply_along_axis(
        lambda c: np.convolve(np.pad(c, span, mode="edge"), k,
                              mode="valid"), 0, f)
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def jpeg_roundtrip(img: np.ndarray, quality: int) -> np.ndarray:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("L"), np.uint8)


def make_sequence(img: np.ndarray, family: str):
    """img2..img6 of a scene + their ground-truth affine (A, t) mapping
    img1 coordinates -> imgN coordinates (identity for the photometric
    families, exactly like the Oxford H matrices are identity-free for
    blur/jpeg/light scenes)."""
    from popsift_tpu.eval.repeatability import warp_affine
    h, w = img.shape
    eye = np.eye(2)
    z2 = np.zeros(2)
    out = []
    for k in range(1, 6):
        if family == "blur":
            out.append((gaussian_blur(img, 0.8 * k), eye, z2))
        elif family == "jpeg":
            q = [75, 50, 30, 18, 10][k - 1]
            out.append((jpeg_roundtrip(img, q), eye, z2))
        elif family == "light":
            f = 1.0 - 0.15 * k
            out.append((np.clip(np.round(img * f), 0, 255)
                        .astype(np.uint8), eye, z2))
        elif family == "zoomrot":
            ang = math.radians(6.0 * k)
            s = 1.0 / (1.0 + 0.08 * k)
            A = s * np.array([[math.cos(ang), -math.sin(ang)],
                              [math.sin(ang), math.cos(ang)]])
            c = np.array([w / 2.0, h / 2.0])
            t = c - A @ c
            out.append((warp_affine(img, A, t), A, t))
        elif family == "viewpoint":
            # increasing horizontal shear + mild anisotropic scale — the
            # affine core of a viewpoint change
            sh = 0.08 * k
            sx = 1.0 - 0.05 * k
            A = np.array([[sx, sh], [0.0, 1.0]])
            c = np.array([w / 2.0, h / 2.0])
            t = c - A @ c
            out.append((warp_affine(img, A, t), A, t))
        else:
            raise ValueError(family)
    return out


def protocol_config(mode: str):
    from popsift_tpu.config import Config, SiftMode
    c = Config()
    c.set_mode({"popsift": SiftMode.POPSIFT, "vlfeat": SiftMode.VLFEAT,
                "opencv": SiftMode.OPENCV}[mode])
    return c


def desc_l2_stats(feats_a, feats_b, A, t, eps=3.0):
    """Median L2 between descriptors of geometrically matched keypoint
    pairs (one descriptor per keypoint: its first orientation)."""
    sa, sb = feats_a._soa, feats_b._soa
    na_, nb_ = feats_a.get_feature_count(), feats_b.get_feature_count()
    pa = np.stack([np.asarray(sa["xpos"][:na_]),
                   np.asarray(sa["ypos"][:na_])], 1) @ A.T + t
    pb = np.stack([np.asarray(sb["xpos"][:nb_]),
                   np.asarray(sb["ypos"][:nb_])], 1)
    if len(pa) == 0 or len(pb) == 0:
        return float("nan")
    da_all = np.asarray(feats_a.get_descriptors())
    db_all = np.asarray(feats_b.get_descriptors())
    ia_num = np.asarray(sa["num_ori"][:na_])
    ib_num = np.asarray(sb["num_ori"][:nb_])
    ia_idx = np.asarray(sa["desc_idx"][:na_])
    ib_idx = np.asarray(sb["desc_idx"][:nb_])
    d2 = ((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1)
    j = np.argmin(d2, 1)
    okm = d2[np.arange(len(pa)), j] <= eps * eps
    l2s = []
    for i in np.where(okm & (ia_num > 0))[0]:
        jb = j[i]
        if ib_num[jb] <= 0:
            continue
        da = da_all[ia_idx[i][0]]
        db = db_all[ib_idx[jb][0]]
        n_a = np.linalg.norm(da)
        n_b = np.linalg.norm(db)
        if n_a > 0 and n_b > 0:
            l2s.append(float(np.linalg.norm(da / n_a - db / n_b)))
    return float(np.median(l2s)) if l2s else float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["popsift", "vlfeat", "opencv"])
    ap.add_argument("--scenes", nargs="+", default=list(FAMILIES))
    ap.add_argument("--out", default="PARITY_r05.json")
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    from popsift_tpu.eval.repeatability import evaluate_pair
    from popsift_tpu.pipeline import PopSift

    results = {}
    for mode in args.modes:
        cfg = protocol_config(mode)
        rows = []
        with PopSift(cfg, workers=args.workers) as ps:
            # freeze a GENEROUS bucket key for the whole run: scene
            # keypoint counts swing 3x across the protocol, and every
            # adaptive regrow/shrink recompiles the ~85 s batch program
            # on this host — one padded key (invalid slots skip their
            # kernel DMAs, so padding is cheap) keeps the run to one
            # compile per mode
            from popsift_tpu.parallel.batch import _default_key
            from popsift_tpu.staged import get_staged_extractor
            img0 = load_scene(args.scenes[0])
            ex = get_staged_extractor(ps._config, img0.shape[1],
                                      img0.shape[0])
            ex._last_key5 = _default_key(ex.plan, 1536)
            ex._last_buckets = ex._last_key5[:3]
            # no count adaptation during the run (bucket-overflow regrow
            # still works; it installs its own grown key)
            ex._update_buckets = lambda *a, **k: None
            for scene in args.scenes:
                img1 = load_scene(scene)
                fam = FAMILIES[scene]
                seq = make_sequence(img1, fam)
                h, w = img1.shape
                jobs = [ps.enqueue(w, h, img1)]
                jobs += [ps.enqueue(w, h, im) for im, _, _ in seq]
                feats = [j.get() for j in jobs]
                for k, (imN, A, t) in enumerate(seq, start=2):
                    r = evaluate_pair(feats[0], feats[k - 1], A, t,
                                      imN.shape)
                    l2 = desc_l2_stats(feats[0], feats[k - 1], A, t)
                    rows.append(dict(
                        scene=scene, family=fam, pair=f"1-{k}",
                        repeatability=round(r.repeatability, 4),
                        matching_score=round(r.matching_score, 4),
                        desc_l2=round(l2, 4) if l2 == l2 else None,
                        n_ref=r.n_ref, n_warped=r.n_warped))
                    print(f"[{mode}] {scene:9s} {fam:9s} 1-{k}: "
                          f"rep={r.repeatability:.3f} "
                          f"match={r.matching_score:.3f} "
                          f"descL2={l2:.3f} "
                          f"({r.n_ref}/{r.n_warped} kp)", flush=True)
        easy = [r for r in rows if r["pair"] == "1-2"]
        summary = dict(
            mean_repeatability_12=round(float(np.mean(
                [r["repeatability"] for r in easy])), 4),
            mean_matching_score_12=round(float(np.mean(
                [r["matching_score"] for r in easy])), 4),
            mean_repeatability_all=round(float(np.mean(
                [r["repeatability"] for r in rows])), 4),
            median_desc_l2=round(float(np.median(
                [r["desc_l2"] for r in rows
                 if r["desc_l2"] is not None])), 4))
        results[mode] = dict(summary=summary, rows=rows)
        print(f"[{mode}] summary: {summary}", flush=True)

    ok = all(results[m]["summary"]["mean_repeatability_12"] >= 0.60
             and results[m]["summary"]["mean_matching_score_12"] >= 0.45
             for m in results)
    payload = dict(ok=ok, protocol="8 scenes x 6 images, Oxford "
                   "transformation families on real photographs",
                   scenes={s: FAMILIES[s] for s in args.scenes},
                   results=results)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{'PASS' if ok else 'FAIL'} -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
