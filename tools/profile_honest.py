"""Honest TPU timing: distinct inputs per call + forced scalar fetch."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.extract import get_extractor, normalize_input  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402


def main():
    h, w = 1080, 1920
    cfg = Config()

    images = [jax.device_put(jnp.asarray(normalize_input(
        make_1080p_image(seed)))) for seed in range(4)]

    what = sys.argv[1] if len(sys.argv) > 1 else "all"

    if what in ("all", "mono"):
        fn, plan = get_extractor(cfg, w, h)
        t0 = time.time()
        r = fn(images[0])
        c = int(np.asarray(sum(od["count"] for od in r["octaves"])))
        print(f"mono compile+1st {time.time() - t0:.1f}s ext={c}",
              flush=True)
        t0 = time.time()
        for img in images:
            r = fn(img)
            c = int(np.asarray(sum(od["count"] for od in r["octaves"])))
        dt = (time.time() - t0) / len(images)
        print(f"mono: {dt * 1e3:.1f} ms/image ({1 / dt:.2f} fps) last ext={c}",
              flush=True)

    if what in ("all", "staged"):
        ex = StagedExtractor(cfg, w, h)
        t0 = time.time()
        out = ex.extract(images[0])
        print(f"staged compile+1st {time.time() - t0:.1f}s "
              f"ext={sum(int(od['count']) for od in out['octaves'])}",
              flush=True)
        # second pass may compile more buckets
        for img in images:
            ex.extract(img)
        t0 = time.time()
        for img in images:
            out = ex.extract(img)
        dt = (time.time() - t0) / len(images)
        print(f"staged: {dt * 1e3:.1f} ms/image ({1 / dt:.2f} fps) "
              f"buckets2={list(ex._stage2)} ", flush=True)

    if what in ("all", "stage1"):
        ex = StagedExtractor(cfg, w, h)
        s = ex._stage1(images[0])
        np.asarray(s["counts"])
        t0 = time.time()
        for img in images:
            s = ex._stage1(img)
            np.asarray(s["counts"])
        dt = (time.time() - t0) / len(images)
        print(f"stage1: {dt * 1e3:.1f} ms/image", flush=True)


if __name__ == "__main__":
    main()
