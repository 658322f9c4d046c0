"""Per-stage device time of the fused staged program, via dispatch-count
slope (immune to the tunnel's variable sync floor)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.extract import normalize_input  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    images_np = [normalize_input(make_1080p_image(s)) for s in range(4)]
    images = [jax.device_put(jnp.asarray(i)) for i in images_np]

    for img in images:
        ex.extract(img)
    cks, ks, bs = ex._last_buckets
    print("buckets:", cks, ks, bs, flush=True)

    def cut(stage):
        def fn(image):
            s1 = ex._stage1a_fn(image)
            if stage == "stage1a":
                return s1["cand_counts"]
            exts, counts, overflows = ex._stage1b_body(
                s1["dogs"], s1["cands"], cks)
            if stage == "refine":
                return counts
            oris, ori_counts, _ = ex._stage2_body(s1["grads"], exts, ks)
            if stage == "orient":
                return ori_counts
            descs, _, _ = ex._stage3_body(s1["grads"], s1["stacks"],
                                          exts, oris, ks, bs)
            return jnp.stack([jnp.sum(d) for d in descs if d.shape[0]])
        return jax.jit(fn)

    def slope(fn):
        def run(k):
            outs = [fn(images[i % 4]) for i in range(k)]
            jax.block_until_ready(outs[-1])
        run(2)
        ts = {}
        for k in (2, 10):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                run(k)
                best = min(best, time.time() - t0)
            ts[k] = best
        return (ts[10] - ts[2]) / 8 * 1e3

    prev = 0.0
    for stage in ["stage1a", "refine", "orient", "desc"]:
        fn = cut(stage)
        t0 = time.time()
        np.asarray(fn(images[0]))
        cs = time.time() - t0
        dt = slope(fn)
        print(f"{stage:10s} compile {cs:6.1f}s  device-prefix {dt:8.1f} ms  "
              f"delta {dt - prev:8.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
