"""Honest sub-profiling of stage 1a pieces on TPU."""

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
from popsift_tpu.ops import extrema as E  # noqa: E402
from popsift_tpu.ops import gradients as G  # noqa: E402
from popsift_tpu.ops import pyramid as P  # noqa: E402


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    plan = ex.plan
    images = [jax.device_put(jnp.asarray(normalize_input(
        make_1080p_image(s)))) for s in range(4)]

    def cut(stage):
        def fn(image):
            stacks = P.build_pyramid(
                image, ex.gauss, plan.dims, plan.levels, plan.gauss_mode,
                plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
            if stage == "pyr":
                return jnp.stack([jnp.sum(s[-1])
                                  for s in stacks])
            dogs = [P.make_dog(s) for s in stacks]
            if stage == "dog":
                return jnp.stack([jnp.sum(d[-1])
                                  for d in dogs])
            masks = [E.detect_candidates(d, plan.sift_mode,
                                         plan.peak_threshold)
                     for d in dogs]
            if stage == "det":
                return jnp.stack([jnp.sum(m.astype(jnp.int32))
                                  for m in masks])
            cands = [E.compact_mask(m, plan.cand_caps[o])
                     for o, m in enumerate(masks)]
            if stage == "cmp":
                return jnp.stack([c[4] for c in cands])
            if stage == "grad":
                grads = [G.gradient_fields(s) for s in stacks]
                return jnp.stack([jnp.sum(g[0][-1]) for g in grads])
            from popsift_tpu.extract import grad_pad_dims
            pad_y, pad_x = grad_pad_dims(plan)
            gradsp = [G.padded_gradient_field(s, pad_y, pad_x)
                      for s in stacks]
            return jnp.stack([jnp.sum(g[-1, -1]) for g in gradsp])
        return jax.jit(fn)

    def slope(fn, k1=2, k2=8):
        def run(k):
            outs = [fn(images[i % 4]) for i in range(k)]
            jax.block_until_ready(outs[-1])
        run(2)
        ts = {}
        for k in (k1, k2):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                run(k)
                best = min(best, time.time() - t0)
            ts[k] = best
        return (ts[k2] - ts[k1]) / (k2 - k1) * 1e3

    prev = 0.0
    for stage in ["pyr", "dog", "det", "cmp", "grad", "gradp"]:
        fn = cut(stage)
        t0 = time.time()
        np.asarray(fn(images[0]))
        cs = time.time() - t0
        dt = slope(fn)
        print(f"{stage:6s} compile {cs:6.1f}s  device-prefix {dt:8.1f} ms  "
              f"delta {dt - prev:8.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
