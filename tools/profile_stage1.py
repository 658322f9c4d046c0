"""Honest sub-profiling of stage 1 (distinct inputs + forced fetch)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.extract import make_plan, normalize_input  # noqa: E402
from popsift_tpu.gauss import build_gauss_info  # noqa: E402
from popsift_tpu.ops import extrema as E  # noqa: E402
from popsift_tpu.ops import gradients as G  # noqa: E402
from popsift_tpu.ops import pyramid as P  # noqa: E402


def main():
    h, w = 1080, 1920
    cfg = Config()
    plan = make_plan(cfg, w, h)
    gauss = build_gauss_info(cfg)
    images = [jax.device_put(jnp.asarray(normalize_input(
        make_1080p_image(seed)))) for seed in range(3)]

    def cut(stage):
        def fn(image):
            stacks = P.build_pyramid(
                image, gauss, plan.dims, plan.levels, plan.gauss_mode,
                plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
            if stage == "pyramid":
                return sum(jnp.sum(s[-1]) for s in stacks)
            dogs = [P.make_dog(s) for s in stacks]
            if stage == "detect":
                acc = jnp.int32(0)
                for o in range(plan.octaves):
                    m = E.detect_candidates(dogs[o], plan.sift_mode,
                                            plan.peak_threshold)
                    acc += jnp.sum(m.astype(jnp.int32))
                return acc
            if stage == "compact":
                acc = jnp.int32(0)
                for o in range(plan.octaves):
                    m = E.detect_candidates(dogs[o], plan.sift_mode,
                                            plan.peak_threshold)
                    _, _, _, _, cnt, _ = E.compact_mask(
                        m, plan.cand_caps[o])
                    acc += cnt
                return acc
            if stage == "refine":
                acc = jnp.int32(0)
                for o in range(plan.octaves):
                    e = E.find_extrema(
                        dogs[o], plan.sift_mode, plan.sigma0, plan.sigma_k,
                        plan.peak_threshold, plan.edge_limit,
                        plan.filter_grid_size, plan.cand_caps[o],
                        plan.ext_caps[o])
                    acc += e.count
                return acc
            if stage == "grads":
                acc = jnp.float32(0)
                for o in range(plan.octaves):
                    mag, theta = G.gradient_fields(stacks[o])
                    acc += jnp.sum(mag)
                return acc
        return jax.jit(fn)

    for stage in (sys.argv[1:] or
                  ["pyramid", "detect", "compact", "refine", "grads"]):
        fn = cut(stage)
        t0 = time.time()
        v = float(np.asarray(fn(images[0])))
        cs = time.time() - t0
        t0 = time.time()
        for img in images:
            v = float(np.asarray(fn(img)))
        dt = (time.time() - t0) / len(images) * 1e3
        print(f"{stage:10s} compile {cs:6.1f}s  {dt:8.1f} ms  (v={v:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
