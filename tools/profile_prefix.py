"""Prefix-based TPU profile: compile the pipeline cut at increasing stages
and diff the runtimes (development tool)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.constants import build_const_info  # noqa: E402
from popsift_tpu.extract import make_plan, normalize_input  # noqa: E402
from popsift_tpu.gauss import build_gauss_info  # noqa: E402
from popsift_tpu.ops import descriptors as D  # noqa: E402
from popsift_tpu.ops import extrema as E  # noqa: E402
from popsift_tpu.ops import gradients as G  # noqa: E402
from popsift_tpu.ops import orientation as O  # noqa: E402
from popsift_tpu.ops import pyramid as P  # noqa: E402


def build(stage: str, plan, gauss, consts):
    def fn(image):
        stacks = P.build_pyramid(
            image, gauss, plan.dims, plan.levels, plan.gauss_mode,
            plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
        if stage == "pyramid":
            return stacks
        dogs = [P.make_dog(s) for s in stacks]
        exts = [E.find_extrema(
            dogs[o], plan.sift_mode, plan.sigma0, plan.sigma_k,
            plan.peak_threshold, plan.edge_limit, plan.filter_grid_size,
            plan.cand_caps[o], plan.ext_caps[o])
            for o in range(plan.octaves)]
        if stage == "extrema":
            return exts
        from popsift_tpu.extract import grad_pad_dims
        pad_y, pad_x = grad_pad_dims(plan)
        grads = [G.padded_gradient_field(s, pad_y, pad_x) for s in stacks]
        if stage == "gradients":
            return grads
        oris = []
        for o in range(plan.octaves):
            w, h = plan.dims[o]
            oris.append(O.assign_orientations(
                grads[o], pad_y, pad_x,
                exts[o].xpos, exts[o].ypos, exts[o].lpos,
                exts[o].sigma, exts[o].valid, w, h, plan.ori_win))
        if stage == "orientation":
            return oris
        descs = []
        for o in range(plan.octaves):
            w, h = plan.dims[o]
            ocap = plan.ori_caps[o]
            num_ori, angs = oris[o]
            nums = jnp.where(exts[o].valid, num_ori, 0)
            incl = jnp.cumsum(nums)
            idx_ori = incl - nums
            j = jnp.arange(ocap, dtype=jnp.int32)
            fmap = jnp.searchsorted(incl, j, side="right").astype(jnp.int32)
            ovalid = j < jnp.minimum(incl[-1], ocap)
            e = jnp.clip(fmap, 0, plan.ext_caps[o] - 1)
            k = jnp.clip(j - idx_ori[e], 0, 3)
            ang = angs[e, k]
            descs.append(D.loop_descriptors(
                grads[o], pad_y, pad_x, exts[o].xpos[e], exts[o].ypos[e],
                exts[o].lpos[e], exts[o].sigma[e], ang, ovalid,
                w, h, plan.desc_win))
        return descs

    return jax.jit(fn)


def main():
    h, w = 1080, 1920
    cfg = Config()
    plan = make_plan(cfg, w, h)
    gauss = build_gauss_info(cfg)
    consts = build_const_info(cfg)
    img = jax.device_put(jnp.asarray(normalize_input(make_1080p_image())))

    stages = sys.argv[1:] or ["pyramid", "extrema", "gradients",
                              "orientation", "full"]
    prev = 0.0
    for stage in stages:
        fn = build(stage, plan, gauss, consts)
        t0 = time.time()
        out = jax.block_until_ready(fn(img))
        compile_s = time.time() - t0
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            out = fn(img)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters * 1e3
        print(f"{stage:12s} compile {compile_s:6.1f}s  cumulative "
              f"{dt:8.1f} ms  delta {dt - prev:8.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
