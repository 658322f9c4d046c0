"""Per-stage TPU timing of the extraction pipeline (development tool)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def timed(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.1f} ms")
    return out


def main():
    h, w = 1080, 1920
    cfg = Config()
    plan = make_plan(cfg, w, h)
    gauss = build_gauss_info(cfg)
    consts = build_const_info(cfg)
    print("caps:", plan.ext_caps)
    print("ori caps:", plan.ori_caps)
    print("cand caps:", plan.cand_caps)

    img = jax.device_put(jnp.asarray(normalize_input(make_1080p_image())))

    pyr_fn = jax.jit(lambda x: P.build_pyramid(
        x, gauss, plan.dims, plan.levels, plan.gauss_mode,
        plan.scaling_mode, plan.sift_mode, plan.upscale_factor))
    stacks = timed("pyramid", pyr_fn, img)

    dog_fn = jax.jit(lambda s: [P.make_dog(x) for x in s])
    dogs = timed("dog", dog_fn, stacks)

    o = 0  # profile the largest octave
    det_fn = jax.jit(lambda d: E.detect_candidates(
        d, plan.sift_mode, plan.peak_threshold))
    mask = timed("detect[o0]", det_fn, dogs[o])

    cmp_fn = jax.jit(lambda m: E.compact_mask(m, plan.cand_caps[o]))
    cand = timed("compact[o0]", cmp_fn, mask)

    ref_fn = jax.jit(lambda d, cx, cy, cz, cv: E.refine_extrema(
        d, cx, cy, cz + 1, cv, plan.sift_mode, plan.sigma0, plan.sigma_k,
        plan.peak_threshold, plan.edge_limit,
        plan.dims[o][0] / plan.filter_grid_size,
        plan.dims[o][1] / plan.filter_grid_size, plan.filter_grid_size))
    refined = timed("refine[o0]", ref_fn, dogs[o], cand[0], cand[1],
                    cand[2], cand[3])

    cex_fn = jax.jit(lambda *a: E.compact_extrema(*a, plan.ext_caps[o]))
    ext = timed("compact_ext[o0]", cex_fn, *refined)
    print("  ext count:", int(ext.count))

    from popsift_tpu.extract import grad_pad_dims
    pad_y, pad_x = grad_pad_dims(plan)
    grad_fn = jax.jit(lambda st: G.padded_gradient_field(st, pad_y, pad_x))
    field = timed("gradients[o0]", grad_fn, stacks[o])

    wgt, hgt = plan.dims[o]
    ori_fn = jax.jit(lambda f, e: O.assign_orientations(
        f, pad_y, pad_x, e.xpos, e.ypos, e.lpos, e.sigma, e.valid,
        wgt, hgt, plan.ori_win))
    num_ori, oris = timed("orientation[o0]", ori_fn, field, ext)

    ocap = plan.ori_caps[o]
    ang = jnp.zeros((ocap,), jnp.float32)
    ovalid = jnp.arange(ocap) < jnp.sum(jnp.where(ext.valid, num_ori, 0))
    idx = jnp.clip(jnp.arange(ocap), 0, plan.ext_caps[o] - 1)
    desc_fn = jax.jit(lambda f, e: D.loop_descriptors(
        f, pad_y, pad_x, e.xpos[idx], e.ypos[idx], e.lpos[idx],
        e.sigma[idx], ang, ovalid, wgt, hgt, plan.desc_win))
    timed("descriptors[o0]", desc_fn, field, ext)

    grid_fn = jax.jit(lambda s, e: D.grid_descriptors(
        s, e.xpos[idx], e.ypos[idx], e.lpos[idx], e.sigma[idx],
        ang, ovalid, consts.desc_gauss, consts.desc_tile))
    timed("grid_desc[o0]", grid_fn, stacks[o], ext)


if __name__ == "__main__":
    main()
