"""Compare detection formulations + gradient-field variants on TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config, SiftMode  # noqa: E402
from popsift_tpu.extract import normalize_input  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402
from popsift_tpu.ops import pyramid as P  # noqa: E402


def slope(fn, args_list, k1=2, k2=8):
    def run(k):
        outs = [fn(args_list[i % len(args_list)]) for i in range(k)]
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


def det_shift26(dog, peak_threshold):
    levels = dog.shape[0] - 2
    h, w = dog.shape[-2], dog.shape[-1]
    center = dog[1:levels + 1]
    padded = jnp.pad(dog, ((0, 0), (1, 1), (1, 1)), mode="edge")
    nb_max = jnp.full_like(center, -jnp.inf)
    nb_min = jnp.full_like(center, jnp.inf)
    for dz in (-1, 0, 1):
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dz == 0 and dy == 1 and dx == 1:
                    continue
                nb = padded[1 + dz:levels + 1 + dz, dy:dy + h, dx:dx + w]
                nb_max = jnp.maximum(nb_max, nb)
                nb_min = jnp.minimum(nb_min, nb)
    is_ext = (center > nb_max) | (center < nb_min)
    gate = jnp.abs(center) >= 1.6 * peak_threshold
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    border = (xs >= 1) & (xs < w - 1) & (ys >= 1) & (ys < h - 1)
    return is_ext & gate & border


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    plan = ex.plan
    images = [jax.device_put(jnp.asarray(normalize_input(
        make_1080p_image(s)))) for s in range(4)]

    def mk_dogs(image):
        stacks = P.build_pyramid(
            image, ex.gauss, plan.dims, plan.levels, plan.gauss_mode,
            plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
        return [P.make_dog(s) for s in stacks]

    dogs_per_img = []
    for img in images:
        d = jax.jit(mk_dogs)(img)
        jax.block_until_ready(d)
        dogs_per_img.append(d)

    from popsift_tpu.ops.extrema import detect_candidates

    def cur(dogs):
        return [jnp.sum(detect_candidates(d, plan.sift_mode,
                                          plan.peak_threshold)
                        .astype(jnp.int32)) for d in dogs]

    def s26(dogs):
        return [jnp.sum(det_shift26(d, plan.peak_threshold)
                        .astype(jnp.int32)) for d in dogs]

    t = slope(jax.jit(cur), dogs_per_img)
    print(f"detect separable (current) {t:7.2f} ms", flush=True)
    t = slope(jax.jit(s26), dogs_per_img)
    print(f"detect 26-shift            {t:7.2f} ms", flush=True)

    # gradient variants
    from popsift_tpu.ops.gradients import gradient_fields

    def grad_f32(stacks):
        outs = []
        for s in stacks:
            m, t_ = gradient_fields(s)
            outs.append(jnp.sum(m[-1]) + jnp.sum(t_[-1]))
        return jnp.stack(outs)

    stacks_per_img = []
    for img in images:
        s = jax.jit(lambda im: P.build_pyramid(
            im, ex.gauss, plan.dims, plan.levels, plan.gauss_mode,
            plan.scaling_mode, plan.sift_mode, plan.upscale_factor))(img)
        jax.block_until_ready(s)
        stacks_per_img.append(s)

    t = slope(jax.jit(grad_f32), stacks_per_img)
    print(f"gradients f32              {t:7.2f} ms", flush=True)

    from popsift_tpu.extract import grad_pad_dims
    from popsift_tpu.ops.gradients import padded_gradient_field
    pad_y, pad_x = grad_pad_dims(plan)

    def gradp(stacks):
        outs = []
        for s in stacks:
            g = padded_gradient_field(s, pad_y, pad_x)
            outs.append(jnp.sum(g[0, pad_y]))
        return jnp.stack(outs)

    t = slope(jax.jit(gradp), stacks_per_img)
    print(f"padded gradient field      {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
