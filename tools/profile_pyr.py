"""Pyramid-internal TPU profiling."""

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
from popsift_tpu.ops import pyramid as P  # noqa: E402
from popsift_tpu.kernels.blur import sep_blur_fused  # noqa: E402


def timed(label, fn, args_list, lo=2, hi=8, reps=3):
    """Dispatch-count slope with a REAL tiny fetch as the barrier (the
    axon backend's block_until_ready can return early; the fetch RTT is
    constant and cancels in the slope)."""
    def run(k):
        outs = [fn(args_list[i % len(args_list)]) for i in range(k)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[:1])
    run(2)
    ts = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            run(k)
            best = min(best, time.time() - t0)
        ts[k] = best
    print(f"{label:26s} {(ts[hi] - ts[lo]) / (hi - lo) * 1e3:8.1f} ms",
          flush=True)


def main():
    cfg = Config()
    plan = make_plan(cfg, 1920, 1080)
    gauss = build_gauss_info(cfg)
    images = [jax.device_put(jnp.asarray(normalize_input(
        make_1080p_image(s)))) for s in range(4)]

    h0, w0 = 2160, 3840

    f_res = jax.jit(lambda im: jnp.sum(
        P.resample_input(im, h0, w0, 1.0)))
    timed("resample o0", f_res, images)

    def lvl0(im):
        base = P.resample_input(im, h0, w0, 1.0)
        out = P._fused(base, gauss.dd.filter[0], gauss.dd.span[0],
                       gauss.inc.filter[0], gauss.inc.span[0], 255.0)
        return jnp.sum(out)
    timed("resample+level0 o0", jax.jit(lvl0), images)

    def oct0(im):
        stacks = P.build_pyramid(
            im, gauss, plan.dims[:1], plan.levels, plan.gauss_mode,
            plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
        return jnp.sum(stacks[0])
    timed("octave0 full (6 levels)", jax.jit(oct0), images)

    for k in (1, 2, 3, 5, 9):
        def allp(im, k=k):
            stacks = P.build_pyramid(
                im, gauss, plan.dims[:k], plan.levels, plan.gauss_mode,
                plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
            return jnp.stack([jnp.sum(s) for s in stacks])
        timed(f"octaves 0..{k - 1}", jax.jit(allp), images)

    # standalone fused blur at octave-0 size, largest span
    big = [jax.device_put(jnp.asarray(np.random.default_rng(s).random(
        (h0, w0)).astype(np.float32))) for s in range(4)]
    spn = int(gauss.inc.span[5])
    taps = gauss.inc.filter[5]
    f_blur = jax.jit(lambda x: jnp.sum(
        sep_blur_fused(x, taps, spn)))
    timed(f"blur kernel o0 span={spn}", f_blur, big)

    # 6 sequential blurs (chained like the incremental levels)
    def chain(x):
        for lvl in range(6):
            x = sep_blur_fused(x, gauss.inc.filter[lvl],
                               int(gauss.inc.span[lvl]))
        return jnp.sum(x)
    timed("6 chained blurs o0", jax.jit(chain), big)


if __name__ == "__main__":
    main()
