"""Break down the refine stage: gather27 DMA vs Newton arithmetic vs
compaction, measured by dispatch-count slope on the real candidate
distribution of the bench scene."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402
from popsift_tpu.ops import extrema as ops_ext  # noqa: E402


def slope(fn, args, reps=(2, 12)):
    def run(k):
        outs = [fn(*args) for _ in range(k)]
        jax.block_until_ready(outs[-1])
    run(2)
    ts = {}
    for k in reps:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run(k)
            best = min(best, time.time() - t0)
        ts[k] = best
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    img = jax.device_put(np.asarray(make_1080p_image(0)))
    ex.extract_features(img)
    ex.extract_features(img)
    cks, ks, bs, ft, bt = ex._last_key5
    print("cks", cks)

    s1 = jax.jit(ex._stage1a_fn)(img)
    jax.block_until_ready(s1["cand_counts"])
    plan = ex.plan

    # full stage1b
    f_full = jax.jit(lambda dogs, cands: ex._stage1b_body(dogs, cands, cks))
    t = slope(f_full, (s1["dogs"], s1["cands"]))
    print(f"stage1b total                {t:7.2f} ms")

    # refine only (no compaction/grid filter)
    def refine_only(dogs, cands):
        outs = []
        for o in range(plan.octaves):
            ck = cks[o]
            if ck == 0:
                continue
            cx, cy, cz, cvalid = cands[o]
            ww, hh = plan.dims[o]
            outs.append(ops_ext.refine_extrema(
                dogs[o], cx[:ck], cy[:ck], cz[:ck] + 1, cvalid[:ck],
                plan.sift_mode, plan.sigma0, plan.sigma_k,
                plan.peak_threshold, plan.edge_limit,
                grid_w_div=ww / plan.filter_grid_size,
                grid_h_div=hh / plan.filter_grid_size,
                grid_width=plan.filter_grid_size))
        return outs
    t = slope(jax.jit(refine_only), (s1["dogs"], s1["cands"]))
    print(f"refine only                  {t:7.2f} ms")

    # single gather27 pass over all octaves (iteration-1 cost)
    def gather_once(dogs, cands):
        outs = []
        for o in range(plan.octaves):
            ck = cks[o]
            if ck == 0:
                continue
            cx, cy, cz, cvalid = cands[o]
            hh, ww = dogs[o].shape[-2], dogs[o].shape[-1]
            hp = max(-(-hh // 8) * 8, 16)
            wp = max(-(-ww // 128) * 128, 256)
            dogp = jnp.pad(dogs[o], ((0, 0), (0, hp - hh), (0, wp - ww)),
                           mode="edge")
            outs.append(ops_ext._gather27(
                dogp, cx[:ck].astype(jnp.int32), cy[:ck].astype(jnp.int32),
                (cz[:ck] + 1).astype(jnp.int32),
                active=cvalid[:ck]))
        return outs
    t = slope(jax.jit(gather_once), (s1["dogs"], s1["cands"]))
    print(f"gather27 x1 (+pad)           {t:7.2f} ms")

    # pad-only cost
    def pad_only(dogs):
        outs = []
        for o in range(plan.octaves):
            if cks[o] == 0:
                continue
            hh, ww = dogs[o].shape[-2], dogs[o].shape[-1]
            hp = max(-(-hh // 8) * 8, 16)
            wp = max(-(-ww // 128) * 128, 256)
            outs.append(jnp.pad(dogs[o],
                                ((0, 0), (0, hp - hh), (0, wp - ww)),
                                mode="edge") * 1.000001)
        return outs
    t = slope(jax.jit(pad_only), (s1["dogs"],))
    print(f"pad only                     {t:7.2f} ms")


if __name__ == "__main__":
    main()
