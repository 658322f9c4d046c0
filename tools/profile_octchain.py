"""Tune the fused octave-chain kernel (kernels/octave.py) on the TPU.

Times octave_chain_fused at the 1080p octave-0/1 shapes against the
per-level path (sep_blur_fused_with_dog chain + gradient_field_fused)
via dispatch-count slope over distinct inputs (per-call wall times lie
under the tunnel's RTT; block_until_ready is only reliable on big array
outputs).  Usage: python tools/profile_octchain.py [--row-block N]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.extract import make_plan  # noqa: E402
from popsift_tpu.gauss import build_gauss_info  # noqa: E402


def slope(f, imgs, lo=2, hi=8):
    ts = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [f(imgs[i % len(imgs)]) for i in range(k)]
            jax.block_until_ready(outs[-1])
            best = min(best, time.time() - t0)
        ts[k] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row-block", type=int, default=0,
                    help="override kernels.octave._row_block")
    ap.add_argument("--dims", default="2160x3840")
    args = ap.parse_args()

    from popsift_tpu.kernels import octave as K
    from popsift_tpu.kernels.blur import sep_blur_fused_with_dog
    from popsift_tpu.kernels.grad import gradient_field_fused

    if args.row_block:
        K._row_block = lambda h, _b=args.row_block: _b

    cfg = Config()
    plan = make_plan(cfg, 1920, 1080)
    gauss = build_gauss_info(cfg)
    L = plan.levels + 3
    spans = (1,) + tuple(int(gauss.inc.span[l]) for l in range(1, L))
    filters = ([np.ones(1, np.float32)]
               + [np.asarray(gauss.inc.filter[l]) for l in range(1, L)])

    h, w = (int(t) for t in args.dims.split("x"))
    rng = np.random.default_rng(0)
    imgs = [jax.device_put(jnp.asarray(
        rng.random((h, w)).astype(np.float32) * 255.0)) for _ in range(4)]

    @jax.jit
    def chain(lvl0):
        return K.octave_chain_fused(lvl0, filters, spans,
                                    emit_stack=False, emit_field=True,
                                    stack_levels=(L - 3,))

    @jax.jit
    def perlevel(lvl0):
        lvls = [lvl0]
        dogs = []
        for lvl in range(1, L):
            nxt, dog = sep_blur_fused_with_dog(
                lvls[-1], gauss.inc.filter[lvl], int(gauss.inc.span[lvl]))
            lvls.append(nxt)
            dogs.append(dog)
        stack = jnp.stack(lvls)
        return stack[L - 3], jnp.stack(dogs), gradient_field_fused(stack)

    t0 = time.time(); jax.block_until_ready(chain(imgs[0]))
    print(f"chain compile {time.time() - t0:.1f}s")
    t0 = time.time(); jax.block_until_ready(perlevel(imgs[0]))
    print(f"perlevel compile {time.time() - t0:.1f}s")
    for name, f in (("chain", chain), ("perlevel", perlevel),
                    ("chain", chain), ("perlevel", perlevel)):
        print(f"{name:9s} {args.dims} rb={args.row_block or 'default'}: "
              f"{slope(f, imgs):.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
