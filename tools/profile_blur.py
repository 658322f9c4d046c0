"""Blur-stage microbench: where does the pyramid's device time go?

Dispatch-count slopes (k dispatches, one sync) over octave-0-sized
planes; separates the XLA edge-pad copy, the Pallas kernel itself, and
the per-level chain that build_pyramid actually runs.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.gauss import build_gauss_info  # noqa: E402
from popsift_tpu.kernels.blur import (_sep_blur_pallas,  # noqa: E402
                                      sep_blur_fused,
                                      sep_blur_fused_with_dog)


def _sync(out):
    """Force REAL completion: on the axon remote backend
    jax.block_until_ready can return without blocking (verified: a 250 ms
    fori_loop 'blocked' in 0.1 ms); fetching a tiny slice always blocks,
    and in-order execution makes it a barrier for everything enqueued
    before it.  The fetch RTT is constant and cancels in the slope."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])


def slope(label, fn, args, lo=2, hi=10, reps=3):
    def run(k):
        outs = [fn(args[i % len(args)]) for i in range(k)]
        _sync(outs[-1])
    run(2)
    ts = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            run(k)
            best = min(best, time.time() - t0)
        ts[k] = best
    ms = (ts[hi] - ts[lo]) / (hi - lo) * 1e3
    print(f"{label:34s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    gauss = build_gauss_info(Config())
    h0, w0 = 2160, 3840
    rng = np.random.default_rng(0)
    planes = [jax.device_put(rng.random((h0, w0)).astype(np.float32))
              for _ in range(3)]

    spans = [int(s) for s in gauss.inc.span[:6]]
    print(f"# inc spans: {spans}", flush=True)
    span = spans[5]
    taps = tuple(float(t) for t in np.asarray(gauss.inc.filter[5])[:span])

    halo = -(-(span - 1) // 8) * 8
    pad_x = -(-(span - 1) // 128) * 128
    bh = 32
    h_pad = (-(-h0 // bh)) * bh
    w128 = (-(-w0 // 128)) * 128

    fpad = jax.jit(lambda x: jnp.pad(
        x, ((halo, halo + (h_pad - h0)), (pad_x, pad_x + (w128 - w0))),
        mode="edge"))
    slope("xla edge-pad o0", fpad, planes)

    padded = [jax.device_put(np.asarray(fpad(p))) for p in planes]
    fkern = jax.jit(lambda x: _sep_blur_pallas(
        x, taps, span, taps, span, 1.0, h0, w128))
    slope(f"pallas blur only (span={span})", fkern, padded)

    fkdog = jax.jit(lambda x: _sep_blur_pallas(
        x, taps, span, taps, span, 1.0, h0, w128, emit_dog=True))
    slope("pallas blur+dog only", fkdog, padded)

    ffull = jax.jit(lambda x: sep_blur_fused(x, np.asarray(taps), span))
    slope("pad + blur (sep_blur_fused)", ffull, planes)

    def chain(x):
        outs = []
        for lvl in range(1, 6):
            x, dog = sep_blur_fused_with_dog(
                x, np.asarray(gauss.inc.filter[lvl]),
                int(gauss.inc.span[lvl]))
            outs.append(dog)
        return x, jnp.stack(outs)
    slope("5-level inc chain (as built)", jax.jit(chain), planes)

    # copy bandwidth yardstick
    fcopy = jax.jit(lambda x: x + 1.0)
    slope("elementwise copy o0 (yardstick)", fcopy, planes)


if __name__ == "__main__":
    main()
