"""Per-mode descriptor-stage timing on TPU (VERDICT round-2 item 6).

Times all five DescModes' descriptor functions at a realistic slot count
and window size (the dispatch surface of extract._dispatch_descriptors),
using dispatch-count slopes; writes the table for docs/DESIGN.md.

Reference bar: notile is the reference's fastest mode on its GPU
(s_desc_notile.cu:18-22); on TPU the loop mode's fused in-VMEM binning
kernel (kernels/binwin.py) is expected to win.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.constants import build_const_info  # noqa: E402
from popsift_tpu.ops import descriptors as ops_desc  # noqa: E402
from popsift_tpu.ops.gradients import padded_gradient_field  # noqa: E402


def timed(label, mk, k=12):
    fn = jax.jit(mk)
    fn().block_until_ready()
    t0 = time.time()
    outs = [fn() for _ in range(2)]
    outs[-1].block_until_ready()
    t1 = time.time()
    outs = [fn() for _ in range(2 + k)]
    outs[-1].block_until_ready()
    dt = ((time.time() - t1) - (t1 - t0)) / k * 1e3
    print(f"| {label:8s} | {dt:7.2f} |", flush=True)
    return dt


def main():
    rng = np.random.default_rng(7)
    L, h, w = 3, 540, 960
    n = 1536
    win = 112
    stack = rng.random((L, h, w)).astype(np.float32)
    pad_y, pad_x = 120, 256
    consts = build_const_info(Config())

    bothp = jax.device_put(padded_gradient_field(
        jnp.asarray(stack), pad_y, pad_x))
    stackp = jax.device_put(jnp.pad(
        jnp.asarray(stack), ((0, 0), (pad_y, pad_y), (pad_x, pad_x)),
        mode="edge"))
    x = jnp.asarray(rng.uniform(2, w - 3, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(2, h - 3, n).astype(np.float32))
    lv = jnp.asarray(rng.integers(0, L, n).astype(np.int32))
    sig = jnp.asarray(rng.uniform(1.2, 4.9, n).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
    vld = jnp.asarray(rng.random(n) < 0.9)

    print(f"# descriptor stage, {n} slots, win={win}, "
          f"octave {w}x{h} (ms per call)")
    print("| mode     | ms      |")
    print("|----------|---------|")
    timed("loop", lambda: ops_desc.loop_descriptors(
        bothp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win))
    timed("iloop", lambda: ops_desc.iloop_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win))
    timed("grid", lambda: ops_desc.grid_rounded_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win))
    timed("igrid", lambda: ops_desc.grid_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win,
        consts.desc_gauss, consts.desc_tile))
    timed("notile", lambda: ops_desc.grid_descriptors_windowed(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win,
        consts.desc_gauss, consts.desc_tile))
    # MXU-contracted bilinear sampling (round-5 igrid/notile speed path)
    timed("ntl-mm", lambda: ops_desc.grid_descriptors_windowed_mm(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win,
        consts.desc_gauss, consts.desc_tile))
    timed("grid-mm", lambda: ops_desc.grid_rounded_descriptors_windowed_mm(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win))
    timed("ilp-mm", lambda: ops_desc.iloop_descriptors_windowed_mm(
        stackp, pad_y, pad_x, x, y, lv, sig, ang, vld, w, h, win))


if __name__ == "__main__":
    main()
