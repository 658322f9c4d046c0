"""Measure the axon tunnel: RTT, H2D/D2H bandwidth, parallel-stream scaling.

All numbers are wall-clock on blocking transfers; dispatch-slope methods
don't apply to pure wire measurements.
"""
from __future__ import annotations

import concurrent.futures as cf
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=5):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # RTT: tiny transfer each way
    tiny = np.zeros((8,), np.uint8)
    d_tiny = jax.device_put(tiny, dev)
    up_rtt = t(lambda: jax.device_put(tiny, dev).block_until_ready())
    down_rtt = t(lambda: np.asarray(d_tiny))
    print(f"RTT   up {up_rtt*1e3:7.1f} ms   down {down_rtt*1e3:7.1f} ms")

    # Bandwidth: 8 MB each way
    big = np.random.randint(0, 255, (8 * 1024 * 1024,), dtype=np.uint8)
    d_big = jax.device_put(big, dev)
    up_bw = 8 / t(lambda: jax.device_put(big, dev).block_until_ready(), 3)
    down_bw = 8 / t(lambda: np.asarray(d_big), 3)
    print(f"BW    up {up_bw:7.1f} MB/s  down {down_bw:7.1f} MB/s")

    # 2MB (one 1080p u8 frame) single-shot cost
    frame = np.random.randint(0, 255, (1080, 1920), dtype=np.uint8)
    up_1f = t(lambda: jax.device_put(frame, dev).block_until_ready(), 5)
    print(f"1080p u8 frame up: {up_1f*1e3:.1f} ms "
          f"({frame.nbytes/2**20/up_1f:.1f} MB/s eff)")

    # Parallel streams: do k concurrent device_puts of distinct frames scale?
    frames = [np.random.randint(0, 255, (1080, 1920), dtype=np.uint8)
              for _ in range(8)]
    for k in (1, 2, 4, 8):
        with cf.ThreadPoolExecutor(k) as ex:
            def put(f):
                return jax.device_put(f, dev).block_until_ready()
            list(ex.map(put, frames[:k]))  # warm
            t0 = time.time()
            list(ex.map(put, frames[:k]))
            dt = time.time() - t0
        print(f"parallel up k={k}: {dt*1e3:7.1f} ms total, "
              f"{dt/k*1e3:6.1f} ms/frame, "
              f"{k*frames[0].nbytes/2**20/dt:6.1f} MB/s agg")

    # Batched upload: one device_put of a stacked (B,H,W) array
    for B in (2, 4, 8):
        stack = np.stack(frames[:B])
        dt = t(lambda: jax.device_put(stack, dev).block_until_ready(), 3)
        print(f"stacked up B={B}: {dt*1e3:7.1f} ms total, "
              f"{dt/B*1e3:6.1f} ms/frame, "
              f"{stack.nbytes/2**20/dt:6.1f} MB/s")

    # Parallel downloads of ~1MB results
    d_results = [jax.device_put(
        np.random.randint(0, 2**31, (256 * 1024,), dtype=np.int32), dev)
        for _ in range(8)]
    for k in (1, 2, 4):
        with cf.ThreadPoolExecutor(k) as ex:
            list(ex.map(np.asarray, d_results[:k]))
            t0 = time.time()
            list(ex.map(np.asarray, d_results[:k]))
            dt = time.time() - t0
        print(f"parallel down k={k} (1MB each): {dt*1e3:7.1f} ms total, "
              f"{dt/k*1e3:6.1f} ms/xfer, "
              f"{k*1.0/dt:6.1f} MB/s agg")


if __name__ == "__main__":
    main()
