"""Wire probe, round 2: fresh-array downloads, compressible-data uploads,
upload/compute overlap.

Round-1 findings said ~37 MB/s down, ~25 ms RTT; probe_wire.py measured
~30 MB/s up with *random* (incompressible) payloads and its down numbers
were invalid (jax.Array caches its host copy).  If the tunnel compresses,
natural images upload much faster than noise.
"""
from __future__ import annotations

import sys
import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np


def bench_like_frame(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 1080, 1920
    img = np.zeros((h, w), np.float32)
    for cell, amp in ((128, 1.0), (64, 0.6), (32, 0.35), (16, 0.2),
                      (8, 0.1)):
        base = rng.random((h // cell + 2, w // cell + 2)).astype(np.float32)
        up = np.kron(base, np.ones((cell, cell), np.float32))[:h, :w]
        img += amp * up
    for _ in range(3):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def t(fn, n=4):
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    dev = jax.devices()[0]
    mb = 1080 * 1920 / 2**20

    rnd = np.random.randint(0, 255, (1080, 1920), dtype=np.uint8)
    nat = bench_like_frame()
    print(f"zlib-1 ratio: random {len(zlib.compress(rnd.tobytes(),1))/rnd.nbytes:.2f} "
          f"natural {len(zlib.compress(nat.tobytes(),1))/nat.nbytes:.2f}",
          flush=True)

    for name, arr in (("random ", rnd), ("natural", nat),
                      ("zeros  ", np.zeros_like(rnd))):
        dt = t(lambda a=arr: jax.device_put(a, dev).block_until_ready())
        print(f"up {name}: {dt*1e3:7.1f} ms  ({mb/dt:6.1f} MB/s eff)",
              flush=True)

    # fresh-array download: jit computes a new array each call, fetch it
    base = jax.device_put(rnd.astype(np.float32), dev)
    f = jax.jit(lambda x, s: x + s)
    f(base, 1.0).block_until_ready()

    def fetch(s):
        return np.asarray(f(base, float(s)))
    s = [0]
    def dl():
        s[0] += 1
        fetch(s[0])
    dt = t(dl)
    print(f"down fresh f32 8MB: {dt*1e3:7.1f} ms ({4*mb/dt:6.1f} MB/s)",
          flush=True)

    # down of quantized (u8, fairly incompressible) vs f32 (compressible?)
    g = jax.jit(lambda x, s: ((x + s) % 256).astype(jnp.uint8))
    g(base, 1.0).block_until_ready()
    def dl8():
        s[0] += 1
        np.asarray(g(base, float(s[0])))
    dt = t(dl8)
    print(f"down fresh u8  2MB: {dt*1e3:7.1f} ms ({mb/dt:6.1f} MB/s)",
          flush=True)

    # overlap: long device compute while uploading
    big = jax.device_put(np.random.rand(4096, 4096).astype(np.float32), dev)
    mm = jax.jit(lambda x: ((x @ x) @ x) @ x)
    dt_mm = t(lambda: mm(big).block_until_ready(), 3)
    print(f"matmul chain alone: {dt_mm*1e3:7.1f} ms", flush=True)
    dt_up = t(lambda: jax.device_put(nat, dev).block_until_ready(), 3)

    def both():
        r = mm(big)  # async dispatch
        jax.device_put(nat, dev).block_until_ready()
        r.block_until_ready()
    dt_both = t(both, 3)
    print(f"upload alone {dt_up*1e3:.1f} ms; compute {dt_mm*1e3:.1f} ms; "
          f"overlapped both {dt_both*1e3:.1f} ms "
          f"(sum would be {(dt_up+dt_mm)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
