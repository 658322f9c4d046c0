"""Microbenchmark: descriptor binning formulations on TPU.

The loop-mode hot math per slot is: window (win_y, 128) -> weights ->
4x4x8 trilinear binning.  Compare XLA formulations at realistic sizes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(label, fn, args, reps=6):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label:28s} {dt:8.2f} ms", flush=True)
    return r


def main():
    n = 1536          # slots (octave-2-sized bucket)
    win_y, win_x = 120, 128
    p = win_y * win_x
    rng = np.random.default_rng(0)

    # precomputed per-slot planes (stand-ins for the window math outputs)
    lo = jnp.asarray(rng.random((n, win_y, win_x), np.float32))
    hi = jnp.asarray(rng.random((n, win_y, win_x), np.float32))
    fo0 = jnp.asarray(rng.integers(0, 8, (n, win_y, win_x)).astype(np.int32))
    ux = jnp.asarray(rng.random((n, win_y, win_x), np.float32) * 5 - 2.5)
    uy = jnp.asarray(rng.random((n, win_y, win_x), np.float32) * 5 - 2.5)
    offs = jnp.arange(4, dtype=jnp.float32) - 1.5

    def one_einsum(lo, hi, fo0, ux, uy):
        fo1 = (fo0 + 1) % 8
        bins = jnp.arange(8, dtype=jnp.int32)
        A = ((fo0[..., None] == bins) * lo[..., None]
             + (fo1[..., None] == bins) * hi[..., None]).reshape(p, 8)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[..., None] - offs)) \
            .reshape(p, 4)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[..., None] - offs)) \
            .reshape(p, 4)
        E = (wx[:, :, None] * A[:, None, :]).reshape(p, 32)
        return jnp.einsum("pt,pq->tq", wy, E,
                          preferred_element_type=jnp.float32).reshape(128)

    def chunked(one, chunk=64):
        def run(lo, hi, fo0, ux, uy):
            args = tuple(a.reshape((n // chunk, chunk) + a.shape[1:])
                         for a in (lo, hi, fo0, ux, uy))
            return jax.lax.map(lambda c: jax.vmap(one)(*c), args)
        return jax.jit(run)

    def one_4mm(lo, hi, fo0, ux, uy):
        fo1 = (fo0 + 1) % 8
        bins = jnp.arange(8, dtype=jnp.int32)
        A = ((fo0[..., None] == bins) * lo[..., None]
             + (fo1[..., None] == bins) * hi[..., None]).reshape(p, 8)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[..., None] - offs)) \
            .reshape(p, 4)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[..., None] - offs)) \
            .reshape(p, 4)
        rows = []
        for ty in range(4):
            W = wy[:, ty:ty + 1] * wx            # (p, 4)
            rows.append(jnp.einsum("pt,pq->tq", W, A,
                                   preferred_element_type=jnp.float32))
        return jnp.stack(rows).reshape(128)

    def one_w16(lo, hi, fo0, ux, uy):
        fo1 = (fo0 + 1) % 8
        bins = jnp.arange(8, dtype=jnp.int32)
        A = ((fo0[..., None] == bins) * lo[..., None]
             + (fo1[..., None] == bins) * hi[..., None]).reshape(p, 8)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[..., None] - offs))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[..., None] - offs))
        W = (wy[..., :, None] * wx[..., None, :]).reshape(p, 16)
        return jnp.einsum("pt,pq->tq", W, A,
                          preferred_element_type=jnp.float32).reshape(128)

    def one_reduce(lo, hi, fo0, ux, uy):
        fo1 = (fo0 + 1) % 8
        P = [jnp.where(fo0 == b, lo, 0.0) + jnp.where(fo1 == b, hi, 0.0)
             for b in range(8)]
        out = []
        for ty in range(4):
            wyt = jnp.maximum(0.0, 1.0 - jnp.abs(uy - (ty - 1.5)))
            for tx in range(4):
                wxt = jnp.maximum(0.0, 1.0 - jnp.abs(ux - (tx - 1.5)))
                wt = wyt * wxt
                for b in range(8):
                    out.append(jnp.sum(wt * P[b]))
        return jnp.stack(out)

    args = (lo, hi, fo0, ux, uy)
    timed("einsum-E (current)", chunked(one_einsum), args)
    timed("4-matmul", chunked(one_4mm), args)
    timed("w16-matmul", chunked(one_w16), args)
    timed("reduce-256", chunked(one_reduce, chunk=16), args)
    timed("w16-matmul c128", chunked(one_w16, chunk=128), args)
    timed("w16-matmul c32", chunked(one_w16, chunk=32), args)


if __name__ == "__main__":
    main()
