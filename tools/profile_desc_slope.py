"""Per-slot cost of the real descriptor/orientation stages via slot-count
slope (subtracts the dispatch+sync floor)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.ops import descriptors as D  # noqa: E402
from popsift_tpu.ops import orientation as O  # noqa: E402


def timed(fn, args, reps=6):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps * 1e3


def main():
    cfg = Config()
    levels = cfg.levels
    sigma0 = cfg.sigma
    win = D.desc_window_size(sigma0, levels)
    owin = O.ori_window_size(sigma0, levels)
    print(f"desc win={win} ori win={owin}")

    from popsift_tpu.kernels.windows import aligned_window_dims
    pad_y, pad_x = aligned_window_dims(max(win, owin))

    L, h, w = 6, 1088, 1984   # octave-1 scale
    rng = np.random.default_rng(0)
    field = jnp.pad(
        jnp.asarray(rng.random((2 * L, h, w), np.float32)),
        ((0, 0), (pad_y, pad_y), (pad_x, pad_x)))

    def slots(n, seed=1):
        r = np.random.default_rng(seed)
        x = jnp.asarray(r.uniform(80, w - 80, n).astype(np.float32))
        y = jnp.asarray(r.uniform(80, h - 80, n).astype(np.float32))
        lp = jnp.asarray(r.integers(1, 4, n).astype(np.int32))
        sig = jnp.asarray((sigma0 * 2.0 **
                           (r.uniform(0.5, 3.5, n) / levels))
                          .astype(np.float32))
        ang = jnp.asarray(r.uniform(-3, 3, n).astype(np.float32))
        v = jnp.ones((n,), bool)
        return x, y, lp, sig, ang, v

    for label, make in [
        ("desc loop", lambda n: jax.jit(lambda *a: jnp.sum(
            D.loop_descriptors(field, pad_y, pad_x, *a, w, h, win)))),
        ("orientation", lambda n: jax.jit(lambda *a: jnp.sum(
            O.assign_orientations(field, pad_y, pad_x,
                                  *a[:4], a[5], w, h, owin)[1]))),
    ]:
        ts = {}
        for n in (512, 4096):
            fn = make(n)
            ts[n] = timed(fn, slots(n))
        per_slot = (ts[4096] - ts[512]) / (4096 - 512) * 1e3  # us
        print(f"{label:12s} t512={ts[512]:7.1f} ms  t4096={ts[4096]:7.1f} ms"
              f"  -> {per_slot:6.2f} us/slot "
              f"({per_slot * 4.0:5.1f} ms per 4k slots)", flush=True)


if __name__ == "__main__":
    main()
