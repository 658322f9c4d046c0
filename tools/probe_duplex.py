"""Is the axon tunnel full-duplex?

Times (a) pure uploads, (b) pure downloads, (c) both concurrently from
two threads.  If c ~= max(a, b) the tunnel is full-duplex and upload
bytes hide under download bytes; if c ~= a + b the directions share one
pipe and the wire budget is the SUM of both directions.
"""

import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    mb = 4
    n = 6
    up_bufs = [np.random.default_rng(i).integers(
        0, 255, mb * 1024 * 1024, dtype=np.uint8) for i in range(n)]
    # device-resident buffers to fetch
    down_dev = [jax.device_put(b) for b in up_bufs]
    jax.block_until_ready(down_dev)

    def up():
        out = [jax.device_put(b) for b in up_bufs]
        jax.block_until_ready(out)

    def down():
        for d in down_dev:
            np.asarray(d)

    def timed(label, f):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            f()
            best = min(best, time.time() - t0)
        rate = mb * n / best
        print(f"{label:28s} {best * 1e3:7.1f} ms  ({rate:.1f} MB/s)",
              flush=True)
        return best

    ta = timed("A upload only", up)
    tb = timed("B download only", down)

    def both():
        t = threading.Thread(target=up)
        t.start()
        down()
        t.join()

    tc = timed("C concurrent up+down", both)
    print(f"max(A,B)={max(ta, tb) * 1e3:.1f} ms  A+B={(ta + tb) * 1e3:.1f} ms"
          f"  -> {'FULL-duplex' if tc < 0.75 * (ta + tb) else 'shared pipe'}")


if __name__ == "__main__":
    main()
