"""Does a device_get overlap with compute on the axon tunnel?

A: N dispatches, one final sync                -> pure compute rate.
B: N dispatches, fetch each result serially    -> +fetch per image, no overlap.
C: N dispatches from thread 1, fetches from thread 2 -> overlap test.
D: like C but fetches batched 4 at a time.
"""

import sys
import threading
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    images = [jax.device_put(np.asarray(make_1080p_image(s)))
              for s in range(4)]
    for img in images:
        ex.extract_features(img)
    key = ex._last_key5
    fn = ex._get_fused_packed(key)
    N = 12

    def timed(label, f):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            f()
            best = min(best, time.time() - t0)
        print(f"{label:34s} {best / N * 1e3:7.1f} ms/image", flush=True)

    def a():
        outs = [fn(images[i % 4]) for i in range(N)]
        jax.block_until_ready(outs[-1]["flat"])

    def b():
        for i in range(N):
            np.asarray(fn(images[i % 4])["flat"])

    def c():
        outs = [fn(images[i % 4]) for i in range(N)]

        def fetch():
            for o in outs:
                np.asarray(o["flat"])
        t = threading.Thread(target=fetch)
        t.start()
        t.join()

    def c2():
        # dispatch and fetch interleaved from two threads
        q = []
        done = threading.Event()

        def fetch():
            i = 0
            while i < N:
                if i < len(q):
                    np.asarray(q[i]["flat"])
                    i += 1
                else:
                    time.sleep(0.001)
        t = threading.Thread(target=fetch)
        t.start()
        for i in range(N):
            q.append(fn(images[i % 4]))
        t.join()

    def d():
        q = []

        def fetch():
            i = 0
            while i < N:
                j = min(len(q), i + 4)
                if j > i:
                    jax.device_get([o["flat"] for o in q[i:j]])
                    i = j
                else:
                    time.sleep(0.001)
        t = threading.Thread(target=fetch)
        t.start()
        for i in range(N):
            q.append(fn(images[i % 4]))
        t.join()

    timed("A dispatch-only", a)
    timed("B serial fetch", b)
    timed("C fetch-after-all-dispatched", c)
    timed("C2 concurrent dispatch+fetch", c2)
    timed("D concurrent, batched fetch", d)


if __name__ == "__main__":
    main()
