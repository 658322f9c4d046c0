"""Device time of the 4-image batch program vs 4 single dispatches."""

import sys
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
    single = ex._get_fused_packed(key)
    batch = ex._get_fused_packed_batch(key)

    def slope(fn, k1=2, k2=6):
        def run(k):
            outs = [fn() for _ in range(k)]
            jax.block_until_ready(outs[-1]["flat"])
        run(1)
        ts = {}
        for k in (k1, k2):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                run(k)
                best = min(best, time.time() - t0)
            ts[k] = best
        return (ts[k2] - ts[k1]) / (k2 - k1) * 1e3

    t0 = time.time()
    np.asarray(batch(*images)["flat"])
    print(f"batch compile+run {time.time() - t0:.1f}s", flush=True)

    s = slope(lambda: single(images[0]))
    print(f"single: {s:.1f} ms/dispatch = {s:.1f} ms/image", flush=True)
    b = slope(lambda: batch(*images))
    print(f"batch4: {b:.1f} ms/dispatch = {b / 4:.1f} ms/image", flush=True)


if __name__ == "__main__":
    main()
