"""Device-time of the packed fused program via dispatch-count slope.

Enqueues K back-to-back dispatches and syncs once; the slope over K is the
pure device execution time per image, independent of the tunnel's
(highly variable) sync latency and download bandwidth.
"""

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
    fn = ex._get_fused_packed(key)

    def run(k):
        outs = [fn(images[i % 4]) for i in range(k)]
        jax.block_until_ready(outs[-1]["flat"])

    run(2)
    ts = {}
    for k in (2, 12):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run(k)
            best = min(best, time.time() - t0)
        ts[k] = best
    dev_ms = (ts[12] - ts[2]) / 10 * 1e3
    print(f"t2={ts[2] * 1e3:.1f} ms  t12={ts[12] * 1e3:.1f} ms  "
          f"-> device {dev_ms:.1f} ms/image", flush=True)


if __name__ == "__main__":
    main()
