"""Host-side breakdown of one warm extract() call."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.features import assemble_features  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    raws = [make_1080p_image(s) for s in range(4)]
    devs = [jax.device_put(jnp.asarray(r)) for r in raws]

    for img in devs:
        ex.extract(img)
    key = ex._last_buckets
    fused = ex._get_fused(key)

    def timeit(label, fn, args_list, reps=4):
        fn(args_list[0])
        t0 = time.time()
        for a in args_list[:reps]:
            r = fn(a)
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:22s} {dt:8.1f} ms", flush=True)
        return r

    timeit("upload u8", lambda r: jax.device_put(jnp.asarray(r)), raws)
    timeit("dispatch only", lambda d: fused(d), devs)

    def disp_get(d):
        return jax.device_get(fused(d))

    host = timeit("dispatch+device_get", disp_get, devs)

    tree = jax.device_get(fused(devs[0]))
    size = sum(a.nbytes for a in jax.tree_util.tree_leaves(tree)
               if hasattr(a, "nbytes"))
    print(f"# device_get payload {size / 1e6:.2f} MB", flush=True)

    def full(d):
        return assemble_features(ex.extract(d), 1.0)

    timeit("extract+assemble", full, devs)


if __name__ == "__main__":
    main()
