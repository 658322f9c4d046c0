"""SfM front-end bench on the real chip: batched extraction + chained
brute-force matching via the multi-chip code path on a 1x1 mesh
(BASELINE.md config 5 scaled to one chip; the same program shards over
'data'/'model' on a real slice).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.parallel.batch import (make_mesh, pad_batch,  # noqa: E402
                                        sfm_frontend_step)


def make_scene(seed: int, h: int = 640, w: int = 800) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for cell, amp in ((64, 1.0), (32, 0.5), (16, 0.25), (8, 0.12)):
        base = rng.random((h // cell + 2, w // cell + 2)).astype(np.float32)
        up = np.kron(base, np.ones((cell, cell), np.float32))[:h, :w]
        img += amp * up
    img = (img - img.min()) / (img.max() - img.min())
    return img


def main() -> None:
    h, w = 640, 800
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    step, plan = sfm_frontend_step(Config(), w, h, mesh, desc_cap=4096)

    scenes = np.stack([make_scene(s, h, w) for s in range(batch)])
    padded, valid = pad_batch(scenes, mesh)

    t0 = time.time()
    out = step(jnp.asarray(padded), jnp.asarray(valid))
    jax.block_until_ready(out)
    print(f"compile+first {time.time() - t0:.1f}s "
          f"match_counts={np.asarray(out['match_counts']).tolist()}")

    reps = 3
    t0 = time.time()
    for r in range(reps):
        out = step(jnp.asarray(np.stack(
            [make_scene(100 + r * batch + i, h, w)
             for i in range(batch)])), jnp.ones((batch,), bool))
        jax.block_until_ready(out)
    dt = (time.time() - t0) / (reps * batch)
    print(f"sfm frontend: {dt * 1e3:.1f} ms/image "
          f"({1 / dt:.2f} images/s incl. matching) at {w}x{h}")


if __name__ == "__main__":
    main()
