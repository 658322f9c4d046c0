"""Throughput vs pipeline worker count (latency-hiding sweep)."""

import sys
import time

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.pipeline import PopSift  # noqa: E402


def run(workers: int, n_jobs: int = 24) -> float:
    h, w = 1080, 1920
    images = [make_1080p_image(seed) for seed in range(4)]
    with PopSift(Config(), workers=workers) as ps:
        for _ in range(2):
            jobs = [ps.enqueue(w, h, img) for img in images]
            for j in jobs:
                j.get()
        t0 = time.time()
        jobs = [ps.enqueue(w, h, images[i % 4]) for i in range(n_jobs)]
        for j in jobs:
            j.get()
        dt = (time.time() - t0) / n_jobs
    return dt


def main():
    for workers in ([int(a) for a in sys.argv[1:]] or [4, 8, 12, 16]):
        dt = run(workers)
        print(f"workers={workers:3d}  {dt * 1e3:7.1f} ms/image  "
              f"{1.0 / dt:6.2f} images/s", flush=True)


if __name__ == "__main__":
    main()
