"""Capture an XLA device trace of the packed fused program and print the
per-op time breakdown (op_profile via tensorboard_plugin_profile)."""

import glob
import json
import sys

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
    np.asarray(fn(images[0])["flat"])

    logdir = "/tmp/jaxtrace"
    with jax.profiler.trace(logdir):
        outs = [fn(images[i % 4]) for i in range(4)]
        jax.block_until_ready(outs[-1]["flat"])

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    data = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    out = data[0] if isinstance(data, tuple) else data
    with open("/tmp/op_stats.json", "w") as f:
        f.write(out if isinstance(out, str) else str(out))
    print("wrote /tmp/op_stats.json", len(out))


if __name__ == "__main__":
    main()
