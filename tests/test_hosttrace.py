"""Host-trace regression tests (round-3 postmortem).

Round 3's benchmark died with rc=1 because a string-valued kwarg recorded
by the fused-compile instrumentation (staged.py `_timed_first`) crashed
``host_trace_summary`` inside ``PopSift.uninit`` — the exact
configuration bench.py runs (POPSIFT_TPU_HOSTTRACE=1, reference NVTX
analog popsift.h:26-31).  These tests pin both layers of the fix:

* the summary never raises, whatever got recorded,
* the bench's exact configuration (HOSTTRACE on, enqueue -> get ->
  uninit, with at least one fused-program compile) runs to completion
  in a fresh interpreter.
"""

import os
import subprocess
import sys

import numpy as np

from popsift_tpu import tracing


def test_summary_survives_string_kwargs(monkeypatch, capsys):
    """A non-numeric kwarg value must be counted, not float-cast."""
    monkeypatch.setattr(tracing, "HOSTTRACE", True)
    tracing._trace_events.clear()
    tracing.host_trace("upload.start", 1)
    tracing.host_trace("upload.end", 1)
    tracing.host_trace("compile_program", "lbl", label="fusedB[True]((1,2))")
    tracing.host_trace("fetch_bytes", 0, n=1234.0)
    tracing.host_trace_summary()  # must not raise
    assert not tracing._trace_events
    err = capsys.readouterr().err
    assert "# host trace:" in err
    assert "#compile_program" in err
    assert "#fetch_bytes" in err


def test_snapshot_counts_and_sums(monkeypatch):
    monkeypatch.setattr(tracing, "HOSTTRACE", True)
    tracing._trace_events.clear()
    tracing.host_trace("fetch_bytes", 0, n=100.0)
    tracing.host_trace("fetch_bytes", 1, n=50.0)
    tracing.host_trace("compile_program", "a", n=1)
    snap = tracing.host_trace_snapshot()
    assert snap["#fetch_bytes"] == (2, 150.0)
    assert snap["#compile_program"] == (1, 1.0)
    # non-destructive by default; destructive with clear=True
    assert tracing.host_trace_snapshot(clear=True) == snap
    assert tracing.host_trace_snapshot() == {}
    tracing._trace_events.clear()


_BENCH_CONFIG_SCRIPT = r"""
import sys
import numpy as np
from popsift_tpu.config import Config
from popsift_tpu.pipeline import PopSift

rng = np.random.default_rng(0)
img = np.kron(rng.random((12, 16)).astype(np.float32),
              np.ones((8, 8), np.float32))
img = (img * 255).astype(np.uint8)
h, w = img.shape

cfg = Config()
cfg.set_desc_transfer("u8p")
# small program: 2 octaves, no upscale (fewer levels would shrink it
# further but levels < 3 pushes the descriptor window past the rolled-
# window kernels' 120-px limit) — the fused batch program this compiles
# is far below the old full-config compile that outran the 600 s
# timeout on a cold 1-core host (round-4 postmortem)
cfg.octaves = 2
cfg.set_downsampling(0.0)
with PopSift(cfg, workers=2) as ps:
    # first job bootstraps the bucket key synchronously; the second
    # round rides the fused batch program => a compile_program event
    # exists when uninit runs the summary (the round-3 crash path)
    for _ in range(2):
        jobs = [ps.enqueue(w, h, img) for _ in range(3)]
        for j in jobs:
            assert j.get() is not None
print("OK")
"""


def test_pipeline_uninit_with_hosttrace_enabled(tmp_path):
    """Run the bench's exact configuration in a fresh interpreter:
    POPSIFT_TPU_HOSTTRACE=1 through fused compiles + uninit."""
    env = dict(os.environ)
    env["POPSIFT_TPU_HOSTTRACE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("POPSIFT_TPU_CACHE", None)
    # share this test session's (host-scoped) persistent cache so a
    # re-run is a deserialisation; the first-ever run on a host still
    # compiles, which the small config + timeout absorb
    import jax
    cache = jax.config.jax_compilation_cache_dir
    if cache:
        env["JAX_COMPILATION_CACHE_DIR"] = cache
    r = subprocess.run(
        [sys.executable, "-c", _BENCH_CONFIG_SCRIPT],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "OK" in r.stdout
    assert "# host trace:" in r.stderr
    assert "#compile_program" in r.stderr
