"""Performance-proxy ratchets (round-3 verdict task 10).

Two cheap structural quantities have silently drifted across rounds and
directly bound steady-state throughput on a remotely-attached TPU:

* the per-image flat transfer buffer size (every word is wire bytes),
* the number of device dispatches per steady-state batch (every
  dispatch is a network round trip).

These tests pin both.  If a change legitimately grows one (a new wire
section, an extra program), update the pinned number IN THE SAME COMMIT
and account for the cost in docs/DESIGN.md — the point is that growth
is a deliberate decision, not drift.  Platform note: the quantities are
structural (layout arithmetic + host-side call counts), identical on
CPU and TPU, so the ratchet is meaningful in the CPU suite.
"""

import numpy as np
import pytest

from popsift_tpu.config import Config
from popsift_tpu.staged import get_staged_extractor


def _mk_image(h, w, seed=3):
    rng = np.random.default_rng(seed)
    img = np.kron(rng.random((h // 8, w // 8)).astype(np.float32),
                  np.ones((8, 8), np.float32))
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def test_flat_buffer_words_ratchet():
    """Pinned per-image wire words for a canonical bucket key.

    Canonical: default Config + u8p transfer, 160x120 input (5 octaves),
    all count buckets at 128.  Layout arithmetic (round-5 wire-lean
    format): 4 count vectors of O=5 + 3 totals + 128 packed u16 x|y
    words + 64 u16-pair sigma words + 64 u16-pair angle words +
    ceil(128/4) packed num_ori/octave bytes + 128x4 zero-bitmap words +
    128x32 packed u8 descriptor words = 4919 u32 words (19.7 KB/image;
    was 5175 with the f32 keypoint sections)."""
    cfg = Config()
    cfg.set_desc_transfer("u8p")
    ex = get_staged_extractor(cfg, 160, 120)
    assert ex.plan.octaves == 5
    key = ((128,) * 5, (128,) * 5, (128,) * 5, 128, 128)
    lay = ex._flat_layout(key)
    assert lay["_total"] == 4919, (
        "flat transfer buffer grew: was 4919 u32 words/image for the "
        f"canonical key, now {lay['_total']} — if deliberate, update "
        "this pin and record the wire cost in docs/DESIGN.md")
    # u8 variant (round-2 wire format): no bitmap section
    cfg2 = Config()
    cfg2.set_desc_transfer("u8")
    ex2 = get_staged_extractor(cfg2, 160, 120)
    assert ex2._flat_layout(key)["_total"] == 4919 - 128 * 4
    # the default (u16 descriptor) transfer keeps exact f32 keypoint
    # sections: x/y/sigma/ori_d cost 4*128 words instead of 256
    cfg3 = Config()
    ex3 = get_staged_extractor(cfg3, 160, 120)
    assert ex3._flat_layout(key)["_total"] == 23 + 512 + 32 + 128 * 64


def test_steady_state_dispatch_count_ratchet():
    """One fused-program dispatch per steady-state batch, no recompiles.

    Drives the staged extractor exactly as pipeline._extract_dispatch_loop
    does, settles the bucket key, then counts (a) underlying jit-callable
    invocations and (b) new program-cache entries over 3 further batches:
    must be 3 dispatches (1/batch) and 0 new compiles."""
    import jax

    cfg = Config()
    cfg.set_desc_transfer("u8p")
    w, h = 160, 120
    img = jax.device_put(_mk_image(h, w))
    ex = get_staged_extractor(cfg, w, h)

    # settle: bootstrap + enough batches for counts to stabilise
    feats = ex.extract_features(img)
    assert feats is not None
    for _ in range(2):
        pending = ex.extract_dispatch_batch([img] * ex.BATCH)
        if pending is None:
            continue
        flat = jax.device_get(pending[1]["flat"])
        ex.extract_collect_batch([img] * ex.BATCH, pending, flat)
    assert ex.has_key()

    # instrument: wrap every cached fused-batch callable with a counter
    calls = {"n": 0}

    def wrap(fn):
        def counted(*a, **k):
            calls["n"] += 1
            return fn(*a, **k)
        return counted

    for k in list(ex._fused_packed_batch):
        ex._fused_packed_batch[k] = wrap(ex._fused_packed_batch[k])
    n_programs = (len(ex._fused_packed_batch), len(ex._fused_packed),
                  len(ex._stage3))

    for _ in range(3):
        pending = ex.extract_dispatch_batch([img] * ex.BATCH)
        assert pending is not None, "steady state lost its bucket key"
        flat = jax.device_get(pending[1]["flat"])
        out = ex.extract_collect_batch([img] * ex.BATCH, pending, flat)
        assert len(out) == ex.BATCH

    assert calls["n"] == 3, (
        f"steady-state dispatch count grew: {calls['n']} fused-batch "
        "dispatches over 3 batches (pinned: 1/batch)")
    assert (len(ex._fused_packed_batch), len(ex._fused_packed),
            len(ex._stage3)) == n_programs, (
        "steady-state batches compiled new programs — recompile drift")
