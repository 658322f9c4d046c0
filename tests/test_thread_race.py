"""Thread-race stress for the 9-thread host pipeline (closes SURVEY §5.2:
the reference's race-condition history — CHANGES.md PR 82 — and its
sync+check discipline, debug_macros.h:26-32, have no TSan analog here, so
this module hammers the shared structures directly).

Shared state under test: the upload LRU dict + lock (pipeline.py
_upload_images), the staging-pool semaphore, the three queues, and the
staged extractor's cross-thread fields (_recent_ori_max, bucket keys).

Run by the dedicated `thread-race` CI job with faulthandler enabled; a
deadlock dumps all stacks instead of hanging the job.
"""

import faulthandler
import threading

import numpy as np
import pytest

import popsift_tpu as ps
from popsift_tpu.config import Config

# hang diagnosis: dump all thread stacks if the module takes absurdly
# long (exit=False — this timer spans the whole pytest process, and a
# hard exit would kill an unrelated slow suite run that merely imported
# this module; the CI job's own timeout handles termination)
faulthandler.dump_traceback_later(2400, exit=False)


def _img(seed, h, w):
    rng = np.random.default_rng(seed)
    img = rng.random((h // 8 + 1, w // 8 + 1)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))[:h, :w]
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
    return (img * 255).astype(np.uint8)


def test_wire_prefix_no_deque_race():
    """wire_prefix_words reads recent totals on the dispatch thread while
    the collect thread appends: with the _recent_ori_max snapshot this
    can never raise 'deque mutated during iteration'."""
    from popsift_tpu.staged import StagedExtractor

    ex = StagedExtractor(Config(), 128, 96)
    O = ex.plan.octaves
    key = ((128,) * O, (128,) * O, (128,) * O, 256, 2560)
    stop = threading.Event()
    errs = []

    def writer():
        i = 0
        while not stop.is_set():
            ex._note_ori_total(50 + (i % 100))
            i += 1

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    try:
        for _ in range(20000):
            try:
                ex.wire_prefix_words(key)
            except RuntimeError as e:  # pragma: no cover - the bug
                errs.append(e)
                break
    finally:
        stop.set()
        t.join()
    assert not errs


@pytest.mark.slow
def test_stress_mixed_sizes_failures_and_config_swaps():
    """Hundreds of mixed-size enqueues with injected upload failures and
    a mid-stream configure() swap; asserts per-job integrity (every job
    completes exactly once, failures isolated) and the pool/LRU
    invariants after drain."""
    import popsift_tpu.wirecodec as wc

    orig_encode = wc.encode_u8_digest
    fail_mark = {"n": 0}

    def flaky_encode(data):
        # deterministic failure injection: every 13th encode raises
        fail_mark["n"] += 1
        if fail_mark["n"] % 13 == 0:
            raise RuntimeError("injected upload failure")
        return orig_encode(data)

    wc.encode_u8_digest = flaky_encode
    try:
        shapes = [(64, 80), (72, 96)]
        imgs = {s: [_img(7 * i + s[0], s[0], s[1]) for i in range(4)]
                for s in shapes}
        cfg2 = Config()
        cfg2.set_filter_max_extrema(500)
        with ps.PopSift(Config(), workers=3) as p:
            pool_cap = p._pool._value  # initial semaphore value
            jobs = []
            for rep in range(40):
                h, w = shapes[rep % 2]
                job = p.enqueue(w, h, imgs[(h, w)][rep % 4])
                assert job is not None
                jobs.append(job)
                if rep == 20:
                    p.configure(cfg2)  # in-flight jobs keep their config
            done = 0
            failed = 0
            for j in jobs:
                try:
                    f = j.get()
                    if f is None:
                        failed += 1
                    else:
                        assert f.get_feature_count() >= 0
                    done += 1
                except RuntimeError:
                    failed += 1
                    done += 1
            assert done == len(jobs)
            # small images skip the wire codec (64 KiB threshold), so
            # injected failures only fire when the codec ran; integrity
            # is per-job isolation, not a failure quota
            assert failed < len(jobs)
            # LRU bound holds under concurrency
            assert len(p._upload_cache) <= p._UPLOAD_CACHE_SLOTS
            # every staged slot was released back to the pool
            for _ in range(pool_cap):
                assert p._pool.acquire(timeout=30)
            for _ in range(pool_cap):
                p._pool.release()
    finally:
        wc.encode_u8_digest = orig_encode


@pytest.mark.slow
def test_concurrent_first_frames_single_key():
    """N workers racing on the very first frames must agree on ONE bucket
    key (the _init_lock serialises establishment) instead of compiling N
    divergent fused programs."""
    from popsift_tpu.staged import get_staged_extractor

    img = _img(3, 64, 80)
    # distinct config so the lru-cached extractor is fresh for this test
    # (Config dataclasses hash by value; a plain Config() would reuse an
    # extractor already populated by other tests in the same process)
    cfg = Config()
    cfg.set_filter_max_extrema(77777)
    with ps.PopSift(cfg, workers=4) as p:
        jobs = [p.enqueue(80, 64, img) for _ in range(8)]
        for j in jobs:
            assert j.get() is not None
    ex = get_staged_extractor(jobs[0]._config, 80, 64)
    assert ex._last_key5 is not None
    # one establishment: at most the seed program + the steady-state
    # batch program (+1 slack for a saved-key adoption that regrew)
    assert len(ex._fused_packed_batch) <= 3
