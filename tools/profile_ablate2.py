"""Ablation profile, part 2: attribute the non-stage remainder of the
fused program (pyramid blur, DoG, candidate compaction, finalize/pack).
Same method as profile_ablate.py: full - ablated = marginal cost."""

import sys
import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_1080p_image  # noqa: E402
from popsift_tpu.config import Config  # noqa: E402
from popsift_tpu.staged import StagedExtractor  # noqa: E402
from popsift_tpu.ops import extrema as ops_ext  # noqa: E402
from popsift_tpu.ops import pyramid as ops_pyr  # noqa: E402
from popsift_tpu.kernels import blur as kblur  # noqa: E402


@contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main():
    h, w = 1080, 1920
    ex = StagedExtractor(Config(), w, h)
    images = [jax.device_put(np.asarray(make_1080p_image(s)))
              for s in range(4)]
    for img in images:
        ex.extract_features(img)
    key = ex._last_key5

    def build(label, ctxs):
        from contextlib import ExitStack
        with ExitStack() as st:
            for c in ctxs:
                st.enter_context(c)
            fn = jax.jit(lambda im: ex._fused_packed_image(im, key)[0])
            t0 = time.time()
            jax.block_until_ready(fn(images[0]))
            compile_s = time.time() - t0
        return label, fn, compile_s

    # --- ablations -------------------------------------------------
    def no_blur_fused(img, taps_h, span_h, taps_v=None, span_v=None,
                      hscale=1.0):
        return img * float(hscale) * float(np.sum(taps_h[:span_h]))

    def no_blur_1d(img, half_taps, span, axis):
        return img * float(np.asarray(half_taps)[0])

    def no_dog(stack):
        return stack[1:] * 1.0001 - 1e-5

    def _dummy_cands(n_src, levels, cap):
        n = jnp.minimum(n_src, cap).astype(jnp.int32)
        idx = jnp.arange(cap, dtype=jnp.int32)
        valid = idx < n
        z = jnp.where(valid, 1, 0)
        return z, z, z % jnp.int32(levels), valid, n, jnp.int32(0)

    def no_detcomp(dog, mode, thr, cap):
        # skip detection AND compaction: count from one cheap strided sum
        n = jnp.sum((jnp.abs(dog[..., ::64]) > thr).astype(jnp.int32))
        return _dummy_cands(n, dog.shape[0], cap)

    def no_wordextract(dog, mode, thr, cap):
        # keep the fused detect+bitpack kernel, skip the word-extraction
        # passes of compact_words (its popcount total sizes the count)
        from popsift_tpu.kernels.detect import detect_packed_pallas
        words = detect_packed_pallas(dog, mode, thr)
        n = jnp.sum(jax.lax.population_count(
            words.reshape(-1)).astype(jnp.int32))
        return _dummy_cands(n, dog.shape[0], cap)

    def no_resample(image, dst_h, dst_w, shift):
        y = jnp.linspace(0.0, 1.0, dst_h)[:, None]
        x = jnp.linspace(0.0, 1.0, dst_w)[None, :]
        return image[:1, :1] + y + x

    orig_fin = StagedExtractor._finalize_body

    def no_finalize(self, exts, oris, descs, angds, ks, bs, ft, bt):
        desc_dtype = {"u16": jnp.uint16, "u8": jnp.uint8}.get(
            self.config.desc_transfer, jnp.float32)
        FT, BT = max(ft, 1), max(bt, 1)
        s = exts[0].xpos[0]
        z = jnp.zeros((FT,), jnp.float32) + s
        zi = jnp.zeros((FT,), jnp.int32)
        return dict(
            x=z, y=z, sigma=z, num_ori=zi, idx_ori=zi, octave=zi,
            ori_d=jnp.zeros((BT,), jnp.float32),
            desc=jnp.zeros((BT, 128), desc_dtype),
            rev=jnp.zeros((BT,), jnp.int32),
            ext_total=jnp.int32(0), ori_total=jnp.int32(0))

    variants = [
        ("full", []),
        ("no-blur", [patched(ops_pyr, "_fused", no_blur_fused),
                     patched(ops_pyr, "blur_1d", no_blur_1d)]),
        ("no-dog", [patched(ops_pyr, "make_dog", no_dog)]),
        ("no-detcomp", [patched(ops_ext, "detect_and_compact",
                                no_detcomp)]),
        ("no-wordextract", [patched(ops_ext, "detect_and_compact",
                                    no_wordextract)]),
        ("no-resample", [patched(ops_pyr, "resample_input", no_resample)]),
        ("no-finalize", [patched(StagedExtractor, "_finalize_body",
                                 no_finalize)]),
    ]

    def slope(fn):
        def run(k):
            outs = [fn(images[i % 4]) for i in range(k)]
            jax.block_until_ready(outs[-1])
        run(2)
        ts = {}
        for k in (2, 10):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                run(k)
                best = min(best, time.time() - t0)
            ts[k] = best
        return (ts[10] - ts[2]) / 8 * 1e3

    base = None
    for label, ctxs in variants:
        label, fn, cs = build(label, ctxs)
        dt = slope(fn)
        if base is None:
            base = dt
            print(f"{label:12s} compile {cs:5.1f}s  {dt:7.1f} ms",
                  flush=True)
        else:
            print(f"{label:12s} compile {cs:5.1f}s  {dt:7.1f} ms  "
                  f"stage cost {base - dt:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
