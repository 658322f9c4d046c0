"""Ablation profile of the packed fused program: device time with each
stage replaced by a shape-identical no-op.  full - ablated = that stage's
true marginal cost inside the fused program (prefix-cut profiling
mis-attributes costs because each cut compiles with different fusion)."""

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
from popsift_tpu.ops import descriptors as ops_desc  # noqa: E402
from popsift_tpu.ops import extrema as ops_ext  # noqa: E402
from popsift_tpu.ops import gradients as ops_grad  # noqa: E402
from popsift_tpu.ops import orientation as ops_ori  # noqa: E402
from popsift_tpu import extract as ext_mod  # noqa: E402


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

    orig_grad = ops_grad.padded_gradient_field
    orig_det = ops_ext.detect_candidates
    orig_ref = ops_ext.refine_extrema_multi
    orig_ori = ops_ori.assign_orientations
    orig_desc = ext_mod._dispatch_descriptors

    def no_grad(stack, pad_y, pad_x):
        L, hh, ww = stack.shape
        return jnp.zeros((2 * L, hh + 2 * pad_y, ww + 2 * pad_x),
                         jnp.float32)

    def no_det(dog, sift_mode, peak_threshold):
        levels = dog.shape[0] - 2
        return jnp.zeros((levels,) + dog.shape[1:], bool) | (dog[1:-1] > 1e30)

    def no_ref(dogs, cands, *a, **k):
        outs = []
        for dog, (cx, cy, cz, cv) in zip(dogs, cands):
            xf = cx.astype(jnp.float32)
            yf = cy.astype(jnp.float32)
            outs.append((xf, yf, cz.astype(jnp.int32),
                         1.6 * jnp.ones_like(xf),
                         jnp.zeros_like(cz, jnp.int32), cv))
        return outs

    def no_ori(bothp, pad_y, pad_x, xpos, ypos, lpos, sigma, valid,
               w_, h_, win=None, max_count=4, chunk=256, **k):
        cap = xpos.shape[0]
        return (valid.astype(jnp.int32),
                jnp.zeros((cap, max_count), jnp.float32)
                + bothp[0, 0, 0])

    def no_desc(plan, consts, stack, grads, pad_y, pad_x,
                ex_, ey, el, es, ang, ovalid, w_, h_, **k):
        return jnp.zeros((ex_.shape[0], 128), jnp.float32) + grads[0, 0, 0]

    # classed variants (the optimistic fused program calls these instead
    # of assign_orientations / _dispatch_descriptors)
    def no_ori_classed(bothp, pad_y, pad_x, xpos, ypos, lpos, sigma,
                       valid, w_, h_, classes=None, max_count=4, chunk=256,
                       **k):
        cap = xpos.shape[0]
        return (valid.astype(jnp.int32),
                jnp.zeros((cap, max_count), jnp.float32)
                + bothp[0, 0, 0], jnp.int32(0))

    def no_desc_classed(both, pad_y, pad_x, xpos, ypos, lpos, sigma,
                        ang, valid, w_, h_, classes=None, chunk=64, **k):
        return (jnp.zeros((xpos.shape[0], 128), jnp.float32)
                + both[0, 0, 0], jnp.int32(0))

    import popsift_tpu.ops.descriptors as ops_desc_mod
    import popsift_tpu.ops.pyramid as ops_pyr_mod

    orig_pyr = ops_pyr_mod.build_pyramid_and_dogs

    def no_pyr(image, gauss, dims, levels, gauss_mode, scaling_mode,
               sift_mode, upscale_factor):
        # shape-identical stacks/dogs carrying a data dependency on the
        # input but skipping all blur/resample work
        v = image[0, 0]
        stacks = [jnp.zeros((levels + 3, hh, ww), jnp.float32) + v
                  for (ww, hh) in dims]
        dogs = [s[1:] - s[:-1] for s in stacks]
        return stacks, dogs

    # chain-aware producer stub: the product path is now
    # build_pyramid_dogs_fields (fused octave chain on eligible octaves,
    # per-level + gradient_field elsewhere); eval_shape on the REAL
    # producer gives the exact output tree (incl. chain block-alignment
    # surplus dims and None stacks) without doing the work.
    orig_pdf = ops_pyr_mod.build_pyramid_dogs_fields
    _pdf_shapes = {}

    def no_pyrgrad(image, gauss, dims, levels, gauss_mode, scaling_mode,
                   sift_mode, upscale_factor, pads, full_stacks):
        kk = (image.shape, dims, levels, gauss_mode, scaling_mode,
              sift_mode, upscale_factor, pads, full_stacks)
        if kk not in _pdf_shapes:
            _pdf_shapes[kk] = jax.eval_shape(
                lambda im: orig_pdf(im, gauss, dims, levels, gauss_mode,
                                    scaling_mode, sift_mode,
                                    upscale_factor, pads, full_stacks),
                jax.ShapeDtypeStruct(image.shape, image.dtype))
        stacks_s, dogs_s, fields_s = _pdf_shapes[kk]
        v = image[0, 0].astype(jnp.float32)
        mk = lambda s: (None if s is None
                        else jnp.zeros(s.shape, s.dtype) + v)
        return ([mk(s) for s in stacks_s], [mk(s) for s in dogs_s],
                [mk(s) for s in fields_s])

    def no_finalize(exts, oris, descs, angds, ks, bs, ft, bt):
        # shape-identical output, no packing work; the dep sum keeps
        # every upstream stage (incl. descriptors) alive through DCE
        desc_dtype = {"u16": jnp.uint16, "u8": jnp.uint8,
                      "u8p": jnp.uint8}.get(ex.config.desc_transfer,
                                            jnp.float32)
        FT, BT = max(ft, 1), max(bt, 1)
        dep = exts[0][0][0]
        for d in descs:
            if d.size:
                dep = dep + d[0, 0].astype(jnp.float32)
        for a in angds:
            if a.size:
                dep = dep + a[0]
        z = jnp.zeros((FT,), jnp.float32) + dep
        zi = jnp.zeros((FT,), jnp.int32)
        return dict(
            x=z, y=z, sigma=z, num_ori=zi, idx_ori=zi, octave=zi,
            ori_d=jnp.zeros((BT,), jnp.float32) + dep,
            desc=jnp.zeros((BT, 128), desc_dtype),
            ext_total=jnp.int32(1), ori_total=jnp.int32(1))

    variants = [
        ("full", []),
        ("no-grad", [patched(ops_grad, "padded_gradient_field", no_grad),
                     patched(ops_grad, "gradient_field", no_grad)]),
        ("no-detect", [patched(ops_ext, "detect_candidates", no_det),
                       patched(ops_ext, "detect_and_compact",
                               lambda dog, m, t, cap, true_dims=None: (
                                   lambda n: (
                                       jnp.where(jnp.arange(cap) < n, 1, 1),
                                       jnp.where(jnp.arange(cap) < n, 1, 1),
                                       jnp.zeros((cap,), jnp.int32),
                                       jnp.arange(cap) < n,
                                       n, jnp.int32(0)))(
                                   jnp.minimum(jnp.sum(
                                       (jnp.abs(dog[..., ::64]) > t)
                                       .astype(jnp.int32)), cap)))]),
        ("no-refine", [patched(ops_ext, "refine_extrema_multi", no_ref)]),
        ("no-orient", [patched(ops_ori, "assign_orientations", no_ori),
                       patched(ops_ori, "assign_orientations_classed",
                               no_ori_classed)]),
        ("no-desc", [patched(ext_mod, "_dispatch_descriptors", no_desc),
                     patched(ops_desc_mod, "loop_descriptors_classed",
                             no_desc_classed)]),
        ("no-pyr", [patched(ops_pyr_mod, "build_pyramid_and_dogs",
                            no_pyr)]),
        ("no-pyrgrad", [patched(ops_pyr_mod, "build_pyramid_dogs_fields",
                                no_pyrgrad)]),
        ("no-finalize", [patched(ex, "_finalize_body", no_finalize)]),
    ]
    # chain-internal ablations: same kernel structure minus one piece of
    # in-VMEM math — the marginal cost of that math inside the chain
    import popsift_tpu.kernels.octave as k_oct
    orig_chain = k_oct.octave_chain_fused
    for abl in ("grad_math", "clamp"):
        def chain_abl(lvl0, filters, spans, emit_stack, emit_field,
                      stack_levels=(), interpret=None, _ablate=(),
                      _a=abl):
            return orig_chain(lvl0, filters, spans, emit_stack,
                              emit_field, stack_levels, interpret,
                              _ablate=(_a,))
        # pyramid.py imports the chain at call time, so patching the
        # kernels module is sufficient
        variants.append((f"chain-no-{abl}",
                         [patched(k_oct, "octave_chain_fused",
                                  chain_abl)]))

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
            print(f"{label:10s} compile {cs:5.1f}s  {dt:7.1f} ms", flush=True)
        else:
            print(f"{label:10s} compile {cs:5.1f}s  {dt:7.1f} ms  "
                  f"stage cost {base - dt:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
