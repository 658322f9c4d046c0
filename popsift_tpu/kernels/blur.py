"""Pallas TPU kernel: fused separable Gaussian blur (H + V in one pass).

The XLA shift-and-add formulation of :func:`popsift_tpu.ops.pyramid.blur_1d`
round-trips every level through HBM twice (horizontal pass, vertical pass).
This kernel processes row blocks: DMA a (BH + 2*halo, W) slab of the
edge-padded source into VMEM, apply the horizontal taps (optionally scaled,
for the x255 after the input-image pass, s_pyramid_build_ra.cu:54), then
the vertical taps, and write the (BH, W) result — one HBM read + one write
per level.  It is the TPU analog of the reference's fused octave kernels
(s_pyramid_fixed.cu:69-120) generalized to arbitrary spans.

Alignment: the row halo is the vertical span rounded up to 8 (sublane
tile) and block offsets step by BH (multiple of 8); the horizontal halo
lives inside the pre-padded, lane-aligned width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def _blur_kernel(taps_h, span_h, taps_v, span_v, hscale, emit_dog,
                 bh, w, pad_x, halo,
                 src_ref, *refs):
    """Grid: (ceil(H/bh),). src is (Hp, Wp) edge-padded; out is (H, W);
    with emit_dog a second (H, W) output gets out - source (the DoG layer
    between this level and its source, make_dog s_pyramid_build.cu:74-92,
    for free while both live in VMEM)."""
    if emit_dog:
        out_ref, dog_ref, slab, sems = refs
    else:
        out_ref, slab, sems = refs
    i = pl.program_id(0)

    rows = bh + 2 * halo
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(pl.multiple_of(i * bh, 8), rows), :],
        slab, sems)
    cp.start()
    cp.wait()

    # vertical taps first: shrinks the working set from (rows, Wp) to
    # (bh, Wp) before the horizontal pass (keeps unrolled-tap temporaries
    # inside the VMEM budget)
    acc = slab[halo:halo + bh, :] * taps_v[0]
    for off in range(1, span_v):
        acc = acc + (slab[halo - off:halo - off + bh, :]
                     + slab[halo + off:halo + off + bh, :]) * taps_v[off]

    # horizontal taps (lane shifts within the padded width)
    out = acc[:, pad_x:pad_x + w] * taps_h[0]
    for off in range(1, span_h):
        out = out + (acc[:, pad_x - off:pad_x - off + w]
                     + acc[:, pad_x + off:pad_x + off + w]) * taps_h[off]
    if hscale != 1.0:
        out = out * hscale

    out_ref[...] = out
    if emit_dog:
        dog_ref[...] = out - slab[halo:halo + bh, pad_x:pad_x + w]


@functools.partial(
    jax.jit,
    static_argnames=("taps_h", "span_h", "taps_v", "span_v", "hscale",
                     "h", "w", "emit_dog", "interpret"))
def _sep_blur_pallas(padded, taps_h, span_h, taps_v, span_v, hscale,
                     h: int, w: int, emit_dog: bool = False,
                     interpret: bool = False):
    halo = _round8(span_v - 1)
    pad_x = _round128(span_h - 1)
    bh = 32 if h >= 32 else _round8(max(h, 8))
    grid = (-(-h // bh),)
    h_pad = grid[0] * bh

    rows = bh + 2 * halo
    out_spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h_pad, w), jnp.float32)
    res = pl.pallas_call(
        functools.partial(_blur_kernel, taps_h, span_h, taps_v, span_v,
                          hscale, emit_dog, bh, w, pad_x, halo),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[out_spec, out_spec] if emit_dog else out_spec,
        out_shape=[out_shape, out_shape] if emit_dog else out_shape,
        scratch_shapes=[pltpu.VMEM((rows, w + 2 * pad_x), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(padded)
    if emit_dog:
        return res[0][:h], res[1][:h]
    return res[:h]


def sep_blur_fused(img: jnp.ndarray,
                   taps_h: np.ndarray, span_h: int,
                   taps_v: np.ndarray | None = None,
                   span_v: int | None = None,
                   hscale: float = 1.0) -> jnp.ndarray:
    """Fused separable blur of a (H, W) image with edge ("clamp") padding.

    ``out = blur_v(hscale * blur_h(img))``; taps_v defaults to taps_h.
    Dispatches to the Pallas kernel on TPU, or composes the XLA
    shift-and-add blurs elsewhere (identical numerics).
    """
    if taps_v is None:
        taps_v, span_v = taps_h, span_h
    span_h = int(span_h)
    span_v = int(span_v)
    h, w = img.shape

    from .dispatch import kernel_interpret, pallas_enabled
    # the kernel wins on large planes; for small octaves the per-launch
    # overhead (~0.3 ms) exceeds the whole XLA blur, which also fuses into
    # neighbouring ops
    if not pallas_enabled() or h < 8 or h * w < (1 << 18) \
            or (span_h <= 1 and span_v <= 1):
        from ..ops.pyramid import blur_1d
        out = blur_1d(img, np.asarray(taps_h), span_h, axis=-1)
        if hscale != 1.0:
            out = out * hscale
        return blur_1d(out, np.asarray(taps_v), span_v, axis=-2)

    th = tuple(float(t) for t in np.asarray(taps_h)[:max(span_h, 1)])
    tv = tuple(float(t) for t in np.asarray(taps_v)[:max(span_v, 1)])
    halo = _round8(span_v - 1)
    pad_x = _round128(span_h - 1)
    bh = 32 if h >= 32 else _round8(max(h, 8))
    h_pad = (-(-h // bh)) * bh
    w128 = _round128(w)
    # right-edge extra padding keeps lanes 128-aligned; the surplus columns
    # see edge-replicated input so the valid region is exact
    padded = jnp.pad(img, ((halo, halo + (h_pad - h)),
                           (pad_x, pad_x + (w128 - w))),
                     mode="edge")
    return _sep_blur_pallas(padded, th, span_h, tv, span_v, float(hscale),
                            h, w128, interpret=kernel_interpret())[:, :w]


def sep_blur_fused_with_dog(img: jnp.ndarray, taps: np.ndarray,
                            span: int, interpret: bool | None = None):
    """Separable blur + the DoG layer (blurred - img) in one kernel pass.

    Returns (blurred, dog).  The DoG subtraction is free while source and
    result are both in VMEM — the separate make_dog pass re-reads both
    full levels from HBM.  Falls back to composed XLA ops off-TPU."""
    span = int(span)
    h, w = img.shape

    from .dispatch import kernel_interpret, pallas_enabled
    interpret = kernel_interpret(interpret)
    if not (pallas_enabled() or interpret) or h < 8 \
            or h * w < (1 << 18) or span <= 1:
        from ..ops.pyramid import blur_1d
        out = blur_1d(img, np.asarray(taps), span, axis=-1)
        out = blur_1d(out, np.asarray(taps), span, axis=-2)
        return out, out - img

    t = tuple(float(x) for x in np.asarray(taps)[:span])
    halo = _round8(span - 1)
    pad_x = _round128(span - 1)
    bh = 32 if h >= 32 else _round8(max(h, 8))
    h_pad = (-(-h // bh)) * bh
    w128 = _round128(w)
    padded = jnp.pad(img, ((halo, halo + (h_pad - h)),
                           (pad_x, pad_x + (w128 - w))),
                     mode="edge")
    out, dog = _sep_blur_pallas(padded, t, span, t, span, 1.0,
                                h, w128, emit_dog=True,
                                interpret=interpret)
    return out[:, :w], dog[:, :w]
