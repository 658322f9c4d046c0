"""Gaussian scale-space + DoG construction, TPU-native.

Replaces the texture/surface/stream machinery of the reference
(/root/reference/src/popsift/s_pyramid_build*.cu, s_pyramid_fixed.cu) with
dense per-octave ``(levels+3, H, W)`` arrays and XLA convolutions:

* input resampling: the reference reads the input through a
  normalized-coordinate bilinear texture (s_image.cu:138-167) so that the
  octave-0 grid implicitly up/downscales the image; here this is an explicit
  separable bilinear resample to the octave grid (same + 0.5*2^up "shift"
  semantics, s_pyramid_build.cu:110-114).
* separable Gaussian blur: the warp-shuffle gather kernels
  (s_pyramid_build_aa.cu:17-50) become 1-D convolutions with edge padding
  (the analog of CUDA clamp addressing).
* octave downscale: pick-every-second-pixel of level ``levels-3``
  (s_pyramid_build.cu:50-71) becomes a strided slice.
* DoG: adjacent-level subtraction (make_dog, s_pyramid_build.cu:74-92).

All shapes are static; one jitted program replaces the per-octave CUDA
stream/event graph (XLA schedules the octave chain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GaussMode, ScalingMode, SiftMode
from ..gauss import GaussInfo

PREV_LEVEL = 3  # s_pyramid_build.cu:22


def _resample_1d(arr: jnp.ndarray, dst_size: int, src_size: int,
                 shift: float, axis: int) -> jnp.ndarray:
    """Bilinear resample along one axis.

    Destination index x samples the source at normalized coordinate
    (x + shift) / dst_size, i.e. source pixel (x+shift)*src/dst - 0.5, with
    clamp addressing — exactly the texture read in
    s_pyramid_build_ra.cu:37-38 combined with the hardware bilinear filter.

    The default 2x upscale is specialised to shift/interleave arithmetic
    (TPUs have no fast gather; the general path's static ``take`` lowers
    poorly on the minor axis).
    """
    if dst_size == 2 * src_size:
        return _upsample2_1d(arr, shift, axis)

    pos = (np.arange(dst_size, dtype=np.float64) + shift) \
        * (src_size / dst_size) - 0.5
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, src_size - 1)
    i1 = np.clip(i0 + 1, 0, src_size - 1)
    w = np.clip(pos - np.floor(pos), 0.0, 1.0).astype(np.float32)
    # CUDA clamps the *coordinate*; below 0 the fractional weight must not
    # blend: floor(pos) < 0 gives i0 == i1 == 0 so the weight is harmless.
    a = jnp.take(arr, jnp.asarray(i0), axis=axis)
    b = jnp.take(arr, jnp.asarray(i1), axis=axis)
    w_shape = [1] * arr.ndim
    w_shape[axis] = dst_size
    w = jnp.asarray(w).reshape(w_shape)
    return a * (1.0 - w) + b * w


def _upsample2_1d(arr: jnp.ndarray, shift: float, axis: int) -> jnp.ndarray:
    """2x bilinear upscale along one axis via interleaving.

    dst position x samples source at (x+shift)/2 - 0.5: even outputs at
    k + (shift-1)/2, odd outputs at k + shift/2, i.e. two static blends of
    the source with its +1 (or -1) shifted copy, interleaved in place.
    The interleave stays on the native axis (no moveaxis: a transpose of
    the octave-0 plane is a multi-ms relayout on TPU)."""
    axis = axis % arr.ndim
    n = arr.shape[axis]

    def shifted(delta: int) -> jnp.ndarray:
        # arr shifted by +-1 along axis with clamp addressing
        idx = [slice(None)] * arr.ndim
        edge = [slice(None)] * arr.ndim
        if delta > 0:
            idx[axis] = slice(1, None)
            edge[axis] = slice(n - 1, None)
            return jnp.concatenate([arr[tuple(idx)], arr[tuple(edge)]],
                                   axis=axis)
        idx[axis] = slice(None, n - 1)
        edge[axis] = slice(None, 1)
        return jnp.concatenate([arr[tuple(edge)], arr[tuple(idx)]],
                               axis=axis)

    def blend(frac: float) -> jnp.ndarray:
        # sample at k + frac with clamp addressing, frac in (-1, 1)
        if frac >= 0.0:
            return arr * (1.0 - frac) + shifted(+1) * frac
        return arr * (1.0 + frac) + shifted(-1) * (-frac)

    even = blend((shift - 1.0) / 2.0)
    odd = blend(shift / 2.0)
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(arr.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape)


def resample_input(image: jnp.ndarray, dst_h: int, dst_w: int,
                   shift: float) -> jnp.ndarray:
    """Resample the [0,1]-normalized input image onto an octave grid."""
    src_h, src_w = image.shape
    out = _resample_1d(image, dst_h, src_h, shift, axis=0)
    out = _resample_1d(out, dst_w, src_w, shift, axis=1)
    return out


def _full_kernel(half_taps: np.ndarray, span: int) -> np.ndarray:
    """Expand a half-sided filter (centre first) into the full symmetric
    kernel of length 2*span-1."""
    h = half_taps[:span]
    return np.concatenate([h[:0:-1], h]).astype(np.float32)


def blur_1d(img: jnp.ndarray, half_taps: np.ndarray, span: int,
            axis: int) -> jnp.ndarray:
    """Separable Gaussian blur along one axis with edge ("clamp") padding.

    ``img`` is (..., H, W); axis is -1 (horizontal) or -2 (vertical).

    Implemented as shift-and-add over statically unrolled taps instead of a
    conv op: the taps are few (span <= 31), XLA fuses the whole sum into a
    single VPU loop, and — unlike ``lax.conv`` — it compiles quickly and
    identically on every backend.  Symmetric taps are paired (one multiply
    per pair) like the CUDA kernels pair A+B reads
    (s_pyramid_build_aa.cu:28-47).
    """
    span = int(span)
    taps = np.asarray(half_taps, dtype=np.float32)
    if span <= 1:
        return img * float(taps[0])

    pad = span - 1
    pad_cfg = [(0, 0)] * img.ndim
    pad_cfg[axis] = (pad, pad)
    padded = jnp.pad(img, pad_cfg, mode="edge")

    size = img.shape[axis]

    def sl(off: int) -> jnp.ndarray:
        idx = [slice(None)] * img.ndim
        idx[axis] = slice(pad + off, pad + off + size)
        return padded[tuple(idx)]

    out = sl(0) * float(taps[0])
    for off in range(1, span):
        out = out + (sl(-off) + sl(off)) * float(taps[off])
    return out


def sep_blur(img: jnp.ndarray, half_taps: np.ndarray, span: int) -> jnp.ndarray:
    """Full separable blur (horizontal then vertical, same taps)."""
    out = blur_1d(img, half_taps, span, axis=-1)
    return blur_1d(out, half_taps, span, axis=-2)


def _fused(img, taps_h, span_h, taps_v=None, span_v=None, hscale=1.0):
    """Fused separable blur (Pallas on TPU, XLA elsewhere)."""
    from ..kernels.blur import sep_blur_fused
    return sep_blur_fused(img, taps_h, span_h, taps_v, span_v, hscale)


def downscale_by_2(level: jnp.ndarray) -> jnp.ndarray:
    """get_by_2_pick_every_second (s_pyramid_build.cu:50-71): output pixel
    (x,y) = source (2x, 2y).  ceil-halving dims come out naturally from the
    strided slice.

    Uses lax.slice directly: jnp's ``[::2, ::2]`` basic indexing lowers to
    a gather on TPU (~20 ms at 4K); the native strided slice is free.
    """
    starts = (0,) * level.ndim
    return jax.lax.slice(level, starts, level.shape,
                         (1,) * (level.ndim - 2) + (2, 2))


def make_dog(stack: jnp.ndarray) -> jnp.ndarray:
    """DoG layers: dog[l] = level[l+1] - level[l] (s_pyramid_build.cu:74-92)."""
    return stack[1:] - stack[:-1]


def input_shift(sift_mode: SiftMode, upscale_factor: float,
                octave: int) -> float:
    """Sub-pixel shift when reading the input image
    (s_pyramid_build.cu:110-114)."""
    if octave == 0 and sift_mode in (SiftMode.POPSIFT, SiftMode.VLFEAT):
        return 0.5 * (2.0 ** (upscale_factor - octave))
    return 0.5


def build_pyramid(image: jnp.ndarray,
                  gauss: GaussInfo,
                  dims: tuple[tuple[int, int], ...],
                  levels: int,
                  gauss_mode: GaussMode,
                  scaling_mode: ScalingMode,
                  sift_mode: SiftMode,
                  upscale_factor: float) -> list[jnp.ndarray]:
    """Build the full Gaussian scale space.

    Parameters
    ----------
    image : (H, W) f32 array, values in [0, 1] (normalized like the CUDA
        uint8 texture read).
    dims : per-octave (w, h).
    levels : config.levels (the stack has levels+3 layers).

    Returns a list of per-octave stacks (levels+3, H_o, W_o), scaled by 255
    like the reference surfaces (s_pyramid_build_ra.cu:54).

    Strategy dispatch mirrors build_pyramid (s_pyramid_build.cu:459-594).
    The Fixed9/Fixed15 fused octave kernels (s_pyramid_fixed.cu) share the
    incremental math here; the fusion is an implementation detail of the
    CUDA version that XLA performs on its own.
    """
    L = levels + 3
    num_octaves = len(dims)
    stacks: list[jnp.ndarray] = []

    fixed = gauss_mode in (GaussMode.FIXED9, GaussMode.FIXED15)
    direct_requested = scaling_mode == ScalingMode.SCALE_DIRECT
    direct = direct_requested and not fixed

    for octave in range(num_octaves):
        w, h = dims[octave]
        shift = input_shift(sift_mode, upscale_factor, octave)
        lvls: list[jnp.ndarray] = []

        if fixed:
            # Fixed9/Fixed15 fused octave (s_pyramid_fixed.cu:269-288,
            # requires levels+3 == 6):
            if L != 6:
                raise ValueError(
                    "Unsupported number of levels for making all octaves "
                    "at once")
            if octave == 0:
                # all levels from the input with abs_o0; tshift applied
                # regardless of SiftMode (s_pyramid_fixed.cu:232)
                tshift = 0.5 * (2.0 ** upscale_factor)
                base = resample_input(image, h, w, tshift)
                for lvl in range(L):
                    t = gauss.abs_o0
                    lvls.append(_fused(base, t.filter[lvl], t.span[lvl],
                                       hscale=255.0))
            else:
                # level 0 by downscale (or direct-scaling), then levels 1+
                # from level 0 with abs_oN (absoluteTexAddress variant)
                if direct_requested:
                    base = resample_input(image, h, w, 0.5)
                    lvl0 = blur_1d(base, gauss.dd.filter[octave],
                                   gauss.dd.span[octave], axis=-1) * 255.0
                    lvl0 = blur_1d(lvl0, gauss.inc.filter[0],
                                   gauss.inc.span[0], axis=-2)
                else:
                    src = stacks[octave - 1][L - PREV_LEVEL]
                    lvl0 = downscale_by_2(src)[:h, :w]
                lvls.append(lvl0)
                for lvl in range(1, L):
                    t = gauss.abs_oN
                    lvls.append(_fused(lvl0, t.filter[lvl], t.span[lvl]))
        elif gauss_mode == GaussMode.VLFEAT_RELATIVE_ALL and octave == 0:
            # all levels directly from the input image with abs_o0
            # (s_pyramid_build.cu:543-546)
            base = resample_input(image, h, w, shift)
            for lvl in range(L):
                t = gauss.abs_o0
                lvls.append(_fused(base, t.filter[lvl], t.span[lvl],
                                   hscale=255.0))
        else:
            for lvl in range(L):
                if lvl == 0:
                    if octave == 0:
                        # horiz_from_input + vert with inc[0]
                        # (s_pyramid_build.cu:554-555)
                        base = resample_input(image, h, w, shift)
                        lvls.append(_fused(
                            base, gauss.dd.filter[0], gauss.dd.span[0],
                            gauss.inc.filter[0], gauss.inc.span[0],
                            hscale=255.0))
                    elif direct:
                        # level 0 of octave o from the input image with
                        # dd[octave] (s_pyramid_build.cu:506-507)
                        base = resample_input(image, h, w, shift)
                        lvls.append(_fused(
                            base, gauss.dd.filter[octave],
                            gauss.dd.span[octave],
                            gauss.inc.filter[0], gauss.inc.span[0],
                            hscale=255.0))
                    else:
                        # downscale from previous octave's level L-3
                        # (s_pyramid_build.cu:559-562)
                        src = stacks[octave - 1][L - PREV_LEVEL]
                        down = downscale_by_2(src)
                        lvls.append(down[:h, :w])
                else:
                    t = gauss.inc
                    lvls.append(_fused(lvls[lvl - 1], t.filter[lvl],
                                       t.span[lvl]))

        stacks.append(jnp.stack(lvls))
    return stacks


def build_pyramid_dogs_fields(image: jnp.ndarray,
                              gauss: GaussInfo,
                              dims: tuple[tuple[int, int], ...],
                              levels: int,
                              gauss_mode: GaussMode,
                              scaling_mode: ScalingMode,
                              sift_mode: SiftMode,
                              upscale_factor: float,
                              pads: tuple[tuple[int, int], ...],
                              full_stacks: bool):
    """Scale space + DoG + gradient fields, with the fused octave-chain
    kernel on eligible octaves.

    The per-level path costs, at octave 0 of a 1080p frame, ~2.3 GB of
    HBM traffic (per-level pad copies + slab re-reads + jnp.stack
    re-assembly + a fourth full read by the gradient kernel) for ~0.9 GB
    of mandatory output bytes.  Eligible octaves instead run
    kernels/octave.py: ONE pass over the edge-padded level 0 computes
    every level, every DoG layer and the interleaved [mag; theta] field
    in VMEM — the TPU generalization of the reference's fused octave
    kernels (s_pyramid_fixed.cu:69-120) to arbitrary incremental spans.

    pads : per-octave gradient-field pads (extract.field_pads); only a
        (0, 0) octave is eligible (its window consumers clamp their DMA
        origins, so the chain's block-alignment surplus is harmless).
    full_stacks : emit every blurred level (sampling descriptor modes
        need the raw stack).  When False, eligible octaves emit ONLY
        level ``levels`` (= L-3, the next octave's downscale source) and
        return ``stacks[o] = None`` — the default loop-descriptor path
        never reads the stack, and not writing it saves ~L x plane
        bytes of HBM writes per octave.

    Returns (stacks, dogs, fields).  Chain octaves' outputs carry
    block-alignment surplus rows/lanes (edge-replicated, finite);
    consumers mask by the true image dims (detect_and_compact
    ``true_dims``, refine ``true_dims``, window kernels' explicit w/h).
    """
    L = levels + 3
    fixed = gauss_mode in (GaussMode.FIXED9, GaussMode.FIXED15)
    from ..kernels.dispatch import pallas_enabled
    from ..kernels.octave import octave_chain_fused, octave_chain_ok

    spans = (1,) + tuple(int(gauss.inc.span[lvl]) for lvl in range(1, L))
    filters = ([np.ones(1, np.float32)]
               + [np.asarray(gauss.inc.filter[lvl]) for lvl in range(1, L)])
    import os
    use_pallas = (pallas_enabled() and not fixed
                  and os.environ.get("POPSIFT_TPU_NO_OCTCHAIN", "")
                  in ("", "0"))

    def eligible(octave: int) -> bool:
        if not use_pallas or pads[octave] != (0, 0):
            return False
        if gauss_mode == GaussMode.VLFEAT_RELATIVE_ALL and octave == 0:
            return False  # all levels come from abs_o0, not the inc chain
        w, h = dims[octave]
        return octave_chain_ok(h, w, spans, emit_field=True)

    if not any(eligible(o) for o in range(len(dims))):
        from . import gradients as ops_grad
        stacks, dogs = build_pyramid_and_dogs(
            image, gauss, dims, levels, gauss_mode, scaling_mode,
            sift_mode, upscale_factor)
        fields = [ops_grad.gradient_field(s, *pads[o])
                  for o, s in enumerate(stacks)]
        return stacks, dogs, fields

    from . import gradients as ops_grad
    from ..kernels.blur import sep_blur_fused_with_dog

    direct = scaling_mode == ScalingMode.SCALE_DIRECT
    stacks: list = []
    dogs: list = []
    fields: list = []
    down_srcs: list = []  # per-octave level L-3 (maybe with surplus)
    for octave in range(len(dims)):
        w, h = dims[octave]
        shift = input_shift(sift_mode, upscale_factor, octave)
        # level 0, exactly as build_pyramid_and_dogs builds it
        if octave == 0:
            if gauss_mode == GaussMode.VLFEAT_RELATIVE_ALL:
                base = resample_input(image, h, w, shift)
                t = gauss.abs_o0
                stack = jnp.stack([
                    _fused(base, t.filter[lvl], t.span[lvl], hscale=255.0)
                    for lvl in range(L)])
                stacks.append(stack)
                dogs.append(make_dog(stack))
                fields.append(ops_grad.gradient_field(stack, *pads[0]))
                down_srcs.append(stack[L - PREV_LEVEL])
                continue
            base = resample_input(image, h, w, shift)
            lvl0 = _fused(base, gauss.dd.filter[0], gauss.dd.span[0],
                          gauss.inc.filter[0], gauss.inc.span[0],
                          hscale=255.0)
        elif direct:
            base = resample_input(image, h, w, shift)
            lvl0 = _fused(base, gauss.dd.filter[octave],
                          gauss.dd.span[octave],
                          gauss.inc.filter[0], gauss.inc.span[0],
                          hscale=255.0)
        else:
            lvl0 = downscale_by_2(down_srcs[octave - 1])[:h, :w]

        if eligible(octave):
            if full_stacks:
                stack, dog, field = octave_chain_fused(
                    lvl0, filters, spans, emit_stack=True,
                    emit_field=True)
                down_srcs.append(stack[L - PREV_LEVEL])
                stacks.append(stack)
            else:
                stack, dog, field = octave_chain_fused(
                    lvl0, filters, spans, emit_stack=False,
                    emit_field=True, stack_levels=(L - PREV_LEVEL,))
                down_srcs.append(stack[0])
                stacks.append(None)
            dogs.append(dog)
            fields.append(field)
            continue

        # per-level fallback (small octaves)
        lvls = [lvl0]
        lvl_dogs = []
        for lvl in range(1, L):
            nxt, dog = sep_blur_fused_with_dog(
                lvls[lvl - 1], gauss.inc.filter[lvl],
                int(gauss.inc.span[lvl]))
            lvls.append(nxt)
            lvl_dogs.append(dog)
        stack = jnp.stack(lvls)
        stacks.append(stack)
        dogs.append(jnp.stack(lvl_dogs))
        fields.append(ops_grad.gradient_field(stack, *pads[octave]))
        down_srcs.append(stack[L - PREV_LEVEL])
    return stacks, dogs, fields


def build_pyramid_and_dogs(image: jnp.ndarray,
                           gauss: GaussInfo,
                           dims: tuple[tuple[int, int], ...],
                           levels: int,
                           gauss_mode: GaussMode,
                           scaling_mode: ScalingMode,
                           sift_mode: SiftMode,
                           upscale_factor: float):
    """Scale space + DoG together.

    For every incremental-chain configuration (everything except the
    Fixed9/15 all-from-level-0 families and VLFeat_Relative_All's
    octave 0) each level's DoG layer is emitted by the level's own blur
    kernel while source and result are both in VMEM
    (kernels/blur.py:sep_blur_fused_with_dog) — the separate make_dog
    pass re-read every full level from HBM.  Identical numerics to
    build_pyramid + make_dog.
    """
    L = levels + 3
    fixed = gauss_mode in (GaussMode.FIXED9, GaussMode.FIXED15)
    direct_requested = scaling_mode == ScalingMode.SCALE_DIRECT
    direct = direct_requested and not fixed
    if fixed:
        stacks = build_pyramid(image, gauss, dims, levels, gauss_mode,
                               scaling_mode, sift_mode, upscale_factor)
        return stacks, [make_dog(s) for s in stacks]

    from ..kernels.blur import sep_blur_fused_with_dog

    stacks: list[jnp.ndarray] = []
    dogs: list[jnp.ndarray] = []
    for octave in range(len(dims)):
        w, h = dims[octave]
        shift = input_shift(sift_mode, upscale_factor, octave)
        if gauss_mode == GaussMode.VLFEAT_RELATIVE_ALL and octave == 0:
            base = resample_input(image, h, w, shift)
            t = gauss.abs_o0
            stack = jnp.stack([
                _fused(base, t.filter[lvl], t.span[lvl], hscale=255.0)
                for lvl in range(L)])
            stacks.append(stack)
            dogs.append(make_dog(stack))
            continue
        # level 0 exactly as build_pyramid builds it
        if octave == 0:
            base = resample_input(image, h, w, shift)
            lvl0 = _fused(base, gauss.dd.filter[0], gauss.dd.span[0],
                          gauss.inc.filter[0], gauss.inc.span[0],
                          hscale=255.0)
        elif direct:
            base = resample_input(image, h, w, shift)
            lvl0 = _fused(base, gauss.dd.filter[octave],
                          gauss.dd.span[octave],
                          gauss.inc.filter[0], gauss.inc.span[0],
                          hscale=255.0)
        else:
            src = stacks[octave - 1][L - PREV_LEVEL]
            lvl0 = downscale_by_2(src)[:h, :w]
        lvls = [lvl0]
        lvl_dogs = []
        for lvl in range(1, L):
            nxt, dog = sep_blur_fused_with_dog(
                lvls[lvl - 1], gauss.inc.filter[lvl],
                int(gauss.inc.span[lvl]))
            lvls.append(nxt)
            lvl_dogs.append(dog)
        stacks.append(jnp.stack(lvls))
        dogs.append(jnp.stack(lvl_dogs))
    return stacks, dogs
