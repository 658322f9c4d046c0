"""End-to-end single-image SIFT extraction as one jitted XLA program.

This is the TPU replacement for ``Pyramid::step1`` + ``Pyramid::step2`` +
``get_descriptors`` (/root/reference/src/popsift/sift_pyramid.cu:227-322):
the per-octave CUDA stream/event graph collapses into a single compiled
function; the device-resident counter registry (``dct``/``dbuf``/``dobuf``,
sift_pyramid.cu:41-49) becomes fixed-capacity padded arrays + count scalars.

Extractors are cached per (config.static_key(), width, height) — the analog
of ``Config::equal`` gating re-initialisation (popsift.cpp:91-107) plus the
reference's realloc-on-growth dimension handling (s_image.cu:79-117), which
XLA's static shapes turn into a compile-cache bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import (Config, DescMode, GaussMode, GridFilterMode, NormMode,
                     ScalingMode, SiftMode)
from .constants import ConstInfo, build_const_info
from .gauss import GaussInfo, build_gauss_info
from .ops import descriptors as ops_desc
from .ops import extrema as ops_ext
from .ops import gradients as ops_grad
from .ops import orientation as ops_ori
from .ops import pyramid as ops_pyr


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class ExtractorPlan:
    """Static shape/strategy information for one compile bucket."""

    input_w: int
    input_h: int
    dims: tuple[tuple[int, int], ...]   # per-octave (w, h)
    levels: int
    octaves: int
    sift_mode: SiftMode
    gauss_mode: GaussMode
    scaling_mode: ScalingMode
    desc_mode: DescMode
    norm_mode: NormMode
    upscale_factor: float
    sigma0: float
    sigma_k: float
    peak_threshold: float
    edge_limit: float
    norm_multi: int
    filter_grid_size: int
    filter_max_extrema: int
    grid_filter_mode: "GridFilterMode"
    cand_caps: tuple[int, ...]
    ext_caps: tuple[int, ...]
    ori_caps: tuple[int, ...]
    ori_win: int
    desc_win: int


def make_plan(config: Config, width: int, height: int) -> ExtractorPlan:
    levels = max(2, config.levels)
    w0, h0 = config.scaled_dims(width, height)
    octaves = config.num_octaves_for(width, height)

    dims = []
    w, h = w0, h0
    for _ in range(octaves):
        dims.append((w, h))
        w = -(-w // 2)
        h = -(-h // 2)

    cand_caps = []
    ext_caps = []
    ori_caps = []
    for (w, h) in dims:
        voxels = w * h * levels
        # Static capacities replace the reference's realloc-on-overflow
        # (sift_pyramid.cu:179-209). Defaults cover typical natural-image
        # keypoint densities with slack; the clamp semantics on overflow
        # match the reference's clamp to max_extrema
        # (s_extrema.cu:549-557). `overflow` counters report drops.
        if config.ext_capacity > 0:
            ext_cap = config.ext_capacity
        else:
            ext_cap = min(config.max_extrema,
                          max(512, _round_up(voxels // 256, 128)),
                          16384)
        cand_cap = min(max(config.max_extrema, 2 * ext_cap),
                       max(1024, _round_up(voxels // 64, 128)),
                       65536)
        if config.ori_capacity > 0:
            ori_cap = config.ori_capacity
        else:
            # max_orientations = 1.25x (sift_constants.cu:31)
            ori_cap = _round_up(ext_cap + ext_cap // 4, 128)
        cand_caps.append(cand_cap)
        ext_caps.append(ext_cap)
        ori_caps.append(ori_cap)

    return ExtractorPlan(
        input_w=width, input_h=height,
        dims=tuple(dims), levels=levels, octaves=octaves,
        sift_mode=config.sift_mode, gauss_mode=config.gauss_mode,
        scaling_mode=config.scaling_mode, desc_mode=config.desc_mode,
        norm_mode=config.norm_mode,
        upscale_factor=config.upscale_factor,
        sigma0=config.sigma, sigma_k=2.0 ** (1.0 / levels),
        peak_threshold=config.get_peak_threshold(),
        edge_limit=config.edge_limit,
        norm_multi=config.norm_multiplier,
        filter_grid_size=config.filter_grid_size,
        filter_max_extrema=config.filter_max_extrema,
        grid_filter_mode=config.grid_filter_mode,
        cand_caps=tuple(cand_caps), ext_caps=tuple(ext_caps),
        ori_caps=tuple(ori_caps),
        ori_win=ops_ori.ori_window_size(config.sigma, levels),
        desc_win=ops_desc.desc_window_size(config.sigma, levels),
    )


def grad_pad_dims(plan) -> tuple[int, int]:
    """Shared pad of the per-octave [mag; theta] field: must cover the
    window-DMA slab of BOTH the orientation and descriptor gathers."""
    from .kernels.windows import aligned_window_dims
    return aligned_window_dims(max(plan.ori_win, plan.desc_win))


def field_pads(plan, dims_o: tuple[int, int]) -> tuple[int, int]:
    """Gradient-field pads for one octave, agreed between the producer
    (ops.gradients.gradient_field) and every window consumer.

    On TPU, octaves big enough for the fused field kernel get an
    UNPADDED field — the window kernels clamp their DMA origins into the
    array, so padding was only ever finite filler costing a ~0.5 GB copy
    at octave 0.  Small octaves (and other backends) keep the padded XLA
    field, whose pads the XLA gather fallbacks rely on."""
    w, h = dims_o
    from .kernels.binwin import _win_rows
    from .kernels.dispatch import pallas_enabled
    from .kernels.grad import grad_field_ok
    win = max(plan.ori_win, plan.desc_win)
    if (pallas_enabled() and grad_field_ok((0, h, w))
            and win <= 120 and h >= _win_rows(win)):
        return (0, 0)
    return grad_pad_dims(plan)


def window_classes(win_max: int, cap: int, fracs: tuple,
                   chunk: int, min_cap: int = 512):
    """Static sigma-class window plan: [(win, size)] in descending-window
    order, sizes summing to ``cap``.

    The static window must cover the worst-case sigma (sn <= levels+2,
    ops.orientation.max_sigma) but the measured per-slot requirement is
    far smaller for most extrema (1080p natural scenes: median desc
    window 64 vs static 112).  Three regions sized by ``fracs`` =
    (big, mid, small) fractions process sigma-sorted slots at
    {1.0, ~0.78, ~0.55} x the max window; a slot landing in a region
    whose window is smaller than its requirement is a *violation* the
    caller detects and falls back on.  Returns None when ``cap`` is too
    small for the split to pay (region padding would dominate)."""
    if cap < min_cap or win_max <= 32:
        return None
    w_mid = min(win_max, (int(win_max * 0.78) + 7) // 8 * 8)
    w_small = min(w_mid, (int(win_max * 0.55) + 7) // 8 * 8)
    if w_small >= win_max:
        return None
    f_big, f_mid, f_small = fracs
    s_small = int(cap * f_small) // chunk * chunk
    s_mid = int(cap * f_mid) // chunk * chunk
    s_big = cap - s_mid - s_small
    return [(win_max, s_big), (w_mid, s_mid), (w_small, s_small)]


def _dispatch_descriptors(plan, consts, stack, field, pad_y, pad_x,
                          ex, ey, el, es, ang, ovalid, w, h):
    """Descriptor-mode dispatch (sift_desc.cu:55-110)."""
    if plan.desc_mode == DescMode.LOOP:
        return ops_desc.loop_descriptors(
            field, pad_y, pad_x, ex, ey, el, es, ang, ovalid, w, h,
            plan.desc_win, stack=stack)
    # sampling modes (iloop / grid / igrid / notile): on TPU each slot
    # reads a per-slot rolled window fetched by the window-DMA kernel
    # (whole-plane gathers per slot are the slowest XLA lowering on
    # TPU); edge padding reproduces the texture clamp addressing
    from .kernels.dispatch import pallas_enabled
    if pallas_enabled():
        # the sampling modes pad the raw STACK (texture clamp analog);
        # their pads are independent of the gradient field's (which may
        # be zero on TPU)
        from .kernels.windows import aligned_window_dims
        pad_y, pad_x = aligned_window_dims(plan.desc_win)
        stackp = jnp.pad(stack, ((0, 0), (pad_y, pad_y), (pad_x, pad_x)),
                         mode="edge")
        # sampling modes: MXU-contracted sampling (the fast path;
        # POPSIFT_TPU_DESC_MM=0 falls back to the gather forms)
        import os
        mm = os.environ.get("POPSIFT_TPU_DESC_MM", "1") not in ("", "0")
        if plan.desc_mode == DescMode.ILOOP:
            if mm:
                return ops_desc.iloop_descriptors_windowed_mm(
                    stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid,
                    w, h, plan.desc_win)
            return ops_desc.iloop_descriptors_windowed(
                stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid,
                w, h, plan.desc_win)
        if plan.desc_mode == DescMode.GRID:
            if mm:
                return ops_desc.grid_rounded_descriptors_windowed_mm(
                    stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid,
                    w, h, plan.desc_win)
            return ops_desc.grid_rounded_descriptors_windowed(
                stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid,
                w, h, plan.desc_win)
        # IGRID and NOTILE share these numerics deliberately: in the
        # reference they differ only in GPU thread tiling over the same
        # rotated 40x40 bilinear sampling (s_desc_igrid.cu vs
        # s_desc_notile.cu); ``rounded=True`` is NOT IGrid — it is a
        # legacy variant kept for tests (GRID mode's true rounding
        # lives in grid_rounded_descriptors_windowed*)
        if mm:
            return ops_desc.grid_descriptors_windowed_mm(
                stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid, w, h,
                plan.desc_win, consts.desc_gauss, consts.desc_tile)
        return ops_desc.grid_descriptors_windowed(
            stackp, pad_y, pad_x, ex, ey, el, es, ang, ovalid, w, h,
            plan.desc_win, consts.desc_gauss, consts.desc_tile)
    if plan.desc_mode == DescMode.ILOOP:
        return ops_desc.iloop_descriptors(
            stack, ex, ey, el, es, ang, ovalid)
    if plan.desc_mode == DescMode.GRID:
        return ops_desc.grid_rounded_descriptors(
            stack, ex, ey, el, es, ang, ovalid)
    return ops_desc.grid_descriptors(
        stack, ex, ey, el, es, ang, ovalid,
        consts.desc_gauss, consts.desc_tile)


def extract_pipeline(image: jnp.ndarray, plan: ExtractorPlan,
                     gauss: GaussInfo, consts: ConstInfo,
                     return_pyramid: bool = False) -> dict[str, Any]:
    """Full extraction. ``image`` is (H, W) f32 normalized to [0, 1].

    Returns a pytree with per-octave padded results:
      octaves[o] = dict(x, y, lpos, sigma, valid, count, num_ori,
                        orientations, idx_ori, desc, ori_valid, ori_count,
                        overflow)
    Coordinates are octave-local (scaling to input coordinates is
    ``prep_features``' job, sift_pyramid.cu:250-280, done host-side).
    """
    stacks, dogs = ops_pyr.build_pyramid_and_dogs(
        image, gauss, plan.dims, plan.levels, plan.gauss_mode,
        plan.scaling_mode, plan.sift_mode, plan.upscale_factor)

    out: dict[str, Any] = {"octaves": []}
    if return_pyramid:
        out["pyramid"] = stacks
        out["dog"] = dogs

    exts = [
        ops_ext.find_extrema(
            dogs[o], plan.sift_mode, plan.sigma0, plan.sigma_k,
            plan.peak_threshold, plan.edge_limit, plan.filter_grid_size,
            plan.cand_caps[o], plan.ext_caps[o])
        for o in range(plan.octaves)
    ]

    # grid filtering between detection and orientation
    # (Pyramid::orientation, s_orientation.cu:378-385)
    if plan.filter_max_extrema > 0:
        from .ops import filtergrid as ops_fg
        keeps = ops_fg.grid_filter_keep_masks(
            exts, plan.filter_max_extrema, plan.filter_grid_size,
            plan.grid_filter_mode)
        exts = [ops_fg.recompact(e, k) for e, k in zip(exts, keeps)]

    for o, stack in enumerate(stacks):
        w, h = plan.dims[o]
        ext = exts[o]
        pad_y, pad_x = field_pads(plan, plan.dims[o])
        field = ops_grad.gradient_field(stack, pad_y, pad_x)

        num_ori, orientations = ops_ori.assign_orientations(
            field, pad_y, pad_x, ext.xpos, ext.ypos, ext.lpos, ext.sigma,
            ext.valid, w, h, plan.ori_win, stack=stack)

        nums = jnp.where(ext.valid, num_ori, 0)
        incl = jnp.cumsum(nums)
        idx_ori = incl - nums
        ori_total = incl[-1] if incl.shape[0] else jnp.int32(0)

        ocap = plan.ori_caps[o]
        j = jnp.arange(ocap, dtype=jnp.int32)
        fmap = jnp.searchsorted(incl, j, side="right").astype(jnp.int32)
        ori_count = jnp.minimum(ori_total, ocap)
        ovalid = j < ori_count
        e = jnp.clip(fmap, 0, plan.ext_caps[o] - 1)
        k = jnp.clip(j - idx_ori[e], 0, 3)
        ang = orientations[e, k]

        ex = ext.xpos[e]
        ey = ext.ypos[e]
        el = ext.lpos[e]
        es = ext.sigma[e]

        desc = _dispatch_descriptors(
            plan, consts, stack, field, pad_y, pad_x, ex, ey, el, es, ang,
            ovalid, w, h)

        if plan.norm_mode == NormMode.ROOT_SIFT:
            desc = ops_desc.normalize_rootsift(desc, plan.norm_multi, ovalid)
        else:
            desc = ops_desc.normalize_l2(desc, plan.norm_multi, ovalid)

        out["octaves"].append(dict(
            x=ext.xpos, y=ext.ypos, lpos=ext.lpos, sigma=ext.sigma,
            cell=ext.cell, valid=ext.valid, count=ext.count,
            overflow=ext.overflow,
            num_ori=nums, orientations=orientations, idx_ori=idx_ori,
            desc=desc, ori_valid=ovalid, ori_count=ori_count,
            ori_overflow=ori_total - ori_count,
            feat_map=e,
        ))

    return out


@functools.lru_cache(maxsize=32)
def get_extractor(config: Config, width: int, height: int,
                  return_pyramid: bool = False):
    """Build (and cache) a jitted extractor for a (config, W, H) bucket.

    Returns (jitted_fn, plan). The function takes a (H, W) f32 [0,1] image.
    """
    plan = make_plan(config, width, height)
    gauss = build_gauss_info(config)
    consts = build_const_info(config)

    def fn(image):
        return extract_pipeline(image, plan, gauss, consts,
                                return_pyramid=return_pyramid)

    return jax.jit(fn), plan


def normalize_input(image: np.ndarray) -> np.ndarray:
    """uint8 -> [0,1] f32 (the CUDA normalized-float texture read divides by
    255, s_image.cu:147); float input is passed through (already [0,1] by
    API contract, main.cpp:231-236)."""
    if image.dtype == np.uint8:
        try:
            from . import _host_native
            return _host_native.normalize_u8(image)
        except ImportError:
            return image.astype(np.float32) / 255.0
    return np.asarray(image, dtype=np.float32)
