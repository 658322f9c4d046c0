"""Pallas TPU kernel: fused octave chain — all Gaussian levels, DoGs and
the gradient field of one octave in a single pass over row/lane blocks.

The incremental chain (levels 1..L-1 each blurred from the previous,
s_pyramid_build.cu:549-556) previously ran as one Pallas blur per level
(kernels/blur.py): each level cost an XLA edge-pad copy, a slab re-read
of the previous level from HBM, and the per-level outputs were then
re-assembled with ``jnp.stack`` (another full copy) and re-read a fourth
time by the gradient kernel.  At octave 0 of a 1080p frame that is
~2.3 GB of HBM traffic for ~0.9 GB of mandatory output bytes.

This kernel is the TPU analog of the reference's fused octave kernels
(s_pyramid_fixed.cu:69-120) generalized to arbitrary incremental spans:
per (row-block, lane-block) grid step it DMAs ONE slab of the
edge-padded level 0 and keeps the whole level chain in VMEM —

* vertical taps run on static, per-level SHRINKING row windows (level l
  only computes the rows the remaining chain still needs — the naive
  fixed-height variant recomputed a 4x row surplus at every level and
  was VPU-bound, slower than the per-level kernels),
* horizontal taps use ``pltpu.roll`` lane shifts at fixed width; the
  wraparound only pollutes the 128-lane margin the chain's cumulative
  horizontal halo (sum of spans) is statically checked to fit,
* the reference's per-level texture clamp (every level is re-clamped at
  the IMAGE edge before the next level reads it) is reproduced by
  static-index edge-row/column replication, applied only to the few
  blocks that touch an image edge (``pl.when`` on the block index),
* the DoG layer (make_dog, s_pyramid_build.cu:74-92) and the
  magnitude/angle planes (s_gradiant.h:55-69, same interleaved layout
  and polynomial atan2 as kernels/grad.py) are emitted while the level
  is still in VMEM.

Every output carries the block-alignment surplus (rows to a multiple of
the row block, lanes to a multiple of the lane block); surplus values
are edge-replicated chain values — finite, and masked by every
consumer's image-coordinate gates (detection takes explicit true h/w).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 2   # input-slab DMA double buffering


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def chain_halo(spans, emit_field: bool) -> int:
    """Rows/lanes of level-0 context one output point needs: the sum of
    all incremental spans (each level consumes span-1 each side) plus
    one for the central-difference gradient."""
    return sum(int(s) - 1 for s in spans) + (1 if emit_field else 0)


def chain_halos(spans, emit_field: bool) -> tuple:
    """Per-level 8-aligned row halos, built from the last level down so
    every level's slice window stays sublane-aligned (Mosaic requires
    ref slices 8-aligned) AND covers the next level's taps:
    ``halos[l-1] >= halos[l] + span_l - 1``."""
    L = len(spans)
    halos = [0] * L
    halos[L - 1] = _round8(1 if emit_field else 0)
    for lvl in range(L - 1, 0, -1):
        halos[lvl - 1] = _round8(halos[lvl] + int(spans[lvl]) - 1)
    return tuple(halos)


def octave_chain_ok(h: int, w: int, spans, emit_field: bool) -> bool:
    """Eligibility: the cumulative halo must fit the fixed 128-lane DMA
    margin (and the 8-rounded row halo must stay VMEM-friendly); tiny
    octaves fall back to the per-level path, whose XLA forms fuse well
    at that size anyway."""
    halo = chain_halo(spans, emit_field)
    return (halo <= 120 and h >= 32 and w >= 129
            and h * w >= (1 << 16))


def _row_block(h: int) -> int:
    # Bigger row blocks amortize the vertical halo recompute (the chain's
    # dominant VPU overhead): at 1080p octave 0 the kernel measures
    # 7.24 / 5.87 / 5.43 ms for bh = 64 / 128 / 256 (xplane device trace).
    # 256-row blocks need the raised vmem_limit_bytes below; 512 was
    # tried (round 5) and exceeds physical VMEM (141 MB > 128 MB: the
    # widest levels' tap-chain temporaries scale with block rows).
    if h >= 1024:
        return 256
    if h >= 256:
        return 128
    return 64 if h >= 64 else _round8(max(h, 8))


def _lane_block(w: int) -> int:
    return 1024 if w >= 1024 else _round128(w)


def _chain_kernel(src_ref, *refs, taps, spans, nb: int, nw: int,
                  h: int, w: int, hv: int, bh: int, lb: int,
                  emit_stack: bool, emit_field: bool, stack_levels,
                  ablate=()):
    """Grid: (nb * nw,) row-major.  src is (HV + nb*BH + HV,
    128 + nw*LB + 128) edge-padded level 0."""
    L = len(spans)  # levels including level 0
    (stack_ref, dogs_ref), rest = refs[:2], refs[2:]
    field_ref = rest[0] if emit_field else None
    cur_ref, slabs, sems = rest[-3:]

    k = pl.program_id(0)
    i = k // nw
    j = k % nw
    R0 = bh + 2 * hv
    LF = lb + 256

    def mk(kk, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(pl.multiple_of((kk // nw) * bh, 8), R0),
                       pl.ds(pl.multiple_of((kk % nw) * lb, 128), LF)],
            slabs.at[slot],
            sems.at[slot],
        )

    n = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        for d in range(min(_DEPTH - 1, n)):
            mk(d, d % _DEPTH).start()

    @pl.when(k + _DEPTH - 1 < n)
    def _():
        mk(k + _DEPTH - 1, (k + _DEPTH - 1) % _DEPTH).start()

    mk(k, k % _DEPTH).wait()
    cur = slabs[k % _DEPTH]
    halos = chain_halos(spans, emit_field)
    cur_h = hv  # rows of halo around the output block cur still carries

    def center(a, ah):
        return a[ah:ah + bh, 128:128 + lb]

    def clamp_level(val, ah):
        """Per-level texture clamp at the image edges, static indices
        only: each edge case is unrolled over the (small, static) set of
        blocks that can contain out-of-image rows/lanes.  Row r of a
        level array with halo ``ah`` is image row i*bh + r - ah."""
        rows = bh + 2 * ah
        ref = cur_ref.at[:rows]
        ref[...] = val
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, LF), 1)
        # left image edge: only lane-block 0 holds img_col < 0
        @pl.when(j == 0)
        def _():
            ref[...] = jnp.where(ci < 128, ref[:, 128:129], ref[...])
        # right image edge: only the last lane-block holds img_col > W-1
        # (the lane of img_col W-1 is static there)
        re = 128 + (w - 1) - (nw - 1) * lb
        @pl.when(j == nw - 1)
        def _():
            ref[...] = jnp.where(ci > re, ref[:, re:re + 1], ref[...])
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, LF), 0)
        # top image edge: blocks with ii*bh < ah hold img_row < 0
        for ii in range(min(nb, -(-ah // bh))):
            e = ah - ii * bh
            @pl.when(i == ii)
            def _(e=e):
                ref[...] = jnp.where(ri < e, ref[e:e + 1, :], ref[...])
        # bottom image edge: blocks with ii*bh + bh + ah > h hold
        # img_row > h-1
        for ii in range(max(0, (h - bh - ah) // bh + 1), nb):
            e = h - 1 - ii * bh + ah
            @pl.when(i == ii)
            def _(e=e):
                ref[...] = jnp.where(ri > e, ref[e:e + 1, :], ref[...])
        return ref[...]

    def emit_grad(val, ah, lvl):
        # central differences + magnitude + polynomial angle on the
        # (clamped) level, center block only (s_gradiant.h:55-69)
        from .binwin import _atan2_poly
        dx = (val[ah:ah + bh, 129:129 + lb]
              - val[ah:ah + bh, 127:127 + lb])
        dy = (val[ah + 1:ah + 1 + bh, 128:128 + lb]
              - val[ah - 1:ah - 1 + bh, 128:128 + lb])
        if "grad_math" in ablate:
            field_ref[2 * lvl] = dx
            field_ref[2 * lvl + 1] = dy
            return
        field_ref[2 * lvl] = jnp.sqrt(dx * dx + dy * dy)
        field_ref[2 * lvl + 1] = _atan2_poly(dy, dx)

    def emit_level(val, ah, lvl):
        if emit_stack:
            stack_ref[lvl] = center(val, ah)
        elif lvl in stack_levels:
            stack_ref[stack_levels.index(lvl)] = center(val, ah)
        if emit_field:
            emit_grad(val, ah, lvl)

    # level 0: pre-clamped by the caller's XLA edge pad
    emit_level(cur, cur_h, 0)

    for lvl in range(1, L):
        span = spans[lvl]
        tv = taps[lvl]
        nxt_h = halos[lvl]
        rows = bh + 2 * nxt_h
        d = cur_h - nxt_h  # rows consumed >= span-1, 8-aligned
        # vertical taps on the shrinking static row window (same tap
        # order and pairing as kernels/blur.py)
        acc = cur[d:d + rows, :] * tv[0]
        if "vertical" not in ablate:
            for off in range(1, span):
                acc = acc + (cur[d - off:d - off + rows, :]
                             + cur[d + off:d + off + rows, :]) * tv[off]
        # horizontal taps as lane rolls at fixed width; wraparound only
        # pollutes the 128-lane margin beyond the cumulative halo
        nxt = acc * tv[0]
        if "horizontal" not in ablate:
            for off in range(1, span):
                nxt = nxt + (pltpu.roll(acc, off, 1)
                             + pltpu.roll(acc, LF - off, 1)) * tv[off]
        if "clamp" not in ablate:
            nxt = clamp_level(nxt, nxt_h)
        dogs_ref[lvl - 1] = center(nxt, nxt_h) - center(cur, cur_h)
        emit_level(nxt, nxt_h, lvl)
        cur, cur_h = nxt, nxt_h


@functools.partial(
    jax.jit,
    static_argnames=("taps", "spans", "h", "w", "emit_stack",
                     "emit_field", "stack_levels", "interpret",
                     "ablate"))
def _octave_chain_pallas(padded, taps, spans, h: int, w: int,
                         emit_stack: bool, emit_field: bool,
                         stack_levels, interpret: bool = False,
                         ablate: tuple = ()):
    L = len(spans)
    hv = chain_halos(spans, emit_field)[0]
    bh = _row_block(h)
    lb = _lane_block(w)
    nb = -(-h // bh)
    nw = -(-w // lb)
    hp = nb * bh
    wp = nw * lb
    R0 = bh + 2 * hv
    LF = lb + 256

    n_stack = L if emit_stack else len(stack_levels)
    out_specs = [
        pl.BlockSpec((n_stack, bh, lb), lambda k: (0, k // nw, k % nw),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, bh, lb), lambda k: (0, k // nw, k % nw),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_stack, hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((L - 1, hp, wp), jnp.float32),
    ]
    if emit_field:
        out_specs.append(
            pl.BlockSpec((2 * L, bh, lb), lambda k: (0, k // nw, k % nw),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((2 * L, hp, wp), jnp.float32))

    kern = functools.partial(
        _chain_kernel, taps=taps, spans=spans, nb=nb, nw=nw, h=h, w=w,
        hv=hv, bh=bh, lb=lb, emit_stack=emit_stack,
        emit_field=emit_field, stack_levels=stack_levels,
        ablate=ablate)
    outs = pl.pallas_call(
        kern,
        grid=(nb * nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R0, LF), jnp.float32),
                        pltpu.VMEM((_DEPTH, R0, LF), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the tap chains of the widest levels keep many (rows, LF)
            # temporaries live — beyond the 16 MB default scoped limit
            # but a fraction of the 128 MB physical VMEM of v4/v5 cores
            # (100 MB admits the 256-row block whose smaller relative
            # vertical halo is the kernel's main VPU-work lever)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded)
    return outs


def octave_chain_fused(lvl0: jnp.ndarray, filters, spans,
                       emit_stack: bool, emit_field: bool,
                       stack_levels: tuple = (),
                       interpret: bool | None = None,
                       _ablate: tuple = ()):
    """Fused incremental octave chain from level 0.

    lvl0 : (H, W) f32 level 0 of the octave.
    filters/spans : per-level half-filters and spans (index 0 unused).
    emit_stack : write all L levels; otherwise only ``stack_levels``
        (e.g. just level L-3 for the next octave's downscale).
    emit_field : also emit the (2L, hp, wp) interleaved mag/theta field
        (kernels/grad.py layout).

    Returns (stack, dogs[, field]); all outputs carry block-alignment
    surplus (hp/wp rounded to the row/lane blocks) holding
    edge-replicated finite values — consumers mask by true image dims.
    """
    import numpy as np
    h, w = lvl0.shape
    L = len(spans)
    assert emit_stack or stack_levels, "need at least one stack level"
    spans_t = tuple(int(s) for s in spans)
    taps_t = tuple(
        tuple(float(t) for t in np.asarray(filters[lvl])[:spans_t[lvl]])
        for lvl in range(L))
    hv = chain_halos(spans_t, emit_field)[0]
    bh = _row_block(h)
    lb = _lane_block(w)
    nb = -(-h // bh)
    nw = -(-w // lb)
    padded = jnp.pad(lvl0, ((hv, hv + nb * bh - h),
                            (128, 128 + nw * lb - w)), mode="edge")
    from .dispatch import kernel_interpret
    return _octave_chain_pallas(
        padded, taps_t, spans_t, h, w, emit_stack, emit_field,
        tuple(stack_levels), interpret=kernel_interpret(interpret),
        ablate=tuple(_ablate))
