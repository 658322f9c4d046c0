"""Pallas TPU kernels: fused window-DMA + in-VMEM binning.

Round-2 kept the window *fetch* in a Pallas kernel (kernels/windows2.py)
but did the binning — the 36-bin orientation histogram and the 4x4x8
descriptor contraction — in XLA over the windows written back to HBM,
which costs a full extra HBM round trip per window plus large one-hot
intermediates (the loop-descriptor matmul form materialises a
(pixels, 32) operand per slot).

These kernels do what the reference does in ONE kernel per stage
(s_orientation.cu:104-162 reads pixels and bins them in shared memory;
s_desc_loop.cu:18-139 reads pixels and accumulates the 128-bin histogram
in registers): DMA the aligned (win_y, 256) mag+theta slabs into VMEM,
roll the requested origin to lane 0, and reduce to the per-slot result
(36 or 128 floats) before anything leaves VMEM.  HBM traffic per slot
drops from slab + window-write + window-read + one-hot intermediates to
just the slab read.

Numerics are identical to the XLA forms in ops/orientation.py and
ops/descriptors.py (same gates, same int-truncated distance, same
angular wrap); tests/test_kernels.py asserts equality.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import M_4RPI, M_PI2, ORI_NBINS, ORI_WINFACTOR

_DEPTH = 4


def _win_rows(win: int) -> int:
    assert win <= 120, "rolled windows require win <= 120"
    return -(-(win + 7) // 8) * 8


def _start_slab_dmas(field_ref, slabs, sems, lp_ref, lt_ref, ya_ref,
                     xa_ref, win_y, vl_ref=None):
    """Shared deep-pipelined double-DMA schedule: per slot, the mag slab
    (level lp) and the theta slab (level lt) of the [mag; theta] field.

    ``vl_ref``: per-slot valid flags; INVALID slots skip both window
    DMAs (start AND wait are gated on the same flag, so the semaphore
    stays balanced).  Capacity slots are sized for the worst case
    (bucket caps), so a typical frame leaves 30-60% of slots invalid —
    skipping their DMAs removes that fraction of the kernel's HBM
    traffic and latency stalls for free."""
    g = pl.program_id(0)
    n = pl.num_programs(0)

    def mk(i, which, slot):
        lref = lp_ref if which == 0 else lt_ref
        return pltpu.make_async_copy(
            field_ref.at[lref[i],
                         pl.ds(pl.multiple_of(ya_ref[i], 8), win_y),
                         pl.ds(pl.multiple_of(xa_ref[i], 128), 256)],
            slabs.at[slot, which],
            sems.at[slot, which],
        )

    def start(i, slot):
        def go():
            for which in (0, 1):
                mk(i, which, slot).start()
        if vl_ref is None:
            go()
        else:
            pl.when(vl_ref[i] != 0)(go)

    @pl.when(g == 0)
    def _():
        for j in range(min(_DEPTH - 1, n)):
            start(j, j % _DEPTH)

    @pl.when(g + _DEPTH - 1 < n)
    def _():
        start(g + _DEPTH - 1, (g + _DEPTH - 1) % _DEPTH)

    def wait():
        for which in (0, 1):
            mk(g, which, g % _DEPTH).wait()
    if vl_ref is None:
        wait()
    else:
        pl.when(vl_ref[g] != 0)(wait)
    return g


# ---------------------------------------------------------------------------
# orientation: fused window + 36-bin gradient-magnitude histogram
# ---------------------------------------------------------------------------

def _ori_kernel(lp_ref, lt_ref, ya_ref, xa_ref, dx_ref, xf_ref, yf_ref,
                sg_ref, vl_ref, field_ref, out_ref, slabs, sems,
                *, win_y: int, w: int, h: int, pad_y: int, pad_x: int):
    g = _start_slab_dmas(field_ref, slabs, sems, lp_ref, lt_ref,
                         ya_ref, xa_ref, win_y, vl_ref=vl_ref)

    valid = vl_ref[g]

    @pl.when(valid > 0)
    def _():
        dx = dx_ref[g]
        mw = pltpu.roll(slabs[g % _DEPTH, 0], -dx, 1)[:, :128]
        tw = pltpu.roll(slabs[g % _DEPTH, 1], -dx, 1)[:, :128]

        x = xf_ref[g]
        y = yf_ref[g]
        sigma = sg_ref[g]
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        rad = jnp.round(3.0 * (ORI_WINFACTOR * sigma)).astype(jnp.int32)
        # origin of the rolled window in unpadded image coords: columns
        # start exactly at x0 = rx - win//2 (lane roll), rows at the
        # 8-aligned ya
        x0 = xa_ref[g] + dx - pad_x
        y0 = ya_ref[g] - pad_y

        jj = x0 + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 1)
        ii = y0 + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 0)

        xmin = jnp.maximum(1, rx - rad)
        xmax = jnp.minimum(w - 2, rx + rad)
        ymin = jnp.maximum(1, ry - rad)
        ymax = jnp.minimum(h - 2, ry + rad)
        in_xy = (jj >= xmin) & (jj <= xmax) & (ii >= ymin) & (ii <= ymax)

        dxf = jj.astype(jnp.float32) - x
        dyf = ii.astype(jnp.float32) - y
        # int truncation of the squared distance (s_orientation.cu:142)
        sq = (dxf * dxf + dyf * dyf).astype(jnp.int32)
        sigw = ORI_WINFACTOR * sigma
        factor = -0.5 / (sigw * sigw)
        inside = (sq <= rad * rad) & in_xy

        weight = jnp.where(
            inside, mw * jnp.exp(sq.astype(jnp.float32) * factor), 0.0)

        bidx = (jnp.round(ORI_NBINS * (tw + math.pi) / M_PI2)
                .astype(jnp.int32))
        bidx = jnp.where(bidx == ORI_NBINS, 0, bidx)

        cols = [jnp.sum(jnp.where(bidx == b, weight, 0.0))
                for b in range(ORI_NBINS)]
        out_ref[0, 0, :] = jnp.stack(cols)

    @pl.when(valid <= 0)
    def _():
        out_ref[0, 0, :] = jnp.zeros((ORI_NBINS,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("win", "w", "h", "pad_y",
                                             "pad_x", "interpret"))
def ori_hist_fused_pallas(field, lp, lt, ya, xa, dx0, xf, yf, sg, vl,
                          win: int, w: int, h: int, pad_y: int,
                          pad_x: int, interpret: bool = False):
    """(n, 36) orientation histograms; one fused window+bin kernel."""
    n = lp.shape[0]
    win_y = _win_rows(win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        # (n, 1, 36) with (1, 1, 36) blocks: Mosaic requires the last
        # two block dims to divide (8, 128) or equal the array dims
        out_specs=pl.BlockSpec((1, 1, ORI_NBINS), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, 2, win_y, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH, 2))],
    )
    kern = functools.partial(_ori_kernel, win_y=win_y, w=w, h=h,
                             pad_y=pad_y, pad_x=pad_x)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, ORI_NBINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lp.astype(jnp.int32), lt.astype(jnp.int32), ya.astype(jnp.int32),
      xa.astype(jnp.int32), dx0.astype(jnp.int32),
      xf.astype(jnp.float32), yf.astype(jnp.float32),
      sg.astype(jnp.float32), vl.astype(jnp.int32), field)
    return out.reshape(n, ORI_NBINS)


def ori_hist_fused(bothp, xpos, ypos, lpos, sigma, valid,
                   w: int, h: int, win: int, pad_y: int, pad_x: int):
    """Caller-side coordinate prep for :func:`ori_hist_fused_pallas`.

    bothp : (2L, H+2*pad_y, W+2*pad_x) padded [mag; theta] field with
    pad_x == 256 (grad_pad_dims contract).
    """
    assert bothp.shape[2] >= 256, "fused binning needs a 256-lane slab"
    n_levels = bothp.shape[0] // 2
    rx = jnp.round(xpos).astype(jnp.int32)
    ry = jnp.round(ypos).astype(jnp.int32)
    half = win // 2
    x0 = rx - half + pad_x
    y0 = ry - half + pad_y
    lp = jnp.clip(lpos, 0, n_levels - 1)
    win_y = _win_rows(win)
    Hp, Wp = bothp.shape[1], bothp.shape[2]
    ya = jnp.clip((y0 // 8) * 8, 0, Hp - win_y)
    xa = jnp.clip((x0 // 128) * 128, 0, Wp - 256)
    dx0 = jnp.clip(x0 - xa, 0, 128)

    from .dispatch import kernel_interpret
    return ori_hist_fused_pallas(
        bothp, 2 * lp, 2 * lp + 1, ya, xa, dx0, xpos, ypos, sigma,
        valid.astype(jnp.int32), win, w, h, pad_y, pad_x,
        interpret=kernel_interpret())


# ---------------------------------------------------------------------------
# loop-mode descriptors: fused window + 4x4x8 trilinear binning
# ---------------------------------------------------------------------------

def _desc_kernel(lp_ref, lt_ref, ya_ref, xa_ref, dx_ref, xf_ref, yf_ref,
                 sg_ref, ag_ref, vl_ref, field_ref, out_ref, slabs, sems,
                 *, win_y: int, w: int, h: int, pad_y: int, pad_x: int,
                 magnify: float):
    g = _start_slab_dmas(field_ref, slabs, sems, lp_ref, lt_ref,
                         ya_ref, xa_ref, win_y, vl_ref=vl_ref)

    valid = vl_ref[g]

    @pl.when(valid > 0)
    def _():
        dx = dx_ref[g]
        mw = pltpu.roll(slabs[g % _DEPTH, 0], -dx, 1)[:, :128]
        tw = pltpu.roll(slabs[g % _DEPTH, 1], -dx, 1)[:, :128]

        x = xf_ref[g]
        y = yf_ref[g]
        sig = sg_ref[g]
        ang = ag_ref[g]

        sbp = jnp.abs(magnify * sig)
        ok = sbp > 0.0
        safe_sbp = jnp.where(sbp > 0.0, sbp, 1.0)
        cos_t = jnp.cos(ang)
        sin_t = jnp.sin(ang)

        x0 = xa_ref[g] + dx - pad_x
        y0 = ya_ref[g] - pad_y
        jj = x0 + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 1)
        ii = y0 + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 0)
        dxf = jj.astype(jnp.float32) - x
        dyf = ii.astype(jnp.float32) - y

        # rotated coordinates in SBP units (s_desc_loop.cu:87-90)
        ux = (cos_t * dxf + sin_t * dyf) / safe_sbp
        uy = (cos_t * dyf - sin_t * dxf) / safe_sbp
        ww = jnp.exp(-(ux * ux + uy * uy) / 8.0)

        in_img = (jj >= 1) & (jj <= w - 2) & (ii >= 1) & (ii <= h - 2)
        wgt = jnp.where(in_img & ok, mw * ww, 0.0)

        th = tw - ang
        th = jnp.where(th < 0.0, th + M_PI2, th)
        th = jnp.where(th >= M_PI2, th - M_PI2, th)
        tth = th * M_4RPI
        fo0 = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo0.astype(jnp.float32)
        fo0 = jnp.clip(fo0, 0, 7)
        fo1 = jnp.where(fo0 + 1 == 8, 0, fo0 + 1)

        lo = wgt * (1.0 - do0)
        hi = wgt * do0

        # spatial tile weights: 4 full (win_y, 128) triangle windows per
        # axis, tile centres at -1.5..1.5 (s_desc_loop.cu:57-58).  Kept
        # as separate 2-D windows — a (win_y, 128, 4) tensor puts 4 on
        # the lane axis, which Mosaic pads to 128 lanes (32x VMEM).
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ux - (tx - 1.5)))
               for tx in range(4)]
        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(uy - (ty - 1.5)))
               for ty in range(4)]

        # D[b, ty, tx] = sum_{r,c} wy_ty wx_tx A_b over the window, with
        # A_b = (fo0==b)*lo + (fo1==b)*hi — 128 full-window fused
        # multiply-reduces, entirely in VMEM (static loops over 8 bins x
        # 16 tiles).  The output stays in [b][ty][tx] layout: Mosaic
        # cannot shape-cast (4,4,8)->(128), so scalars land in a
        # (1,8,4,4) block and the [ty][tx][b] reorder happens outside
        # the kernel in XLA.
        for b in range(8):
            a_b = (jnp.where(fo0 == b, lo, 0.0)
                   + jnp.where(fo1 == b, hi, 0.0))
            rows = []
            for ty in range(4):
                m = a_b * wys[ty]
                rows.append(jnp.stack([jnp.sum(m * wxs[tx])
                                       for tx in range(4)]))
            out_ref[0, b] = jnp.stack(rows)  # (4ty, 4tx) vector store

    @pl.when(valid <= 0)
    def _():
        for b in range(8):
            out_ref[0, b] = jnp.zeros((4, 4), jnp.float32)


@functools.partial(jax.jit, static_argnames=("win", "w", "h", "pad_y",
                                             "pad_x", "magnify",
                                             "interpret"))
def desc_loop_fused_pallas(field, lp, lt, ya, xa, dx0, xf, yf, sg, ag, vl,
                           win: int, w: int, h: int, pad_y: int,
                           pad_x: int, magnify: float,
                           interpret: bool = False):
    """(n, 128) unnormalised loop-mode descriptors; one fused kernel."""
    n = lp.shape[0]
    win_y = _win_rows(win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        # (n, 8, 4, 4): per-bin (4, 4) tile matrices — the last two
        # block dims equal the array dims, which Mosaic accepts (a
        # (4,4,8)->(128) in-kernel shape cast does not lower)
        out_specs=pl.BlockSpec((1, 8, 4, 4), lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, 2, win_y, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH, 2))],
    )
    kern = functools.partial(_desc_kernel, win_y=win_y, w=w, h=h,
                             pad_y=pad_y, pad_x=pad_x, magnify=magnify)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, 4, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lp.astype(jnp.int32), lt.astype(jnp.int32), ya.astype(jnp.int32),
      xa.astype(jnp.int32), dx0.astype(jnp.int32),
      xf.astype(jnp.float32), yf.astype(jnp.float32),
      sg.astype(jnp.float32), ag.astype(jnp.float32),
      vl.astype(jnp.int32), field)
    # [b][ty][tx] -> [ty][tx][b] (the reference feature layout,
    # s_desc_loop.cu:29)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(n, 128)


def desc_loop_fused(bothp, xpos, ypos, lpos, sigma, ang, valid,
                    w: int, h: int, win: int, pad_y: int, pad_x: int,
                    magnify: float):
    """Caller-side coordinate prep for :func:`desc_loop_fused_pallas`."""
    assert bothp.shape[2] >= 256, "fused binning needs a 256-lane slab"
    n_levels = bothp.shape[0] // 2
    rx = jnp.round(xpos).astype(jnp.int32)
    ry = jnp.round(ypos).astype(jnp.int32)
    half = win // 2
    x0 = rx - half + pad_x
    y0 = ry - half + pad_y
    lp = jnp.clip(lpos, 0, n_levels - 1)
    win_y = _win_rows(win)
    Hp, Wp = bothp.shape[1], bothp.shape[2]
    ya = jnp.clip((y0 // 8) * 8, 0, Hp - win_y)
    xa = jnp.clip((x0 // 128) * 128, 0, Wp - 256)
    dx0 = jnp.clip(x0 - xa, 0, 128)

    from .dispatch import kernel_interpret
    return desc_loop_fused_pallas(
        bothp, 2 * lp, 2 * lp + 1, ya, xa, dx0, xpos, ypos, sigma, ang,
        valid.astype(jnp.int32), win, w, h, pad_y, pad_x, magnify,
        interpret=kernel_interpret())


# ---------------------------------------------------------------------------
# stack-input variants: gradients computed in-kernel (no dense field)
# ---------------------------------------------------------------------------
#
# The bothp-input kernels above read a precomputed [mag; theta] field —
# two slabs per slot plus a dense full-pyramid gradient pass (+ pad
# copies) in XLA.  These variants do what the reference itself does
# (s_gradiant.h:34-69): DMA ONE (win_y2, 384) slab of the raw blurred
# level, build the five shifted views with cheap rolls, and compute
# dx/dy/hypot/atan2 in VMEM for exactly the window.  The dense gradient
# stage (4.6 ms/image at 1080p) and its HBM pads disappear; slab bytes
# drop ~25% as well.  Only octaves with W >= 384 and H >= win+24 qualify
# (the DMA is unpadded, clamped into the image; masked gates make the
# clamp shift invisible); small octaves keep the bothp path.

def _stack_views(field_ref, lp_ref, ya_ref, xa_ref, dxm_ref,
                 slabs, sems, win_y: int):
    """DMA one raw-level slab and return the 4 gradient-tap views
    (x+1, x-1, y+1, y-1), each (win_y, 128) with
    view[r, k] = level[ya+1+r (+/-1), ox+1+k (+/-1)].

    Row offsets are STATIC slices from the 8-aligned DMA origin (the
    extra processed rows absorb the 0..7 alignment loss AND the
    slab-end clamp via the coordinate masks: the processed window is
    the whole slab minus a 1-row halo each side, so the end-clamped
    origin still reaches row H-2); column offsets are one dynamic lane
    roll per view straight off the slab.  Mosaic miscompiles CHAINED
    dynamic rolls (a second pltpu.roll of an already-rolled vector
    returns garbage on hardware — verified by a standalone probe;
    single rolls are exact), so no view ever rolls twice."""
    g = pl.program_id(0)
    n = pl.num_programs(0)
    rows = win_y + 2    # the 1-row gradient halo each side

    def mk(i, slot):
        return pltpu.make_async_copy(
            field_ref.at[lp_ref[i],
                         pl.ds(pl.multiple_of(ya_ref[i], 8), rows),
                         pl.ds(pl.multiple_of(xa_ref[i], 128), 384)],
            slabs.at[slot],
            sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        for j in range(min(_DEPTH - 1, n)):
            mk(j, j % _DEPTH).start()

    @pl.when(g + _DEPTH - 1 < n)
    def _():
        mk(g + _DEPTH - 1, (g + _DEPTH - 1) % _DEPTH).start()

    mk(g, g % _DEPTH).wait()

    dxm = dxm_ref[g]

    def view(dr, dc):
        # row offset applied at the REF READ (static sublane-offset
        # load).  The lane shift s = dxm+dc is in [0, 129] — beyond one
        # 128-lane tile — and Mosaic's dynamic roll is only exact on
        # <=2-tile (256-lane) vectors (a 384-lane roll returns garbage
        # on hardware; verified by a standalone probe).  So: roll each
        # 256-lane half once and select (every needed 128-lane window
        # fits one half: s<=128 -> lanes [s, s+128) of [0, 256);
        # s>128 -> of [128, 384)).
        part = slabs[g % _DEPTH, dr:dr + win_y, :]
        s = dxm + dc
        lo = pltpu.roll(part[:, :256], -s, 1)[:, :128]
        hi = pltpu.roll(part[:, 128:384], -(s - 128), 1)[:, :128]
        return jnp.where(s <= 128, lo, hi)

    xp = view(1, 2)
    xm = view(1, 0)
    yp = view(2, 1)
    ym = view(0, 1)
    return xp, xm, yp, ym, g


def _atan2_poly(y, x):
    """Vectorised float32 atan2 (Mosaic has no atan2/atan lowering).

    Cephes-style atanf: octant range reduction at tan(pi/8)/tan(3pi/8)
    + a degree-9 odd minimax polynomial; max error ~2e-7 rad — below
    the float32 noise floor of the XLA atan2 it replaces, and far below
    the 36-bin (0.17 rad) / 8-bin (0.79 rad) binning granularity
    downstream.  atan2(0, 0) = 0 like the libm the reference relies
    on."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    both0 = (ax == 0.0) & (ay == 0.0)
    q = ay / jnp.where(both0, 1.0, ax)          # [0, inf)

    big = q > 2.414213562373095                 # tan(3pi/8)
    mid = q > 0.4142135623730951                # tan(pi/8)
    xr = jnp.where(big, -1.0 / jnp.where(q == 0.0, 1.0, q),
                   jnp.where(mid, (q - 1.0) / (q + 1.0), q))
    base = jnp.where(big, math.pi / 2,
                     jnp.where(mid, math.pi / 4, 0.0))
    z = xr * xr
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr)
    t = base + p                                # atan(q) in [0, pi/2]

    ang = jnp.where(x >= 0.0, t, math.pi - t)   # fold x sign
    ang = jnp.where(y >= 0.0, ang, -ang)        # fold y sign
    return jnp.where(both0, 0.0, ang)


def _grad_inkernel(xp, xm, yp, ym):
    """Central differences + hypot/atan2 (s_gradiant.h:55-69)."""
    dx = xp - xm
    dy = yp - ym
    mw = jnp.sqrt(dx * dx + dy * dy)
    tw = _atan2_poly(dy, dx)
    return mw, tw


def _ori_stack_kernel(lp_ref, ya_ref, xa_ref, dxm_ref, oxf_ref,
                      oyf_ref, xf_ref, yf_ref, sg_ref, vl_ref, field_ref,
                      out_ref, slabs, sems,
                      *, win_y: int, w: int, h: int):
    xp, xm, yp, ym, g = _stack_views(field_ref, lp_ref, ya_ref, xa_ref,
                                     dxm_ref, slabs, sems, win_y)
    mw, tw = _grad_inkernel(xp, xm, yp, ym)

    x = xf_ref[g]
    y = yf_ref[g]
    sigma = sg_ref[g]
    valid = vl_ref[g]
    rx = jnp.round(x).astype(jnp.int32)
    ry = jnp.round(y).astype(jnp.int32)
    rad = jnp.round(3.0 * (ORI_WINFACTOR * sigma)).astype(jnp.int32)

    jj = oxf_ref[g] + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 1)
    ii = oyf_ref[g] + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 0)

    xmin = jnp.maximum(1, rx - rad)
    xmax = jnp.minimum(w - 2, rx + rad)
    ymin = jnp.maximum(1, ry - rad)
    ymax = jnp.minimum(h - 2, ry + rad)
    in_xy = (jj >= xmin) & (jj <= xmax) & (ii >= ymin) & (ii <= ymax)

    dxf = jj.astype(jnp.float32) - x
    dyf = ii.astype(jnp.float32) - y
    sq = (dxf * dxf + dyf * dyf).astype(jnp.int32)
    sigw = ORI_WINFACTOR * sigma
    factor = -0.5 / (sigw * sigw)
    inside = (sq <= rad * rad) & in_xy & (valid > 0)

    weight = jnp.where(
        inside, mw * jnp.exp(sq.astype(jnp.float32) * factor), 0.0)

    bidx = jnp.round(ORI_NBINS * (tw + math.pi) / M_PI2).astype(jnp.int32)
    bidx = jnp.where(bidx == ORI_NBINS, 0, bidx)

    cols = [jnp.sum(jnp.where(bidx == b, weight, 0.0))
            for b in range(ORI_NBINS)]
    out_ref[0, 0, :] = jnp.stack(cols)


def _desc_stack_kernel(lp_ref, ya_ref, xa_ref, dxm_ref, oxf_ref,
                       oyf_ref, xf_ref, yf_ref, sg_ref, ag_ref, vl_ref,
                       field_ref, out_ref, slabs, sems,
                       *, win_y: int, w: int, h: int, magnify: float):
    xp, xm, yp, ym, g = _stack_views(field_ref, lp_ref, ya_ref, xa_ref,
                                     dxm_ref, slabs, sems, win_y)
    mw, tw = _grad_inkernel(xp, xm, yp, ym)

    x = xf_ref[g]
    y = yf_ref[g]
    sig = sg_ref[g]
    ang = ag_ref[g]
    valid = vl_ref[g]

    sbp = jnp.abs(magnify * sig)
    ok = (valid > 0) & (sbp > 0.0)
    safe_sbp = jnp.where(sbp > 0.0, sbp, 1.0)
    cos_t = jnp.cos(ang)
    sin_t = jnp.sin(ang)

    jj = oxf_ref[g] + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 1)
    ii = oyf_ref[g] + jax.lax.broadcasted_iota(jnp.int32, (win_y, 128), 0)
    dxf = jj.astype(jnp.float32) - x
    dyf = ii.astype(jnp.float32) - y

    ux = (cos_t * dxf + sin_t * dyf) / safe_sbp
    uy = (cos_t * dyf - sin_t * dxf) / safe_sbp
    ww = jnp.exp(-(ux * ux + uy * uy) / 8.0)

    in_img = (jj >= 1) & (jj <= w - 2) & (ii >= 1) & (ii <= h - 2)
    wgt = jnp.where(in_img & ok, mw * ww, 0.0)

    # de-rotate and wrap to [0, 2pi) — same math as _desc_kernel (tw is
    # raw atan2 in (-pi, pi], so th - ang is in (-2pi, 2pi): one wrap
    # each way suffices)
    th = tw - ang
    th = jnp.where(th < 0.0, th + M_PI2, th)
    th = jnp.where(th >= M_PI2, th - M_PI2, th)
    tth = th * M_4RPI
    fo0 = jnp.floor(tth).astype(jnp.int32)
    do0 = tth - fo0.astype(jnp.float32)
    fo0 = jnp.clip(fo0, 0, 7)
    fo1 = jnp.where(fo0 + 1 == 8, 0, fo0 + 1)

    lo = wgt * (1.0 - do0)
    hi = wgt * do0

    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ux - (tx - 1.5)))
           for tx in range(4)]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(uy - (ty - 1.5)))
           for ty in range(4)]

    for b in range(8):
        a_b = jnp.where(fo0 == b, lo, 0.0) + jnp.where(fo1 == b, hi, 0.0)
        rows = []
        for ty in range(4):
            m = a_b * wys[ty]
            rows.append(jnp.stack([jnp.sum(m * wxs[tx])
                                   for tx in range(4)]))
        out_ref[0, b] = jnp.stack(rows)


def _stack_origins(stack, lpos, xpos, ypos, win: int):
    """Per-slot clamped slab origins for the stack kernels.

    Returns (lp, ya, xa, dxm, dym, ox, oy) with the window's pixel
    mapping view[r, k] = level[oy+1+r, ox+1+k]; every gated pixel
    (within the image interior around the keypoint) is inside the
    window because clamping only moves the origin when the keypoint is
    within win/2 of a border, and then the 128/win_y extent still covers
    the in-image half (see module comment)."""
    L, H, W = stack.shape
    S = _win_rows(win) + 16      # slab rows (8-aligned alloc + fetch)
    rx = jnp.round(xpos).astype(jnp.int32)
    ry = jnp.round(ypos).astype(jnp.int32)
    half = win // 2
    ox = jnp.clip(rx - half - 1, 0, W - 130)
    oy = jnp.clip(ry - half - 1, 0, H - (win + 2))
    lp = jnp.clip(lpos, 0, L - 1)
    xa = jnp.clip((ox // 128) * 128, 0, W - 384)
    ya = jnp.clip((oy // 8) * 8, 0, H - S)
    return (lp, ya, xa, ox - xa, ox + 1, ya + 1)


def stack_kernel_ok(stack_shape, win: int) -> bool:
    """Gate for the stack-input (in-kernel gradient) kernels.

    EXPERIMENTAL, off by default (POPSIFT_TPU_STACK_KERNELS=1 enables):
    interpret-mode parity holds, but on hardware the variant still
    differs from the field path after working around two verified
    Mosaic miscompiles (chained dynamic rolls; dynamic rolls on 3-tile
    vectors), and the measured per-stage times (ori 2.7 vs 2.0 ms,
    desc 5.3 vs 4.0 ms per 1536 slots) mean the net win over the field
    path — eliminating the dense-gradient stage — is ~1-3 ms/image,
    not worth shipping at reduced parity confidence.  The field-input
    fused kernels above remain the production path."""
    import os
    if os.environ.get("POPSIFT_TPU_STACK_KERNELS", "") in ("", "0"):
        return False
    L, H, W = stack_shape
    return W >= 384 and H >= _win_rows(win) + 16 and win <= 112


@functools.partial(jax.jit, static_argnames=("win", "w", "h", "interpret"))
def ori_hist_stack_pallas(stack, lp, ya, xa, dxm, ox1, oy1, xf, yf,
                          sg, vl, win: int, w: int, h: int,
                          interpret: bool = False):
    n = lp.shape[0]
    # processed rows = slab minus the 1-row halo each side; the slab
    # (8-aligned, _win_rows+16) absorbs alignment loss + end clamp
    win_y = _win_rows(win) + 14
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1, ORI_NBINS), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, win_y + 2, 384), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,))],
    )
    kern = functools.partial(_ori_stack_kernel, win_y=win_y, w=w, h=h)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, ORI_NBINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lp.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      dxm.astype(jnp.int32),
      ox1.astype(jnp.int32), oy1.astype(jnp.int32),
      xf.astype(jnp.float32), yf.astype(jnp.float32),
      sg.astype(jnp.float32), vl.astype(jnp.int32), stack)
    return out.reshape(n, ORI_NBINS)


def ori_hist_stack(stack, xpos, ypos, lpos, sigma, valid,
                   w: int, h: int, win: int):
    """Orientation histograms from the raw blurred stack (in-kernel
    gradients); caller must check :func:`stack_kernel_ok`."""
    lp, ya, xa, dxm, ox1, oy1 = _stack_origins(
        stack, lpos, xpos, ypos, win)
    from .dispatch import kernel_interpret
    return ori_hist_stack_pallas(
        stack, lp, ya, xa, dxm, ox1, oy1, xpos, ypos, sigma,
        valid.astype(jnp.int32), win, w, h,
        interpret=kernel_interpret())


@functools.partial(jax.jit, static_argnames=("win", "w", "h", "magnify",
                                             "interpret"))
def desc_loop_stack_pallas(stack, lp, ya, xa, dxm, ox1, oy1, xf, yf,
                           sg, ag, vl, win: int, w: int, h: int,
                           magnify: float, interpret: bool = False):
    n = lp.shape[0]
    # processed rows = slab minus the 1-row halo each side (see
    # ori_hist_stack_pallas)
    win_y = _win_rows(win) + 14
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, 4, 4), lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, win_y + 2, 384), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,))],
    )
    kern = functools.partial(_desc_stack_kernel, win_y=win_y, w=w, h=h,
                             magnify=magnify)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, 4, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lp.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      dxm.astype(jnp.int32),
      ox1.astype(jnp.int32), oy1.astype(jnp.int32),
      xf.astype(jnp.float32), yf.astype(jnp.float32),
      sg.astype(jnp.float32), ag.astype(jnp.float32),
      vl.astype(jnp.int32), stack)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(n, 128)


def desc_loop_stack(stack, xpos, ypos, lpos, sigma, ang, valid,
                    w: int, h: int, win: int, magnify: float):
    """Loop-mode descriptors from the raw blurred stack (in-kernel
    gradients); caller must check :func:`stack_kernel_ok`."""
    lp, ya, xa, dxm, ox1, oy1 = _stack_origins(
        stack, lpos, xpos, ypos, win)
    from .dispatch import kernel_interpret
    return desc_loop_stack_pallas(
        stack, lp, ya, xa, dxm, ox1, oy1, xpos, ypos, sigma, ang,
        valid.astype(jnp.int32), win, w, h, magnify,
        interpret=kernel_interpret())
