"""SIFT descriptor extraction, TPU-native.

The reference ships five CUDA descriptor kernels
(/root/reference/src/popsift/s_desc_{loop,iloop,grid,igrid,notile}.cu).
They fall into two numerical families:

* **loop family** (loop, iloop): scan the axis-aligned bounding box of the
  rotated descriptor window, gradient at integer pixels, trilinear
  (2 spatial x 1 angular) binning (s_desc_loop.cu:18-139).
  TPU form: one fixed-size window per (keypoint, orientation), dense
  rotated-coordinate arithmetic, and the 4x4x8 binning expressed as two
  small matrix contractions (MXU-friendly).

* **grid family** (grid, igrid, notile): sample a fixed rotated 40x40 grid,
  precomputed Gaussian window + triangle tile weights
  (s_desc_notile.cu:31-129, sift_constants.cu:34-47), rotated-derivative
  gradient at fractional positions.  TPU form: 1600 bilinear samples per
  descriptor + static (40,4) tile-weight matrices.

The per-mode sampling differences:
  - loop -> axis-aligned integer-pixel scan (:func:`loop_descriptors`),
  - iloop -> axis-aligned scan of a fixed 32x32 normalized grid per tile
    with rotated-derivative gradients (s_desc_iloop.cu:60-112;
    :func:`iloop_descriptors`),
  - notile/igrid -> rotated 40x40 grid with bilinear sampling
    (:func:`grid_descriptors`),
  - grid -> rotated grid with samples rounded to pixel centres,
    recomputed weights and axis-aligned gradients (s_desc_grid.cu:60-103;
    :func:`grid_rounded_descriptors`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DESC_MAGNIFY, M_PI2, M_4RPI
from .orientation import max_sigma


_FORCE_REDUCE_BINNING = False  # test hook


def _use_reduce_binning() -> bool:
    # Measured on v5e: under vmap the "fused reduce" formulation
    # materialises (chunk, win_y, win_x) planes per pass (128 passes!) and
    # loses to the matmul form at any chunk size; keep matmul everywhere.
    return _FORCE_REDUCE_BINNING


def desc_window_size(sigma0: float, levels: int) -> int:
    """Static loop-family window: covers |d|_inf < 2.5*sqrt(2)*SBP_max."""
    sbp_max = DESC_MAGNIFY * max_sigma(sigma0, levels)
    win = int(math.ceil(2.0 * 2.5 * math.sqrt(2.0) * sbp_max)) + 4
    return (win + 7) // 8 * 8


def _tile_offsets() -> np.ndarray:
    # tile centres at ix - 1.5 for ix in 0..3 (s_desc_loop.cu:57-58)
    return np.arange(4, dtype=np.float32) - 1.5


def loop_descriptors(both: jnp.ndarray, pad_y: int, pad_x: int,
                     xpos, ypos, lpos, sigma, ang, valid,
                     w: int, h: int, win: int,
                     chunk: int = 64, stack=None) -> jnp.ndarray:
    """Loop-mode descriptors for a batch of (keypoint, orientation) slots.

    both : (2L, H+2*pad_y, W+2*pad_x) padded [mag; theta] field of the
    octave (ops.gradients.padded_gradient_field) — shared with the
    orientation stage so the pad+concat copy happens once.
    Returns (cap, 128) unnormalised descriptors in [ty, tx, bin] order
    (matching the reference's ``tile = ((iy*4+ix)*8)`` layout,
    s_desc_loop.cu:29).
    """
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and win <= 120:
        # ONE fused Pallas kernel: window DMA + trilinear 4x4x8 binning
        # in VMEM (kernels/binwin.py — the shape of the reference's
        # s_desc_loop.cu:18-139, which also reads and bins in one
        # kernel).  With the raw blurred ``stack`` supplied and a big
        # enough octave, gradients are computed in-kernel too
        # (s_gradiant.h:55-69) and the dense field feeding ``both``
        # dead-code-eliminates.  The XLA chunked form below is the
        # numerically-identical fallback.
        from ..kernels.binwin import (desc_loop_fused, desc_loop_stack,
                                      stack_kernel_ok)
        if stack is not None and stack_kernel_ok(stack.shape, win):
            return desc_loop_stack(stack, xpos, ypos, lpos, sigma, ang,
                                   valid, w, h, win,
                                   magnify=DESC_MAGNIFY)
        from ..kernels.binwin import _win_rows
        if both.shape[2] >= 256 and both.shape[1] >= _win_rows(win):
            return desc_loop_fused(both, xpos, ypos, lpos, sigma, ang,
                                   valid, w, h, win, pad_y, pad_x,
                                   magnify=DESC_MAGNIFY)

    if pad_y == 0 and pad_x == 0:
        # XLA gather fallback needs real pads (unclamped DMA origins);
        # re-pad the unpadded TPU field on demand (rare programs only)
        from ..kernels.windows import aligned_window_dims
        pad_y, pad_x = aligned_window_dims(win)
        both = jnp.pad(both, ((0, 0), (pad_y, pad_y), (pad_x, pad_x)))

    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, win_x = rolled_window_dims(win)
    L = both.shape[0] // 2
    offs = jnp.asarray(_tile_offsets())

    def one_slot(mw, tw, x, y, x0, y0, sig, a, vld):
        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        safe_sbp = jnp.where(sbp > 0.0, sbp, 1.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)

        jj = x0 + jnp.arange(win_x, dtype=jnp.int32)
        ii = y0 + jnp.arange(win_y, dtype=jnp.int32)
        dxf = jj.astype(jnp.float32)[None, :] - x       # (win, win) via bc
        dyf = ii.astype(jnp.float32)[:, None] - y

        # rotated coordinates in SBP units (s_desc_loop.cu:87-90)
        ux = (cos_t * dxf + sin_t * dyf) / safe_sbp
        uy = (cos_t * dyf - sin_t * dxf) / safe_sbp

        ww = jnp.exp(-(ux * ux + uy * uy) / 8.0)

        in_img = ((jj >= 1) & (jj <= w - 2))[None, :] \
            & ((ii >= 1) & (ii <= h - 2))[:, None]
        wgt = jnp.where(in_img & ok, mw * ww, 0.0)

        th = tw - a
        th = jnp.where(th < 0.0, th + M_PI2, th)
        th = jnp.where(th >= M_PI2, th - M_PI2, th)
        tth = th * M_4RPI
        fo0 = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo0.astype(jnp.float32)
        fo0 = jnp.clip(fo0, 0, 7)
        fo1 = (fo0 + 1) % 8

        # angular bilinear (cap of 8 bins, dpt[8] folded into dpt[0],
        # s_desc_loop.cu:114-124)
        lo = wgt * (1.0 - do0)
        hi = wgt * do0
        if _use_reduce_binning():
            # per-tile trilinear binning as fused multiply-reduces — on
            # TPU a matmul formulation materialises (p, 32) operands per
            # slot and turns the stage HBM-bound
            rows = []
            for ty in range(4):
                wy_t = jnp.maximum(0.0, 1.0 - jnp.abs(uy - (ty - 1.5)))
                for tx in range(4):
                    wx_t = jnp.maximum(0.0,
                                       1.0 - jnp.abs(ux - (tx - 1.5)))
                    wt = wy_t * wx_t
                    wlo = wt * lo
                    whi = wt * hi
                    cols = [
                        jnp.sum(jnp.where(fo0 == b, wlo, 0.0)
                                + jnp.where(fo1 == b, whi, 0.0))
                        for b in range(8)
                    ]
                    rows.append(jnp.stack(cols))
            return jnp.concatenate(rows)

        # matmul formulation (fast to compile; used off-TPU)
        bins = jnp.arange(8, dtype=jnp.int32)
        a_oh = ((fo0[..., None] == bins) * lo[..., None]
                + (fo1[..., None] == bins) * hi[..., None])
        p = win_y * win_x
        A = a_oh.reshape(p, 8)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[..., None] - offs))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[..., None] - offs))
        wx = wx.reshape(p, 4)
        wy = wy.reshape(p, 4)
        E = (wx[:, :, None] * A[:, None, :]).reshape(p, 32)
        D = jnp.einsum("pt,pq->tq", wy, E,
                       preferred_element_type=jnp.float32)
        return D.reshape(128)

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        n = x.shape[0]
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        # one batched window DMA fetches mag and theta windows together;
        # columns start exactly at x0 (in-kernel lane roll)
        lp2 = jnp.concatenate([2 * lp, 2 * lp + 1])   # interleaved field
        wins, ya = gather_windows_exact(
            both, lp2, jnp.tile(y0 + pad_y, 2), jnp.tile(x0 + pad_x, 2),
            win)
        mw, tw = wins[:n], wins[n:]
        y0 = ya[:n] - pad_y
        return jax.vmap(one_slot)(mw, tw, x, y, x0, y0, sig, a, vld)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def desc_required_win(sigma: jnp.ndarray) -> jnp.ndarray:
    """Per-slot loop-mode window each (keypoint, orientation) actually
    needs: the axis-aligned cover of the rotated 4x4-tile support
    (|u|_inf < 2.5 in SBP units; same formula as
    :func:`desc_window_size`, per slot)."""
    sbp = jnp.abs(DESC_MAGNIFY * sigma)
    return jnp.ceil(2.0 * 2.5 * math.sqrt(2.0) * sbp) + 4.0


def loop_descriptors_classed(both: jnp.ndarray, pad_y: int, pad_x: int,
                             xpos, ypos, lpos, sigma, ang, valid,
                             w: int, h: int,
                             classes: list[tuple[int, int]],
                             chunk: int = 64, stack=None):
    """:func:`loop_descriptors` with sigma-classed window sizes.

    ``classes``: [(win, size), ...] in DESCENDING window order with sizes
    summing to the slot capacity.  Slots are sorted by required window
    (descending); slots whose requirement exceeds their region's window
    are counted in the returned ``violations`` scalar — the caller must
    then discard the result and re-run the max-window path.  With zero
    violations the result is EXACTLY the max-window result (the window
    only carries masked/zero-weight pixels beyond each slot's rotated
    support).

    Returns (descriptors (cap, 128), violations).
    """
    cap = xpos.shape[0]
    assert sum(s for _, s in classes) == cap

    req = jnp.where(valid, desc_required_win(sigma), 0.0)
    order = jnp.argsort(-req)
    xs, ys, ls, ss, as_, vs = (jnp.take(a, order, axis=0)
                               for a in (xpos, ypos, lpos, sigma, ang,
                                         valid))
    req_s = jnp.take(req, order, axis=0)

    outs = []
    viol = jnp.int32(0)
    start = 0
    for win_r, size_r in classes:
        sl = slice(start, start + size_r)
        if size_r:
            outs.append(loop_descriptors(
                both, pad_y, pad_x, xs[sl], ys[sl], ls[sl], ss[sl],
                as_[sl], vs[sl], w, h, win_r, chunk=chunk, stack=stack))
            viol = viol + jnp.sum(
                (req_s[sl] > win_r).astype(jnp.int32))
        start += size_r
    out_sorted = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    out = jnp.zeros_like(out_sorted).at[order].set(out_sorted)
    return out, viol


# ---------------------------------------------------------------------------
# grid family (notile / igrid / grid)
# ---------------------------------------------------------------------------

def _grid_steps() -> np.ndarray:
    """40 sample offsets: stepbase + k/8, stepbase = -2.5 + 1/16
    (s_desc_notile.cu:29,57-58)."""
    return (-2.5 + 1.0 / 16.0
            + np.arange(40, dtype=np.float32) / 8.0)


def _tile_weight_matrix(desc_tile: np.ndarray) -> np.ndarray:
    """Static (40, 4) matrix: TX[k, t] = desc_tile[k - 8t] when
    0 <= k - 8t < 16 (s_desc_notile.cu:55)."""
    TX = np.zeros((40, 4), dtype=np.float32)
    for t in range(4):
        for k in range(16):
            TX[8 * t + k, t] = desc_tile[k]
    return TX


def _bilinear(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Bilinear sample with clamp addressing (the CUDA linear texture;
    readTex's +0.5 offset cancels the texel-centre convention so continuous
    coordinates are in pixel space, common/assist.h:68-83).

    The COORDINATE is clamped to the image (like the texture hardware):
    a sample 2+ pixels outside the border reads the pure edge value —
    clamping the tap indices instead would blend the two edgemost pixels
    by the out-of-range fraction, which no texture unit does."""
    h, w = img.shape
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = px - x0f
    fy = py - y0f
    x0 = x0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y0 = y0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def grid_descriptors(stack: jnp.ndarray,
                     xpos, ypos, lpos, sigma, ang, valid,
                     desc_gauss: np.ndarray, desc_tile: np.ndarray,
                     rounded: bool = False,
                     chunk: int = 64) -> jnp.ndarray:
    """NoTile/IGrid-mode descriptors (s_desc_notile.cu:31-129): rotated
    40x40 sample grid, bilinear gradient sampling, precomputed Gaussian
    window + triangle tile weights.

    stack : (L, H, W) blurred levels of the octave.
    Returns (cap, 128).
    """
    L, h, w = stack.shape
    steps = jnp.asarray(_grid_steps())
    TX = jnp.asarray(_tile_weight_matrix(np.asarray(desc_tile)))
    G = jnp.asarray(desc_gauss)  # (40, 40) [y][x]

    def one_slot(x, y, l, sig, a, vld):
        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)
        lp = jnp.clip(l, 0, L - 1)
        img = jax.lax.dynamic_index_in_dim(stack, lp, axis=0,
                                           keepdims=False)

        sx = steps[None, :]  # newx axis
        sy = steps[:, None]  # newy axis
        ptx = cos_t * sx - sin_t * sy        # (40,40)
        pty = cos_t * sy + sin_t * sx
        px = x + ptx * sbp
        py = y + pty * sbp
        if rounded:
            px = jnp.round(px)
            py = jnp.round(py)

        # rotated-derivative gradient (s_gradiant.h:71-87)
        dx = _bilinear(img, px + cos_t, py + sin_t) \
            - _bilinear(img, px - cos_t, py - sin_t)
        dy = _bilinear(img, px - sin_t, py + cos_t) \
            - _bilinear(img, px + sin_t, py - cos_t)
        mod = jnp.hypot(dx, dy)
        th = jnp.arctan2(dy, dx)
        th = jnp.where(th < 0.0, th + M_PI2, th)

        tth = th * M_4RPI
        fo = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo.astype(jnp.float32)
        fo0 = fo & 7
        fo1 = (fo0 + 1) & 7

        ww = jnp.where(ok, G * mod, 0.0)
        bins = jnp.arange(8, dtype=jnp.int32)
        A = ((fo0[..., None] == bins) * ((1.0 - do0) * ww)[..., None]
             + (fo1[..., None] == bins) * (do0 * ww)[..., None])
        # A: (40y, 40x, 8) ; contract x then y with the static tile matrix
        B = jnp.einsum("yxb,xt->ytb", A, TX,
                       preferred_element_type=jnp.float32)   # (40,4,8)
        D = jnp.einsum("ytb,ys->stb", B, TX,
                       preferred_element_type=jnp.float32)   # (4ty,4tx,8)
        return D.reshape(128)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda c: jax.vmap(one_slot)(*c), args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def _bilinear_win(wflat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                  win_y: int, xlo, xhi, ylo, yhi):
    """Bilinear sample inside one flattened (win_y, 128) window.

    Window-local coordinates.  Texture clamp addressing is applied per
    tap by clamping the coordinate to the image bounds expressed in
    window-local terms (xlo..xhi / ylo..yhi, per-slot scalars); the
    edge-padded window content supplies the <=1px bilinear overhang at
    the far edge.  Clamped coordinates always land inside the window
    (clamping only moves a sample toward the keypoint, never further
    out); the index clips are an out-of-contract backstop."""
    px = jnp.clip(px, xlo, xhi)
    py = jnp.clip(py, ylo, yhi)
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = px - x0f
    fy = py - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, 126)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, win_y - 2)
    base = y0 * 128 + x0
    v00 = jnp.take(wflat, base)
    v01 = jnp.take(wflat, base + 1)
    v10 = jnp.take(wflat, base + 128)
    v11 = jnp.take(wflat, base + 129)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def grid_descriptors_windowed(stackp: jnp.ndarray, pad_y: int, pad_x: int,
                              xpos, ypos, lpos, sigma, ang, valid,
                              w: int, h: int, win: int,
                              desc_gauss: np.ndarray, desc_tile: np.ndarray,
                              rounded: bool = False,
                              chunk: int = 64) -> jnp.ndarray:
    """NoTile/IGrid descriptors via batched window DMA — the TPU path.

    Same math as :func:`grid_descriptors`, but each slot's rotated 40x40
    sampling grid reads a per-slot (win_y, 128) window fetched by the
    rolled-window DMA kernel instead of gathering from the whole octave
    plane (whole-plane gathers per slot are the reference GPU's texture
    strength and the TPU's weakest lowering).

    stackp : (L, H+2*pad_y, W+2*pad_x) EDGE-padded blurred stack — edge
    replication reproduces the CUDA texture's clamp addressing
    (s_desc_notile.cu samples through readTex clamp) for coordinates up
    to ``pad`` beyond the image.
    """
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    steps = jnp.asarray(_grid_steps())
    TX = jnp.asarray(_tile_weight_matrix(np.asarray(desc_tile)))
    G = jnp.asarray(desc_gauss)
    bins = jnp.arange(8, dtype=jnp.int32)

    def one_slot(wimg, x, y, x0f, y0f, sig, a, vld):
        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)
        wflat = wimg.reshape(-1)

        sx = steps[None, :]
        sy = steps[:, None]
        ptx = cos_t * sx - sin_t * sy
        pty = cos_t * sy + sin_t * sx
        px = x + ptx * sbp
        py = y + pty * sbp
        if rounded:
            px = jnp.round(px)
            py = jnp.round(py)
        pxr = px - x0f
        pyr = py - y0f

        # image bounds in window-local coordinates (per-tap clamp inside
        # _bilinear_win = the texture's clamp addressing)
        xlo, xhi = 0.0 - x0f, (w - 1.0) - x0f
        ylo, yhi = 0.0 - y0f, (h - 1.0) - y0f

        def bw(ppx, ppy):
            return _bilinear_win(wflat, ppx, ppy, win_y, xlo, xhi,
                                 ylo, yhi)

        dx = bw(pxr + cos_t, pyr + sin_t) - bw(pxr - cos_t, pyr - sin_t)
        dy = bw(pxr - sin_t, pyr + cos_t) - bw(pxr + sin_t, pyr - cos_t)
        mod = jnp.hypot(dx, dy)
        th = jnp.arctan2(dy, dx)
        th = jnp.where(th < 0.0, th + M_PI2, th)

        tth = th * M_4RPI
        fo = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo.astype(jnp.float32)
        fo0 = fo & 7
        fo1 = (fo0 + 1) & 7

        ww = jnp.where(ok, G * mod, 0.0)
        A = ((fo0[..., None] == bins) * ((1.0 - do0) * ww)[..., None]
             + (fo1[..., None] == bins) * (do0 * ww)[..., None])
        B = jnp.einsum("yxb,xt->ytb", A, TX,
                       preferred_element_type=jnp.float32)
        D = jnp.einsum("ytb,ys->stb", B, TX,
                       preferred_element_type=jnp.float32)
        return D.reshape(128)

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)
        y0a = ya - pad_y
        return jax.vmap(one_slot)(
            wins, x, y, x0.astype(jnp.float32), y0a.astype(jnp.float32),
            sig, a, vld)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def grid_descriptors_windowed_mm(stackp: jnp.ndarray,
                                 pad_y: int, pad_x: int,
                                 xpos, ypos, lpos, sigma, ang, valid,
                                 w: int, h: int, win: int,
                                 desc_gauss: np.ndarray,
                                 desc_tile: np.ndarray,
                                 rounded: bool = False,
                                 chunk: int = 32) -> jnp.ndarray:
    """NoTile/IGrid descriptors with MXU-contracted bilinear sampling —
    the TPU speed path (round-4 VERDICT task 2).

    Same numerics as :func:`grid_descriptors_windowed` (the rotated 40x40
    grid of s_desc_notile.cu:31-129 over the same DMA'd windows), but the
    per-sample bilinear reads are reformulated as separable triangle
    contractions instead of gathers: the bilinear weight of window pixel
    (r, c) for sample s factorises as tri(r - py_s) * tri(c - px_s) with
    tri(t) = max(0, 1 - |t|), so

        sample_s = sum_r triY[r, s] * (W @ triX)[r, s]

    — one (win_y, 128) x (128, S) matmul per slot per gradient-offset
    variant (the MXU's native shape) plus an elementwise reduce, instead
    of 4 taps x S serialised gather lanes.  ``jnp.take``-based sampling
    is the only XLA lowering difference; every weight and gate matches
    the gather form to float rounding (tests/test_desc_modes.py pins
    mm-vs-gather agreement).

    The matmuls run at Precision.HIGHEST: the gradient is a difference
    of near-equal samples, so the 3-pass bf16 default would surface as
    relative error in ``mod``/``th`` beyond float32 noise.
    """
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    steps = jnp.asarray(_grid_steps())
    TX = jnp.asarray(_tile_weight_matrix(np.asarray(desc_tile)))
    G = jnp.asarray(desc_gauss)
    bins = jnp.arange(8, dtype=jnp.int32)
    hp = jax.lax.Precision.HIGHEST

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)
        x0f = x0.astype(jnp.float32)
        y0f = (ya - pad_y).astype(jnp.float32)

        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)

        sx = steps[None, None, :]                     # (1, 1, 40x)
        sy = steps[None, :, None]                     # (1, 40y, 1)
        ct = cos_t[:, None, None]
        st = sin_t[:, None, None]
        px = x[:, None, None] + (ct * sx - st * sy) * sbp[:, None, None]
        py = y[:, None, None] + (ct * sy + st * sx) * sbp[:, None, None]
        if rounded:
            px = jnp.round(px)
            py = jnp.round(py)
        pxr = (px - x0f[:, None, None]).reshape(px.shape[0], -1)
        pyr = (py - y0f[:, None, None]).reshape(py.shape[0], -1)

        # image bounds in window-local coordinates (texture clamp
        # addressing); the [0, 127] / [0, win_y-1] clip is the same
        # out-of-contract backstop as _bilinear_win's index clips
        xlo, xhi = 0.0 - x0f, (w - 1.0) - x0f
        ylo, yhi = 0.0 - y0f, (h - 1.0) - y0f

        cc = jnp.arange(128, dtype=jnp.float32)
        rr = jnp.arange(win_y, dtype=jnp.float32)

        def sample(dcx, dcy):
            ppx = jnp.clip(jnp.clip(pxr + dcx[:, None],
                                    xlo[:, None], xhi[:, None]),
                           0.0, 127.0)
            ppy = jnp.clip(jnp.clip(pyr + dcy[:, None],
                                    ylo[:, None], yhi[:, None]),
                           0.0, win_y - 1.0)
            triX = jnp.maximum(
                0.0, 1.0 - jnp.abs(cc[None, :, None] - ppx[:, None, :]))
            triY = jnp.maximum(
                0.0, 1.0 - jnp.abs(rr[None, :, None] - ppy[:, None, :]))
            m1 = jnp.einsum("nrc,ncs->nrs", wins, triX, precision=hp)
            return jnp.sum(m1 * triY, axis=1)          # (n, 1600)

        dx = sample(cos_t, sin_t) - sample(-cos_t, -sin_t)
        dy = sample(-sin_t, cos_t) - sample(sin_t, -cos_t)
        mod = jnp.hypot(dx, dy).reshape(-1, 40, 40)
        th = jnp.arctan2(dy, dx).reshape(-1, 40, 40)
        th = jnp.where(th < 0.0, th + M_PI2, th)

        tth = th * M_4RPI
        fo = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo.astype(jnp.float32)
        fo0 = fo & 7
        fo1 = (fo0 + 1) & 7

        ww = jnp.where(ok[:, None, None], G[None] * mod, 0.0)
        A = ((fo0[..., None] == bins) * ((1.0 - do0) * ww)[..., None]
             + (fo1[..., None] == bins) * (do0 * ww)[..., None])
        B = jnp.einsum("nyxb,xt->nytb", A, TX,
                       preferred_element_type=jnp.float32)
        D = jnp.einsum("nytb,ys->nstb", B, TX,
                       preferred_element_type=jnp.float32)
        return D.reshape(-1, 128)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def grid_rounded_descriptors_windowed_mm(stackp: jnp.ndarray,
                                         pad_y: int, pad_x: int,
                                         xpos, ypos, lpos, sigma, ang,
                                         valid,
                                         w: int, h: int, win: int,
                                         chunk: int = 16) -> jnp.ndarray:
    """Grid-mode descriptors with MXU-contracted point sampling — the
    TPU speed path for DescMode.GRID.

    Same numerics as :func:`grid_rounded_descriptors_windowed`
    (_grid_rounded_body: per-tile rotated 16x16 grids rounded to pixel
    centres, recomputed weights, axis-aligned central differences,
    th -= ang), but the integer taps become one-hot separable
    contractions.  The two central differences share their row (resp.
    column) one-hot, so each gradient component is ONE matmul with a
    signed tap matrix:

        gdx_s = sum_r onehotY[r,s] * (W @ (onehotX(xp) - onehotX(xm)))[r,s]
        gdy_s = sum_r (onehotY(yp) - onehotY(ym))[r,s] * (W @ onehotX)[r,s]

    One-hot rows/columns are built with the same triangle generator as
    the bilinear sampler (tri at integer positions is exactly one-hot),
    so clamp semantics match the gather form's image-clip-then-window
    reads.
    """
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    offs = np.asarray(_tile_offsets())
    bins = jnp.arange(8, dtype=jnp.int32)
    hp = jax.lax.Precision.HIGHEST

    # static 16x16 local grid in tile units ((k+0.5)/8 - 1,
    # s_desc_grid.cu:69), tiled over the 4x4 tile offsets -> (4096,) of
    # (tile_iy, tile_ix, v, u)
    k16 = (np.arange(16, dtype=np.float32) + 0.5) / 8.0 - 1.0
    ug = np.broadcast_to(k16[None, :], (16, 16))
    vg = np.broadcast_to(k16[:, None], (16, 16))
    OX = np.concatenate([np.full((256,), float(offs[ix]), np.float32)
                         for _ in range(4) for ix in range(4)])
    OY = np.concatenate([np.full((256,), float(offs[iy]), np.float32)
                         for iy in range(4) for _ in range(4)])
    UG = np.concatenate([ug.reshape(-1)] * 16)
    VG = np.concatenate([vg.reshape(-1)] * 16)

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)
        x0f = x0.astype(jnp.float32)
        y0f = (ya - pad_y).astype(jnp.float32)

        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        safe_sbp = jnp.where(sbp > 0.0, sbp, 1.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)
        csbp = (cos_t * sbp)[:, None]
        ssbp = (sin_t * sbp)[:, None]

        ox = jnp.asarray(OX)[None, :]
        oy = jnp.asarray(OY)[None, :]
        ugj = jnp.asarray(UG)[None, :]
        vgj = jnp.asarray(VG)[None, :]
        ct = cos_t[:, None]
        st = sin_t[:, None]
        ptx = csbp * ox - ssbp * oy + x[:, None]     # tile centres
        pty = csbp * oy + ssbp * ox + y[:, None]
        pixox = ct * ugj - st * vgj
        pixoy = ct * vgj + st * ugj
        px = jnp.round(ptx + pixox * sbp[:, None])   # (n, 4096)
        py = jnp.round(pty + pixoy * sbp[:, None])
        # recomputed rotated-local coords of the rounded pixel
        rxn = (px - ptx) / safe_sbp[:, None]
        ryn = (py - pty) / safe_sbp[:, None]
        nx = ct * rxn + st * ryn
        ny = ct * ryn - st * rxn

        # integer taps, image-clipped FIRST (identical semantics to the
        # gather form), then window-local
        ix0 = jnp.clip(px, 0.0, w - 1.0)
        iy0 = jnp.clip(py, 0.0, h - 1.0)
        xp = jnp.clip(ix0 + 1.0, 0.0, w - 1.0) - x0f[:, None]
        xm = jnp.clip(ix0 - 1.0, 0.0, w - 1.0) - x0f[:, None]
        yp = jnp.clip(iy0 + 1.0, 0.0, h - 1.0) - y0f[:, None]
        ym = jnp.clip(iy0 - 1.0, 0.0, h - 1.0) - y0f[:, None]
        ix0 = jnp.clip(ix0 - x0f[:, None], 0.0, 127.0)
        iy0 = jnp.clip(iy0 - y0f[:, None], 0.0, win_y - 1.0)
        xp = jnp.clip(xp, 0.0, 127.0)
        xm = jnp.clip(xm, 0.0, 127.0)
        yp = jnp.clip(yp, 0.0, win_y - 1.0)
        ym = jnp.clip(ym, 0.0, win_y - 1.0)

        cc = jnp.arange(128, dtype=jnp.float32)
        rr = jnp.arange(win_y, dtype=jnp.float32)

        def onehot_c(p):
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(cc[None, :, None] - p[:, None, :]))

        def onehot_r(p):
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(rr[None, :, None] - p[:, None, :]))

        # gdx: signed column taps, shared row one-hot
        m1 = jnp.einsum("nrc,ncs->nrs", wins,
                        onehot_c(xp) - onehot_c(xm), precision=hp)
        gdx = jnp.sum(m1 * onehot_r(iy0), axis=1)
        # gdy: shared column one-hot, signed row taps
        m2 = jnp.einsum("nrc,ncs->nrs", wins, onehot_c(ix0),
                        precision=hp)
        gdy = jnp.sum(m2 * (onehot_r(yp) - onehot_r(ym)), axis=1)

        mod = jnp.hypot(gdx, gdy)
        th = jnp.arctan2(gdy, gdx) - a[:, None]
        th = jnp.where(th < 0.0, th + M_PI2, th)
        th = jnp.where(th >= M_PI2, th - M_PI2, th)
        tth = th * M_4RPI
        fo = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo.astype(jnp.float32)
        fo0 = jnp.clip(fo, 0, 7)
        fo1 = (fo0 + 1) % 8

        dnx = nx + ox
        dny = ny + oy
        ww = jnp.exp(-(dnx * dnx + dny * dny) / 8.0)
        wx = 1.0 - jnp.abs(nx)
        wy = 1.0 - jnp.abs(ny)
        good = (wx >= 0.0) & (wy >= 0.0) & ok[:, None]
        wgt = jnp.where(good, ww * wx * wy * mod, 0.0)
        A = ((fo0[..., None] == bins) * ((1.0 - do0) * wgt)[..., None]
             + (fo1[..., None] == bins) * (do0 * wgt)[..., None])
        # (n, 16 tiles x 256 samples, 8) -> per-tile sample sums in the
        # [ty][tx][bin] output layout
        D = jnp.sum(A.reshape(-1, 16, 256, 8), axis=2)
        return D.reshape(-1, 128)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def _grid_rounded_body(tapi, x, y, sig, a, ok, w: int, h: int, offs):
    """Per-slot Grid-mode math given an integer-tap sampler
    ``tapi(yy, xx)`` over image-clipped integer coordinates
    (s_desc_grid.cu:18-121): each tile samples its own rotated 16x16
    grid, every sample is rounded to the nearest pixel, the
    tile/Gaussian weights are recomputed from the *rounded* position
    (skipped when the recomputed triangle weight goes negative,
    s_desc_grid.cu:86), the gradient is the axis-aligned central
    difference at that pixel, and the angle is de-rotated with
    ``th -= ang``."""
    sbp = jnp.abs(DESC_MAGNIFY * sig)
    ok = ok & (sbp > 0.0)
    safe_sbp = jnp.where(sbp > 0.0, sbp, 1.0)
    cos_t = jnp.cos(a)
    sin_t = jnp.sin(a)
    csbp = cos_t * sbp
    ssbp = sin_t * sbp

    # local 16x16 grid in tile units: (k+0.5)/8 - 1 (s_desc_grid.cu:69)
    k = (jnp.arange(16, dtype=jnp.float32) + 0.5) / 8.0 - 1.0
    ul = k[None, :]
    vl = k[:, None]
    ulg = jnp.broadcast_to(ul, (16, 16))
    vlg = jnp.broadcast_to(vl, (16, 16))
    # axis-aligned offset of the sample from the tile centre (SBP units)
    pixox = cos_t * ulg - sin_t * vlg
    pixoy = cos_t * vlg + sin_t * ulg

    bins = jnp.arange(8, dtype=jnp.int32)
    D = jnp.zeros((4, 4, 8), jnp.float32)
    for iy in range(4):
        for ix in range(4):
            oxf, oyf = float(offs[ix]), float(offs[iy])
            ptx = csbp * oxf - ssbp * oyf + x     # tile centre
            pty = csbp * oyf + ssbp * oxf + y
            # round to pixel centres (s_desc_grid.cu:71)
            px = jnp.round(ptx + pixox * sbp)
            py = jnp.round(pty + pixoy * sbp)
            # recomputed rotated-local coords of the rounded pixel
            rx = (px - ptx) / safe_sbp
            ry = (py - pty) / safe_sbp
            nx = cos_t * rx + sin_t * ry
            ny = cos_t * ry - sin_t * rx

            ix0 = jnp.clip(px.astype(jnp.int32), 0, w - 1)
            iy0 = jnp.clip(py.astype(jnp.int32), 0, h - 1)
            xp = jnp.clip(ix0 + 1, 0, w - 1)
            xm = jnp.clip(ix0 - 1, 0, w - 1)
            yp = jnp.clip(iy0 + 1, 0, h - 1)
            ym = jnp.clip(iy0 - 1, 0, h - 1)
            gdx = tapi(iy0, xp) - tapi(iy0, xm)
            gdy = tapi(yp, ix0) - tapi(ym, ix0)
            mod = jnp.hypot(gdx, gdy)
            th = jnp.arctan2(gdy, gdx) - a
            th = jnp.where(th < 0.0, th + M_PI2, th)
            th = jnp.where(th >= M_PI2, th - M_PI2, th)
            tth = th * M_4RPI
            fo = jnp.floor(tth).astype(jnp.int32)
            do0 = tth - fo.astype(jnp.float32)
            fo0 = jnp.clip(fo, 0, 7)
            fo1 = (fo0 + 1) % 8

            dnx = nx + oxf
            dny = ny + oyf
            ww = jnp.exp(-(dnx * dnx + dny * dny) / 8.0)
            wx = 1.0 - jnp.abs(nx)
            wy = 1.0 - jnp.abs(ny)
            good = (wx >= 0.0) & (wy >= 0.0) & ok
            wgt = jnp.where(good, ww * wx * wy * mod, 0.0)
            A = ((fo0[..., None] == bins) * ((1.0 - do0) * wgt)[..., None]
                 + (fo1[..., None] == bins) * (do0 * wgt)[..., None])
            D = D.at[iy, ix].set(jnp.sum(A, axis=(0, 1)))
    return D.reshape(128)


def grid_rounded_descriptors(stack: jnp.ndarray,
                             xpos, ypos, lpos, sigma, ang, valid,
                             chunk: int = 64) -> jnp.ndarray:
    """Grid-mode descriptors over whole-plane gathers (the CPU-shaped
    formulation; see :func:`_grid_rounded_body`)."""
    L, h, w = stack.shape
    offs = np.asarray(_tile_offsets())

    def one_slot(x, y, l, sig, a, vld):
        lp = jnp.clip(l, 0, L - 1)
        img = jax.lax.dynamic_index_in_dim(stack, lp, axis=0,
                                           keepdims=False)
        return _grid_rounded_body(lambda yy, xx: img[yy, xx],
                                  x, y, sig, a, vld, w, h, offs)

    return _chunked_slots(one_slot, (xpos, ypos, lpos, sigma, ang, valid),
                          chunk)


def grid_rounded_descriptors_windowed(stackp: jnp.ndarray,
                                      pad_y: int, pad_x: int,
                                      xpos, ypos, lpos, sigma, ang, valid,
                                      w: int, h: int, win: int,
                                      chunk: int = 64) -> jnp.ndarray:
    """Grid-mode descriptors via batched window DMA (TPU path).

    Integer taps are image-clipped FIRST (identical semantics to the
    plane formulation), then read from the per-slot window — a clipped
    tap always lands inside the window because clipping only moves a
    sample toward the keypoint."""
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    offs = np.asarray(_tile_offsets())

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)

        def one_slot(wimg, x, y, x0i, y0i, sig, a, vld):
            wflat = wimg.reshape(-1)

            def tapi(yy, xx):
                xr = jnp.clip(xx - x0i, 0, 127)
                yr = jnp.clip(yy - y0i, 0, win_y - 1)
                return jnp.take(wflat, yr * 128 + xr)

            return _grid_rounded_body(tapi, x, y, sig, a, vld, w, h, offs)

        return jax.vmap(one_slot)(wins, x, y, x0, ya - pad_y, sig, a, vld)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def _iloop_body(bil, x, y, sig, a, ok, offs):
    """Per-slot ILoop math given a bilinear sampler ``bil(px, py)``
    (s_desc_iloop.cu:18-130): per tile, a fixed 32x32 axis-aligned sample
    grid spanning the tile's rotated bounding box (dx, dy in [-bsz, bsz)
    steps of bsz/16, SBP units), rotated-derivative gradients, no angle
    subtraction."""
    sbp = jnp.abs(DESC_MAGNIFY * sig)
    ok = ok & (sbp > 0.0)
    cos_t = jnp.cos(a)
    sin_t = jnp.sin(a)
    bsz = jnp.abs(cos_t) + jnp.abs(sin_t)

    k = jnp.arange(32, dtype=jnp.float32)
    dx = (-bsz + k * bsz / 16.0)[None, :]    # (1, 32)
    dy = (-bsz + k * bsz / 16.0)[:, None]    # (32, 1)
    dxg = jnp.broadcast_to(dx, (32, 32))
    dyg = jnp.broadcast_to(dy, (32, 32))

    nx = cos_t * dxg + sin_t * dyg
    ny = cos_t * dyg - sin_t * dxg
    nn_ok = (jnp.abs(nx) < 1.0) & (jnp.abs(ny) < 1.0)

    D = jnp.zeros((4, 4, 8), jnp.float32)
    bins = jnp.arange(8, dtype=jnp.int32)
    csbp = cos_t * sbp
    ssbp = sin_t * sbp
    for iy in range(4):
        for ix in range(4):
            ox, oy = float(offs[ix]), float(offs[iy])
            ptx = csbp * ox - ssbp * oy
            pty = csbp * oy + ssbp * ox
            jj = x + ptx + dxg * sbp
            ii = y + pty + dyg * sbp
            gdx = bil(jj + cos_t, ii + sin_t) \
                - bil(jj - cos_t, ii - sin_t)
            gdy = bil(jj - sin_t, ii + cos_t) \
                - bil(jj + sin_t, ii - cos_t)
            mod = jnp.hypot(gdx, gdy)
            th = jnp.arctan2(gdy, gdx)
            th = jnp.where(th < 0.0, th + M_PI2, th)
            th = jnp.where(th >= M_PI2, th - M_PI2, th)
            tth = th * M_4RPI
            fo = jnp.floor(tth).astype(jnp.int32)
            do0 = tth - fo.astype(jnp.float32)
            fo0 = jnp.clip(fo, 0, 7)
            fo1 = (fo0 + 1) % 8

            dnx = nx + ox
            dny = ny + oy
            ww = jnp.exp(-(dnx * dnx + dny * dny) / 8.0)
            wgt = jnp.where(nn_ok & ok,
                            ww * (1.0 - jnp.abs(nx))
                            * (1.0 - jnp.abs(ny)) * mod, 0.0)
            A = ((fo0[..., None] == bins) * ((1.0 - do0) * wgt)[..., None]
                 + (fo1[..., None] == bins) * (do0 * wgt)[..., None])
            D = D.at[iy, ix].set(jnp.sum(A, axis=(0, 1)))
    return D.reshape(128)


def iloop_descriptors(stack: jnp.ndarray,
                      xpos, ypos, lpos, sigma, ang, valid,
                      chunk: int = 32) -> jnp.ndarray:
    """ILoop-mode descriptors over whole-plane bilinear gathers (the
    CPU/reference-shaped formulation; see :func:`_iloop_body`)."""
    L, h, w = stack.shape
    offs = np.asarray(_tile_offsets())

    def one_slot(x, y, l, sig, a, vld):
        lp = jnp.clip(l, 0, L - 1)
        img = jax.lax.dynamic_index_in_dim(stack, lp, axis=0,
                                           keepdims=False)
        return _iloop_body(lambda px, py: _bilinear(img, px, py),
                           x, y, sig, a, vld, offs)

    return _chunked_slots(one_slot, (xpos, ypos, lpos, sigma, ang, valid),
                          chunk)


def iloop_descriptors_windowed(stackp: jnp.ndarray, pad_y: int, pad_x: int,
                               xpos, ypos, lpos, sigma, ang, valid,
                               w: int, h: int, win: int,
                               chunk: int = 32) -> jnp.ndarray:
    """ILoop descriptors via batched window DMA (TPU path; same window
    contract as :func:`grid_descriptors_windowed`)."""
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    offs = np.asarray(_tile_offsets())

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)
        y0a = ya - pad_y

        def one_slot(wimg, x, y, x0f, y0f, sig, a, vld):
            wflat = wimg.reshape(-1)
            xlo, xhi = 0.0 - x0f, (w - 1.0) - x0f
            ylo, yhi = 0.0 - y0f, (h - 1.0) - y0f

            def bil(px, py):
                return _bilinear_win(wflat, px - x0f, py - y0f, win_y,
                                     xlo, xhi, ylo, yhi)

            return _iloop_body(bil, x, y, sig, a, vld, offs)

        return jax.vmap(one_slot)(
            wins, x, y, x0.astype(jnp.float32), y0a.astype(jnp.float32),
            sig, a, vld)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def iloop_descriptors_windowed_mm(stackp: jnp.ndarray,
                                  pad_y: int, pad_x: int,
                                  xpos, ypos, lpos, sigma, ang, valid,
                                  w: int, h: int, win: int,
                                  chunk: int = 16) -> jnp.ndarray:
    """ILoop descriptors with MXU-contracted bilinear sampling — the
    TPU speed path for DescMode.ILOOP.

    Same numerics as :func:`iloop_descriptors_windowed` (_iloop_body:
    per tile a fixed 32x32 AXIS-ALIGNED sample grid spanning the
    rotated tile's bounding box, rotated-derivative gradients), but the
    axis-aligned grid makes the bilinear sampling DOUBLY separable:
    sample columns share x positions and sample rows share y positions,
    so each (tile, gradient-offset) sample plane is two small matmuls

        S = triY^T (W triX),  triX (128, 32), triY (win_y, 32)

    instead of 1024 gathers.  Tiles x 4 gradient offsets batch into one
    einsum pair per chunk.
    """
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    win_y, _ = rolled_window_dims(win)
    L = stackp.shape[0]
    offs = np.asarray(_tile_offsets())
    bins = jnp.arange(8, dtype=jnp.int32)
    hp = jax.lax.Precision.HIGHEST
    # tile offset grids: tile t = iy*4 + ix (the [iy][ix][bin] output
    # layout of _iloop_body's D)
    OXS = np.asarray([float(offs[t % 4]) for t in range(16)], np.float32)
    OYS = np.asarray([float(offs[t // 4]) for t in range(16)], np.float32)

    def chunk_fn(c):
        x, y, l, sig, a, vld = c
        n = x.shape[0]
        rx = jnp.round(x).astype(jnp.int32)
        ry = jnp.round(y).astype(jnp.int32)
        x0 = rx - win // 2
        y0 = ry - win // 2
        lp = jnp.clip(l, 0, L - 1)
        wins, ya = gather_windows_exact(
            stackp, lp, y0 + pad_y, x0 + pad_x, win)
        x0f = x0.astype(jnp.float32)
        y0f = (ya - pad_y).astype(jnp.float32)

        sbp = jnp.abs(DESC_MAGNIFY * sig)
        ok = vld & (sbp > 0.0)
        cos_t = jnp.cos(a)
        sin_t = jnp.sin(a)
        bsz = jnp.abs(cos_t) + jnp.abs(sin_t)

        k = jnp.arange(32, dtype=jnp.float32)
        d = -bsz[:, None] + k[None, :] * (bsz / 16.0)[:, None]  # (n, 32)
        # normalized rotated-local coords, shared across tiles (32y, 32x)
        nx = (cos_t[:, None, None] * d[:, None, :]
              + sin_t[:, None, None] * d[:, :, None])
        ny = (cos_t[:, None, None] * d[:, :, None]
              - sin_t[:, None, None] * d[:, None, :])
        nn_ok = (jnp.abs(nx) < 1.0) & (jnp.abs(ny) < 1.0)

        csbp = cos_t * sbp
        ssbp = sin_t * sbp
        ptx = (csbp[:, None] * OXS[None, :]
               - ssbp[:, None] * OYS[None, :])          # (n, 16)
        pty = (csbp[:, None] * OYS[None, :]
               + ssbp[:, None] * OXS[None, :])

        # per-(tile, variant) separable sample positions, window-local.
        # variants: (+c,+s), (-c,-s), (-s,+c), (+s,-c)
        dcx = jnp.stack([cos_t, -cos_t, -sin_t, sin_t], 1)   # (n, 4)
        dcy = jnp.stack([sin_t, -sin_t, cos_t, -cos_t], 1)
        base_x = (x[:, None] + ptx - x0f[:, None])           # (n, 16)
        base_y = (y[:, None] + pty - y0f[:, None])
        dsb = d * sbp[:, None]                               # (n, 32)
        # PX[n, t, v, s] = base_x[t] + dcx[v] + dsb[s]
        PX = (base_x[:, :, None, None] + dcx[:, None, :, None]
              + dsb[:, None, None, :])                       # (n,16,4,32)
        PY = (base_y[:, :, None, None] + dcy[:, None, :, None]
              + dsb[:, None, None, :])
        xlo, xhi = 0.0 - x0f, (w - 1.0) - x0f
        ylo, yhi = 0.0 - y0f, (h - 1.0) - y0f
        PX = jnp.clip(jnp.clip(PX, xlo[:, None, None, None],
                               xhi[:, None, None, None]), 0.0, 127.0)
        PY = jnp.clip(jnp.clip(PY, ylo[:, None, None, None],
                               yhi[:, None, None, None]), 0.0,
                      win_y - 1.0)

        cc = jnp.arange(128, dtype=jnp.float32)
        rr = jnp.arange(win_y, dtype=jnp.float32)
        PXf = PX.reshape(n, 64, 32)
        PYf = PY.reshape(n, 64, 32)
        triX = jnp.maximum(0.0, 1.0 - jnp.abs(
            cc[None, None, :, None] - PXf[:, :, None, :]))  # (n,64,128,32)
        triY = jnp.maximum(0.0, 1.0 - jnp.abs(
            rr[None, None, :, None] - PYf[:, :, None, :]))  # (n,64,wy,32)
        M = jnp.einsum("nrc,nvcs->nvrs", wins, triX,
                       precision=hp)                         # (n,64,wy,32x)
        S = jnp.einsum("nvry,nvrx->nvyx", triY, M,
                       precision=hp)                         # (n,64,32y,32x)
        S = S.reshape(n, 16, 4, 32, 32)

        gdx = S[:, :, 0] - S[:, :, 1]                        # (n,16,32,32)
        gdy = S[:, :, 2] - S[:, :, 3]
        mod = jnp.hypot(gdx, gdy)
        th = jnp.arctan2(gdy, gdx)
        th = jnp.where(th < 0.0, th + M_PI2, th)
        th = jnp.where(th >= M_PI2, th - M_PI2, th)
        tth = th * M_4RPI
        fo = jnp.floor(tth).astype(jnp.int32)
        do0 = tth - fo.astype(jnp.float32)
        fo0 = jnp.clip(fo, 0, 7)
        fo1 = (fo0 + 1) % 8

        dnx = nx[:, None] + OXS[None, :, None, None]
        dny = ny[:, None] + OYS[None, :, None, None]
        ww = jnp.exp(-(dnx * dnx + dny * dny) / 8.0)
        wgt = jnp.where((nn_ok & ok[:, None, None])[:, None],
                        ww * (1.0 - jnp.abs(nx))[:, None]
                        * (1.0 - jnp.abs(ny))[:, None] * mod, 0.0)
        A = ((fo0[..., None] == bins) * ((1.0 - do0) * wgt)[..., None]
             + (fo1[..., None] == bins) * (do0 * wgt)[..., None])
        D = jnp.sum(A, axis=(2, 3))                          # (n, 16, 8)
        return D.reshape(n, 128)

    cap = xpos.shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma), padv(ang),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(chunk_fn, args)
    return out.reshape(n_chunks * chunk, 128)[:cap]


def _chunked_slots(one_slot, args, chunk: int) -> jnp.ndarray:
    """Run a per-slot descriptor function over all slots in lax.map chunks."""
    cap = args[0].shape[0]
    n_chunks = -(-cap // chunk)
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    padded = tuple(padv(a) for a in args[:-1]) + (padv(args[-1], False),)
    padded = tuple(a.reshape((n_chunks, chunk) + a.shape[1:])
                   for a in padded)
    out = jax.lax.map(lambda c: jax.vmap(one_slot)(*c), padded)
    return out.reshape(n_chunks * chunk, 128)[:cap]


# ---------------------------------------------------------------------------
# normalisation
# ---------------------------------------------------------------------------

def normalize_rootsift(desc: jnp.ndarray, norm_multi: int,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """RootSift: L1-normalise then sqrt, scaled by 2^norm_multi
    (s_desc_norm_rs.h:42-77; descriptor entries are non-negative so the sum
    is the L1 norm)."""
    s = jnp.sum(desc, axis=-1, keepdims=True)
    safe = jnp.where(s > 0.0, s, 1.0)
    out = jnp.sqrt(desc / safe) * (2.0 ** norm_multi)
    return jnp.where(valid[:, None] & (s > 0.0), out, 0.0)


def normalize_l2(desc: jnp.ndarray, norm_multi: int,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """Classic L2: norm, clamp at 0.2*norm, renormalise with rsqrt
    (s_desc_norm_l2.h:86-129, the non-normf default path)."""
    n1 = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    clamped = jnp.minimum(desc, 0.2 * n1)
    n2sq = jnp.sum(clamped * clamped, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.where(n2sq > 0.0, n2sq, 1.0)) \
        * (2.0 ** norm_multi)
    out = clamped * inv
    return jnp.where(valid[:, None] & (n2sq > 0.0), out, 0.0)
