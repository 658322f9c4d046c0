"""Orientation assignment, TPU-native.

Replaces the one-block-per-extremum CUDA kernel
(/root/reference/src/popsift/s_orientation.cu:75-259) with a batched
fixed-window formulation:

* the data-dependent radius ``rad = round(3 * 1.5 * sigma)`` becomes a
  static window sized for the worst-case sigma of the configuration, with a
  per-pixel validity mask reproducing the exact xmin/xmax/rad gates,
* the shared-memory atomicAdd histogram becomes a one-hot contraction,
* VLFeat smoothing = 6 circular box-average passes
  (s_orientation.cu:165-178; ``WITH_VLFEAT_SMOOTHING`` is the compiled-in
  default, s_orientation.cu:34),
* the warp bitonic sort for peak ranking (s_orientation.cu:224-231) becomes
  ``jax.lax.top_k``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ORI_NBINS, ORI_WINFACTOR, ORIENTATION_MAX_COUNT, M_PI2


def max_sigma(sigma0: float, levels: int) -> float:
    """Worst-case extremum sigma: sn <= maxlevel = levels+2
    (verify(), s_extrema.cu:243,295)."""
    return sigma0 * 2.0 ** ((levels + 2) / levels)


def ori_window_size(sigma0: float, levels: int) -> int:
    """Static window covering radius round(3 * 1.5 * sigma_max), padded to a
    multiple of 8."""
    rad = int(round(3.0 * ORI_WINFACTOR * max_sigma(sigma0, levels)))
    win = 2 * rad + 1
    return (win + 7) // 8 * 8




# Compile-time smoothing selector of the reference
# (WITH_VLFEAT_SMOOTHING, s_orientation.cu:34): VLFeat smoothing is the
# compiled-in default; flip to False for the OpenCV variant.
WITH_VLFEAT_SMOOTHING = True


def smooth_histogram_vlfeat(hist: jnp.ndarray) -> jnp.ndarray:
    """Six circular 3-bin box averages (s_orientation.cu:165-178)."""
    for _ in range(6):
        hist = (jnp.roll(hist, 1, axis=-1) + hist
                + jnp.roll(hist, -1, axis=-1)) / 3.0
    return hist


def smooth_histogram_opencv(hist: jnp.ndarray) -> jnp.ndarray:
    """One circular [1,4,6,4,1]/16 pass (s_orientation.cu:179-194)."""
    return (jnp.roll(hist, 2, axis=-1) + jnp.roll(hist, -2, axis=-1)
            + 4.0 * (jnp.roll(hist, 1, axis=-1)
                     + jnp.roll(hist, -1, axis=-1))
            + 6.0 * hist) / 16.0


def smooth_histogram(hist: jnp.ndarray) -> jnp.ndarray:
    if WITH_VLFEAT_SMOOTHING:
        return smooth_histogram_vlfeat(hist)
    return smooth_histogram_opencv(hist)


def _histograms(bothp, xpos, ypos, lpos, sigma, valid,
                w: int, h: int, win: int, pad_y: int, pad_x: int,
                n_levels: int):
    """Gradient-magnitude orientation histograms for a batch of slots
    (ori_par's first phase, s_orientation.cu:104-162).

    ``bothp`` is the padded concatenation [mag; theta] along the level axis
    so one DMA kernel call fetches both windows."""
    from ..kernels.windows2 import gather_windows_exact, rolled_window_dims

    n = xpos.shape[0]
    rx = jnp.round(xpos).astype(jnp.int32)
    ry = jnp.round(ypos).astype(jnp.int32)
    rad = jnp.round(3.0 * (ORI_WINFACTOR * sigma)).astype(jnp.int32)
    half = win // 2
    x0 = rx - half
    y0 = ry - half
    lp = jnp.clip(lpos, 0, n_levels - 1)

    win_y, win_x = rolled_window_dims(win)
    lp2 = jnp.concatenate([2 * lp, 2 * lp + 1])   # interleaved field
    wins, ya = gather_windows_exact(
        bothp, lp2, jnp.tile(y0 + pad_y, 2), jnp.tile(x0 + pad_x, 2), win)
    mw, tw = wins[:n], wins[n:]
    # unpadded-coordinate origins (columns start exactly at x0)
    y0 = ya[:n] - pad_y

    jj = x0[:, None] + jnp.arange(win_x, dtype=jnp.int32)[None, :]
    ii = y0[:, None] + jnp.arange(win_y, dtype=jnp.int32)[None, :]

    # xmin/xmax gates (s_orientation.cu:114-117)
    xmin = jnp.maximum(1, rx - rad)
    xmax = jnp.minimum(w - 2, rx + rad)
    ymin = jnp.maximum(1, ry - rad)
    ymax = jnp.minimum(h - 2, ry + rad)
    in_x = (jj >= xmin[:, None]) & (jj <= xmax[:, None])
    in_y = (ii >= ymin[:, None]) & (ii <= ymax[:, None])

    dxf = jj.astype(jnp.float32) - xpos[:, None]
    dyf = ii.astype(jnp.float32) - ypos[:, None]
    # int truncation of the squared distance (s_orientation.cu:142)
    sq = (dxf[:, None, :] ** 2 + dyf[:, :, None] ** 2).astype(jnp.int32)
    sigw = ORI_WINFACTOR * sigma
    factor = -0.5 / (sigw * sigw)
    inside = (sq <= (rad * rad)[:, None, None]) \
        & in_x[:, None, :] & in_y[:, :, None] \
        & valid[:, None, None]

    weight = jnp.where(
        inside, mw * jnp.exp(sq.astype(jnp.float32)
                             * factor[:, None, None]), 0.0)

    bidx = jnp.round(ORI_NBINS * (tw + math.pi) / M_PI2).astype(jnp.int32)
    bidx = jnp.where(bidx == ORI_NBINS, 0, bidx)

    c = weight.shape[0]
    wflat = weight.reshape(c, win_y * win_x)
    bflat = bidx.reshape(c, win_y * win_x)
    # histogram via per-bin masked sums (36 fused passes; avoids a giant
    # one-hot tensor)
    cols = []
    for b in range(ORI_NBINS):
        cols.append(jnp.sum(jnp.where(bflat == b, wflat, 0.0), axis=-1))
    return jnp.stack(cols, axis=-1)


def _hist_chunked(bothp, xpos, ypos, lpos, sigma, valid,
                  w: int, h: int, win: int, pad_y: int, pad_x: int,
                  n_levels: int, chunk: int, stack=None) -> jnp.ndarray:
    """Chunked-histogram wrapper: (cap,) slot arrays -> (cap, 36).

    On TPU the whole stage is ONE fused Pallas kernel (window DMA +
    binning in VMEM, kernels/binwin.py — the shape of the reference's
    ori_par, s_orientation.cu:104-162).  When the raw blurred ``stack``
    is supplied and the octave is big enough, gradients are computed
    in-kernel too (s_gradiant.h:55-69) and the dense [mag; theta] field
    feeding ``bothp`` dead-code-eliminates from the fused program.  The
    XLA chunked form below is the numerically-identical fallback."""
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and win <= 120:
        from ..kernels.binwin import (_win_rows, ori_hist_fused,
                                      ori_hist_stack, stack_kernel_ok)
        if stack is not None and stack_kernel_ok(stack.shape, win):
            return ori_hist_stack(stack, xpos, ypos, lpos, sigma, valid,
                                  w, h, win)
        if bothp.shape[2] >= 256 and bothp.shape[1] >= _win_rows(win):
            return ori_hist_fused(bothp, xpos, ypos, lpos, sigma, valid,
                                  w, h, win, pad_y, pad_x)
    if pad_y == 0 and pad_x == 0:
        # the XLA gather fallback needs real window pads (its DMA origins
        # are not clamped); re-pad the unpadded TPU field on demand —
        # this only compiles into rare programs (win > 120, tiny octaves)
        from ..kernels.windows import aligned_window_dims
        pad_y, pad_x = aligned_window_dims(win)
        bothp = jnp.pad(bothp, ((0, 0), (pad_y, pad_y), (pad_x, pad_x)))
    cap = xpos.shape[0]
    chunk = min(chunk, max(cap, 1))
    n_chunks = -(-cap // chunk) if cap else 0
    pad_n = n_chunks * chunk - cap

    def padv(v, fill=0):
        return jnp.pad(v, (0, pad_n), constant_values=fill) if pad_n else v

    args = (padv(xpos), padv(ypos), padv(lpos), padv(sigma),
            padv(valid, False))
    args = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    return jax.lax.map(
        lambda c: _histograms(bothp, *c, w, h, win, pad_y, pad_x,
                              n_levels),
        args).reshape(n_chunks * chunk, ORI_NBINS)[:cap]


def ori_required_win(sigma: jnp.ndarray) -> jnp.ndarray:
    """Per-slot window each extremum actually needs: the full
    data-dependent radius of the reference (s_orientation.cu:105-117)."""
    return 2.0 * jnp.round(3.0 * ORI_WINFACTOR * sigma) + 1.0


def assign_orientations_classed(bothp: jnp.ndarray, pad_y: int, pad_x: int,
                                xpos, ypos, lpos, sigma, valid,
                                w: int, h: int,
                                classes: list[tuple[int, int]],
                                max_count: int = ORIENTATION_MAX_COUNT,
                                chunk: int = 256, stack=None):
    """:func:`assign_orientations` with sigma-classed window sizes.

    ``classes``: [(win, size), ...] in DESCENDING window order with sizes
    summing to the slot capacity.  Slots are sorted by required window
    (descending) so each region's slots mostly fit its window; slots
    whose requirement exceeds their region's window are counted in the
    returned ``violations`` scalar — the caller must then discard the
    result and re-run the max-window path (the staged pipeline folds
    this into its existing overflow-validation readback).  With zero
    violations the result is EXACTLY the max-window result (windows
    only carry masked-out pixels beyond the required radius).

    Returns (num_ori, orientations, violations).
    """
    n_levels = bothp.shape[0] // 2
    cap = xpos.shape[0]
    assert sum(s for _, s in classes) == cap

    req = jnp.where(valid, ori_required_win(sigma), 0.0)
    order = jnp.argsort(-req)
    xs, ys, ls, ss, vs = (jnp.take(a, order, axis=0)
                          for a in (xpos, ypos, lpos, sigma, valid))
    req_s = jnp.take(req, order, axis=0)

    hists = []
    viol = jnp.int32(0)
    start = 0
    for win_r, size_r in classes:
        sl = slice(start, start + size_r)
        if size_r:
            hists.append(_hist_chunked(
                bothp, xs[sl], ys[sl], ls[sl], ss[sl], vs[sl],
                w, h, win_r, pad_y, pad_x, n_levels, chunk,
                stack=stack))
            viol = viol + jnp.sum(
                (req_s[sl] > win_r).astype(jnp.int32))
        start += size_r
    hist_sorted = jnp.concatenate(hists) if len(hists) > 1 else hists[0]
    hist = jnp.zeros_like(hist_sorted).at[order].set(hist_sorted)

    num_ori, orientations = _peaks_from_hist(hist, valid, max_count)
    return num_ori, orientations, viol


def assign_orientations(bothp: jnp.ndarray, pad_y: int, pad_x: int,
                        xpos: jnp.ndarray, ypos: jnp.ndarray,
                        lpos: jnp.ndarray, sigma: jnp.ndarray,
                        valid: jnp.ndarray,
                        w: int, h: int, win: int,
                        max_count: int = ORIENTATION_MAX_COUNT,
                        chunk: int = 256, stack=None):
    """Compute up to ``max_count`` orientations per extremum slot.

    bothp : (2L, H+2*pad_y, W+2*pad_x) padded [mag; theta] field of this
    octave (ops.gradients.padded_gradient_field; pads must cover the
    window DMA slab: pad_y >= rolled rows, pad_x >= 256).
    Returns (num_ori (cap,), orientations (cap, max_count)) with orientation
    peaks in descending-strength order (the CUDA kernel writes them in
    bitonic-sorted order too, s_orientation.cu:239-248).
    """
    n_levels = bothp.shape[0] // 2
    hist = _hist_chunked(bothp, xpos, ypos, lpos, sigma, valid,
                         w, h, win, pad_y, pad_x, n_levels, chunk,
                         stack=stack)
    return _peaks_from_hist(hist, valid, max_count)


def _peaks_from_hist(hist: jnp.ndarray, valid: jnp.ndarray,
                     max_count: int):
    """Smoothing + quadratic peak refinement + top-k acceptance
    (s_orientation.cu:165-258)."""
    sm = smooth_histogram(hist)

    # per-bin quadratic peak refinement (s_orientation.cu:199-221)
    prev = jnp.roll(sm, 1, axis=-1)
    nxt = jnp.roll(sm, -1, axis=-1)
    is_peak = sm > jnp.maximum(prev, nxt)
    num = jnp.where(is_peak, 3.0 * prev - 4.0 * sm + 1.0 * nxt, 0.0)
    denB = jnp.where(is_peak, 2.0 * (prev - 2.0 * sm + nxt), 1.0)
    newbin = num / denB
    pred = is_peak & (newbin >= 0.0) & (newbin <= 2.0)
    bins = jnp.arange(ORI_NBINS, dtype=jnp.float32)
    prev_idx = jnp.where(bins == 0, ORI_NBINS - 1.0, bins - 1.0)
    refined = jnp.where(pred, prev_idx + newbin, -1.0)
    yval = jnp.where(pred, -(num * num) / (4.0 * denB) + prev, -jnp.inf)

    top_val, top_idx = jax.lax.top_k(yval, max_count)
    best = top_val[:, :1]
    accept = (top_val >= 0.8 * best) & jnp.isfinite(top_val) \
        & valid[:, None]

    chosen = jnp.take_along_axis(refined, top_idx, axis=-1)
    chosen = jnp.where(chosen >= ORI_NBINS, chosen - ORI_NBINS, chosen)
    th = M_PI2 * chosen / ORI_NBINS - math.pi

    num_ori = jnp.sum(accept.astype(jnp.int32), axis=-1)
    orientations = jnp.where(accept, th, 0.0)
    return num_ori, orientations
