"""Grid filtering: cap the total number of extrema with per-cell budgets.

Replaces the Thrust pipeline of the reference
(/root/reference/src/popsift/s_filtergrid.cu:110-325) with jnp sorts and
segment sums over the fixed-capacity extremum buffers:

* every extremum carries a grid-cell id (filter_grid_size^2 cells, computed
  during detection, s_extrema.cu:499) and a cross-octave scale
  sigma * 2^octave (FunctionExtractCell, s_filtergrid.cu:56-71),
* cells are ranked by population; the cell budget ``newlimit`` is derived
  exactly like the host-side computation (s_filtergrid.cu:225-263,
  including the C++ integer division),
* within each cell, extrema are kept in the configured scale order
  (GridFilterMode; "random" keeps raster order — the reference's random
  mode is explicitly nondeterministic, sift_conf.h:116, so any order is
  conforming) and the losers are dropped (FunctionDisableExtremum,
  s_filtergrid.cu:85-95).

The whole thing is branchless under jit; the reference's host-side trigger
"only if budget*1.1 < total" (s_orientation.cu:378-383) becomes a
``jnp.where`` select on the keep mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridFilterMode
from .extrema import InitialExtrema


def grid_filter_keep_masks(exts: list[InitialExtrema],
                           budget: int,
                           grid_size: int,
                           mode: GridFilterMode) -> list[jnp.ndarray]:
    """Compute per-octave keep masks enforcing the extrema budget.

    exts: per-octave fixed-capacity extremum buffers.
    Returns a list of bool masks aligned with each octave's slots.
    """
    n_cells = grid_size * grid_size

    cells = []
    scales = []
    valids = []
    octave_of = []
    caps = []
    for o, e in enumerate(exts):
        caps.append(e.valid.shape[0])
        cells.append(jnp.clip(e.cell, 0, n_cells - 1))
        scales.append(e.sigma * (2.0 ** o))
        valids.append(e.valid)
        octave_of.append(jnp.full_like(e.cell, o))

    cell = jnp.concatenate(cells)
    scale = jnp.concatenate(scales)
    valid = jnp.concatenate(valids)

    total = jnp.sum(valid.astype(jnp.int32))

    # sort by (cell, scale-order); invalid slots sort last via cell=n_cells
    sort_cell = jnp.where(valid, cell, n_cells)
    if mode == GridFilterMode.LARGEST_SCALE_FIRST:
        skey = -scale
    elif mode == GridFilterMode.SMALLEST_SCALE_FIRST:
        skey = scale
    else:
        # RandomScale: keep raster order within the cell (stable argsort)
        skey = jnp.zeros_like(scale)
    order = jnp.lexsort((skey, sort_cell))  # stable, cell-major

    # per-cell populations (valid only)
    onehot = (cell[:, None] == jnp.arange(n_cells)[None, :]) \
        & valid[:, None]
    counts = jnp.sum(onehot.astype(jnp.int32), axis=0)      # (n_cells,)

    # s_filtergrid.cu:225-257: sort cells by count ascending, sumup_i =
    # count_i*(n-1-i) + prefixsum_i, ct = #cells with sumup > budget
    cnt_sorted = jnp.sort(counts)
    ps = jnp.cumsum(cnt_sorted)
    rev = jnp.arange(n_cells - 1, -1, -1)
    sumup = cnt_sorted * rev + ps
    ct = jnp.sum((sumup > budget).astype(jnp.int32))
    ct_safe = jnp.maximum(ct, 1)

    # tail average over the ct most-populated cells
    tail_mask = jnp.arange(n_cells) >= (n_cells - ct_safe)
    tailaverage = jnp.sum(jnp.where(tail_mask, cnt_sorted, 0)) \
        .astype(jnp.float32) / ct_safe.astype(jnp.float32)

    # C++ integer division (s_filtergrid.cu:257)
    int_div = (total - budget) // ct_safe
    newlimit = jnp.ceil(tailaverage - int_div.astype(jnp.float32)) \
        .astype(jnp.int32)

    limits = jnp.minimum(counts, newlimit)                  # per-cell budget

    # rank of each extremum within its cell in the chosen order
    cell_sorted = sort_cell[order]
    offsets = jnp.cumsum(counts) - counts                   # per-cell start
    pos = jnp.arange(cell.shape[0])
    safe_cell = jnp.clip(cell_sorted, 0, n_cells - 1)
    rank_sorted = pos - offsets[safe_cell]
    keep_sorted = (cell_sorted < n_cells) & \
        (rank_sorted < limits[safe_cell])

    keep = jnp.zeros_like(valid).at[order].set(keep_sorted)

    # trigger: only filter if budget*1.1 < total (s_orientation.cu:380)
    trigger = (budget * 1.1 < total.astype(jnp.float32))
    keep = jnp.where(trigger, keep & valid, valid)

    out = []
    start = 0
    for cap in caps:
        out.append(keep[start:start + cap])
        start += cap
    return out


def recompact(e: InitialExtrema, keep: jnp.ndarray) -> InitialExtrema:
    """Compact surviving extrema back to a prefix of the buffer (the analog
    of the copy_if writeback, s_filtergrid.cu:290-318)."""
    cap = keep.shape[0]
    incl = jnp.cumsum(keep.astype(jnp.int32))
    idx = incl - 1
    dest = jnp.where(keep, idx, cap)

    def scat(vals, fill):
        return jnp.full((cap,), fill, vals.dtype).at[dest].set(
            vals, mode="drop")

    count = incl[-1]
    return InitialExtrema(
        xpos=scat(e.xpos, jnp.float32(0)),
        ypos=scat(e.ypos, jnp.float32(0)),
        lpos=scat(e.lpos, jnp.int32(1)),
        sigma=scat(e.sigma, jnp.float32(0)),
        cell=scat(e.cell, jnp.int32(0)),
        valid=jnp.arange(cap, dtype=jnp.int32) < count,
        count=count,
        overflow=e.overflow,
    )
