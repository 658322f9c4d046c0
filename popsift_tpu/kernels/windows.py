"""Pallas TPU kernel: batched fixed-size window extraction.

The orientation and descriptor stages need, per keypoint, a (win, win)
window of the per-octave gradient/image fields at a dynamic offset — the
TPU-hostile part of SIFT (SURVEY.md §7 "gather-heavy kernels").  XLA lowers
a vmapped dynamic_slice to a generic gather, which TPUs execute very
slowly.  The DMA engines, however, copy strided 2-D windows at full HBM
bandwidth; this kernel issues one async copy per keypoint with a 2-deep
pipeline (double-buffered semaphores), replacing the reference's
texture-cache reads (s_orientation.cu:124-162, s_desc_loop.cu:78-121).

TPU arrays are stored (8, 128)-tiled even in HBM and Mosaic requires
dynamic slice offsets to be tile-aligned, so the kernel gathers windows
whose starts are rounded *down* to tile boundaries and whose extent is one
tile larger: (win+8, win+128).  Callers compute per-pixel coordinates from
the aligned origin; their validity masks (radius gates, |u|<1 triangle
weights, image borders) already exclude the extra pixels, so alignment
changes no results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def aligned_window_dims(win: int) -> tuple[int, int]:
    """(rows, cols) of the aligned gather for a logical win x win window.

    Both the start offsets *and* the slice extents must be multiples of the
    (8, 128) tile; the extents must additionally cover win plus the worst
    alignment loss (7 rows / 127 cols)."""
    win_y = -(-(win + 7) // 8) * 8
    win_x = -(-(win + 127) // 128) * 128
    return win_y, win_x


def align_starts(y0: jnp.ndarray, x0: jnp.ndarray):
    """Round starts down to the (8, 128) tile grid."""
    ya = (y0 // 8) * 8
    xa = (x0 // 128) * 128
    return ya.astype(jnp.int32), xa.astype(jnp.int32)


_DEPTH = 8  # outstanding DMA copies


def _gather_kernel(win_y: int, win_x: int,
                   lp_ref, y0_ref, x0_ref, field_ref, out_ref, sems):
    n = out_ref.shape[0]

    def mk(i, slot):
        y = pl.multiple_of(y0_ref[i], 8)
        x = pl.multiple_of(x0_ref[i], 128)
        return pltpu.make_async_copy(
            field_ref.at[lp_ref[i], pl.ds(y, win_y), pl.ds(x, win_x)],
            out_ref.at[i],
            sems.at[slot],
        )

    # NOTE: sharing a semaphore slot between DMA i and i+_DEPTH is safe
    # *here* because the copies go HBM->HBM with disjoint destinations and
    # nothing reads the data inside the kernel; every started copy is
    # awaited exactly once so the semaphores balance.  Kernels that consume
    # a VMEM slot must prefetch at distance _DEPTH-1 instead (see
    # kernels/refine.py).
    warm = min(_DEPTH, n)
    for i in range(warm):
        mk(i, i % _DEPTH).start()

    def body(i, _):
        @pl.when(i + _DEPTH < n)
        def _():
            mk(i + _DEPTH, (i + _DEPTH) % _DEPTH).start()

        mk(i, i % _DEPTH).wait()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def gather_windows_aligned_pallas(field: jnp.ndarray, lpos: jnp.ndarray,
                                  ya: jnp.ndarray, xa: jnp.ndarray,
                                  win: int,
                                  interpret: bool = False) -> jnp.ndarray:
    """Extract aligned (win+8, win+128) windows from a (L, Hp, Wp) field.

    ya/xa must be tile-aligned (see :func:`align_starts`); the caller
    guarantees ya+win+8 <= Hp and xa+win+128 <= Wp.
    Returns (N, win+8, win+128).
    """
    n = lpos.shape[0]
    win_y, win_x = aligned_window_dims(win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, win_y, win_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, win_y, win_x), field.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lpos.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      field)


def _use_pallas() -> bool:
    from .dispatch import pallas_enabled
    return pallas_enabled()


def gather_windows_aligned(field: jnp.ndarray, lpos: jnp.ndarray,
                           y0: jnp.ndarray, x0: jnp.ndarray, win: int):
    """Backend-dispatching aligned batched window gather.

    Returns (windows (N, win+8, win+128), ya (N,), xa (N,)) where ya/xa are
    the aligned origins the windows were read from.

    TPU: DMA kernel above.  Other backends: vmapped dynamic_slice (same
    aligned semantics so results are backend-identical).
    """
    ya, xa = align_starts(y0, x0)
    win_y, win_x = aligned_window_dims(win)
    if _use_pallas():
        from .dispatch import kernel_interpret
        return (gather_windows_aligned_pallas(field, lpos, ya, xa, win,
                                              interpret=kernel_interpret()),
                ya, xa)

    def one(l, y, x):
        return jax.lax.dynamic_slice(field, (l, y, x), (1, win_y, win_x))[0]

    return jax.vmap(one)(lpos, ya, xa), ya, xa
