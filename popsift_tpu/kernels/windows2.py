"""Pallas TPU kernel: batched window extraction with exact origins, v2.

kernels/windows.py returns (win+8, win+128)-sized windows because DMA
offsets must be tile-aligned; downstream math then runs on ~2x more pixels
than the logical window.  This version DMAs the aligned slab into VMEM,
rotates lanes by the per-slot sub-tile offset (dynamic lane roll), and
emits a (win+8, 128) window whose column 0 is the exact requested x origin
— halving downstream compute and HBM traffic for every window consumer.

Requires win <= 120 (fits one 128-lane tile after rotation); rows keep the
8-aligned origin (the row surplus is small and remains masked downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 4


def rolled_window_dims(win: int) -> tuple[int, int]:
    assert win <= 120, "rolled windows require win <= 120"
    return -(-(win + 7) // 8) * 8, 128


def _kernel(lp_ref, ya_ref, xa_ref, dx_ref, field_ref, out_ref,
            slabs, sems):
    g = pl.program_id(0)
    n = pl.num_programs(0)
    win_y = out_ref.shape[1]

    def mk(i, slot):
        return pltpu.make_async_copy(
            field_ref.at[lp_ref[i],
                         pl.ds(pl.multiple_of(ya_ref[i], 8), win_y),
                         pl.ds(pl.multiple_of(xa_ref[i], 128), 256)],
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

    # rotate the requested origin to lane 0, keep the first 128 lanes
    rolled = pltpu.roll(slabs[g % _DEPTH], -dx_ref[g], 1)
    out_ref[0] = rolled[:, :128]


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def gather_windows_rolled_pallas(field, lpos, ya, xa, dx0, win: int,
                                 interpret: bool = False):
    n = lpos.shape[0]
    win_y, win_x = rolled_window_dims(win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, win_y, win_x), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, win_y, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,))],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, win_y, win_x), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lpos.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      dx0.astype(jnp.int32), field)


def gather_windows_exact(field: jnp.ndarray, lpos: jnp.ndarray,
                         y0: jnp.ndarray, x0: jnp.ndarray, win: int):
    """Batched (win+8, 128) windows whose lane 0 is exactly x0; rows start
    at the 8-aligned origin ya (returned).  Backend-dispatching.

    Returns (windows, ya) — callers compute row coordinates from ya and
    column coordinates from x0 directly.
    """
    win_y, win_x = rolled_window_dims(win)
    ya = ((y0 // 8) * 8).astype(jnp.int32)
    xa = ((x0 // 128) * 128).astype(jnp.int32)
    dx0 = (x0 - xa).astype(jnp.int32)

    from .dispatch import kernel_interpret, pallas_enabled
    if pallas_enabled():
        return (gather_windows_rolled_pallas(field, lpos, ya, xa, dx0, win,
                                             interpret=kernel_interpret()),
                ya)

    def one(l, y, x):
        return jax.lax.dynamic_slice(field, (l, y, x), (1, win_y, win_x))[0]

    return jax.vmap(one)(lpos, ya, x0.astype(jnp.int32)), ya
