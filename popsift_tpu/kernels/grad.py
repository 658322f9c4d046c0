"""Pallas TPU kernel: dense gradient field, written once, unpadded.

The XLA formulation (ops/gradients.py) costs ~4.3 ms per 1080p image at
octave 0: jnp.pad(stack) materialises an edge-padded copy, the four
shifted slices re-read it, and the [mag; theta] concat plus the window
pads add two more full-array round trips (the padded octave-0 field is
~0.5 GB).  This kernel writes the field in ONE pass at its byte floor:
per (level, row-block) grid step it DMAs a slab of the edge-padded
blurred stack, computes central differences + magnitude + angle in VMEM
(the gradient math of s_gradiant.h:55-69), and stores the two planes of
an INTERLEAVED field — ``field[2l] = mag_l``, ``field[2l+1] = theta_l``
— with no window padding at all.  Window consumers (kernels/binwin.py,
kernels/windows2.py) already clamp their DMA origins into the array, so
the pads were only ever finite filler.

Angle uses the same Cephes-style polynomial atan2 as the stack kernels
(kernels/binwin.py:_atan2_poly; Mosaic has no atan2 lowering): max error
~2e-7 rad, far below the 36-bin (0.17 rad) granularity downstream.
Magnitude uses sqrt(dx^2+dy^2); gradients of [0,255]-scaled images
cannot overflow f32, so jnp.hypot's scaling is unnecessary.

Output dims are (2L, round8(H), round128(W)); the alignment surplus
carries edge-replicated values (finite, masked by every consumer's
image-coordinate gates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 2


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def _grad_kernel(src_ref, out_ref, slabs, sems, *, nb: int, bh: int,
                 wp: int):
    """Grid: (L * nb,).  src is (L, Hp+16, Wp+256) edge-padded; out is
    (2L, Hp, Wp) with out[2l]=mag_l, out[2l+1]=theta_l."""
    g = pl.program_id(0)
    n = pl.num_programs(0)
    rows = bh + 16

    def mk(k, slot):
        return pltpu.make_async_copy(
            src_ref.at[k // nb, pl.ds(pl.multiple_of((k % nb) * bh, 8),
                                      rows), :],
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
    slab = slabs[g % _DEPTH]

    # image row r of this block sits at slab row r+8, col c at c+128
    xp = slab[8:8 + bh, 129:129 + wp]
    xm = slab[8:8 + bh, 127:127 + wp]
    yp = slab[9:9 + bh, 128:128 + wp]
    ym = slab[7:7 + bh, 128:128 + wp]
    dx = xp - xm
    dy = yp - ym

    from .binwin import _atan2_poly
    out_ref[0] = jnp.sqrt(dx * dx + dy * dy)
    out_ref[1] = _atan2_poly(dy, dx)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _grad_field_pallas(padded, h: int, w: int, interpret: bool = False):
    L = padded.shape[0]
    bh = 32 if h >= 32 else _round8(max(h, 8))
    nb = -(-h // bh)
    hp = nb * bh
    wp = _round128(w)
    grid = (L * nb,)

    out = pl.pallas_call(
        functools.partial(_grad_kernel, nb=nb, bh=bh, wp=wp),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (2, bh, wp), lambda g: (g // nb, g % nb, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * L, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_DEPTH, bh + 16, wp + 256),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(padded)
    return out


def grad_field_ok(stack_shape) -> bool:
    """The kernel needs one 128-lane DMA tile of width surplus and at
    least one 8-row block; below that the XLA padded path is cheaper
    anyway (the whole octave is a few hundred KB)."""
    L, H, W = stack_shape
    return H >= 32 and W >= 129


def gradient_field_fused(stack: jnp.ndarray) -> jnp.ndarray:
    """Unpadded interleaved gradient field of one octave stack.

    stack : (L, H, W) blurred levels.  Returns (2L, round8(H),
    round128(W)) f32 with ``field[2l] = mag_l``, ``field[2l+1] =
    theta_l``; the alignment surplus rows/cols carry edge-replicated
    values and must be masked by image-coordinate gates (every window
    consumer already does).
    """
    L, H, W = stack.shape
    bh = 32 if H >= 32 else _round8(max(H, 8))
    hp = (-(-H // bh)) * bh
    wp = _round128(W)
    padded = jnp.pad(stack, ((0, 0), (8, hp - H + 8), (128, wp - W + 128)),
                     mode="edge")

    from .dispatch import kernel_interpret
    return _grad_field_pallas(padded, H, W, interpret=kernel_interpret())
