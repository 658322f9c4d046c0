"""Pallas TPU kernel: batched 3x3x3 DoG neighbourhood extraction.

Newton refinement (s_extrema.cu:364-445) reads a 27-point neighbourhood
per candidate per iteration.  XLA lowers that to a generic gather — the
slowest stage of the whole pipeline on TPU.  This kernel instead DMAs a
tile-aligned (3, 16, 256) slab per candidate and extracts the 27 values
with two tiny one-hot matmuls (MXU), writing a (9, 128) block whose
[:, :3] columns hold p(dz, dy, dx) = out[i, (dz+1)*3 + (dy+1), dx+1].

The caller pads the DoG to (L, Hp>=16 mult 8, Wp>=256 mult 128) and
passes clamped aligned origins; candidate coordinates stay >= 1 away from
borders by construction (detection excludes borders; refinement bounds
moves), so the slab always covers the neighbourhood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 8


def _kernel(za_ref, ya_ref, xa_ref, dy_ref, dx_ref, act_ref, dog_ref,
            out_ref, slab, obuf, sems, osems):
    n = out_ref.shape[0]

    def mk(i, slot):
        return pltpu.make_async_copy(
            dog_ref.at[pl.ds(za_ref[i], 3),
                       pl.ds(pl.multiple_of(ya_ref[i], 8), 16),
                       pl.ds(pl.multiple_of(xa_ref[i], 128), 256)],
            slab.at[slot],
            sems.at[slot],
        )

    def start(i, slot):
        @pl.when(act_ref[i] != 0)
        def _():
            mk(i, slot).start()

    def mk_out(i, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], out_ref.at[i], osems.at[slot])

    # prefetch distance is _DEPTH-1, NOT _DEPTH: slot (i+_DEPTH)%_DEPTH ==
    # i%_DEPTH would overwrite the slab this iteration is about to read
    for i in range(min(_DEPTH - 1, n)):
        start(i, i % _DEPTH)

    def body(i, _):
        @pl.when(i + _DEPTH - 1 < n)
        def _():
            start(i + _DEPTH - 1, (i + _DEPTH - 1) % _DEPTH)

        @pl.when(act_ref[i] != 0)
        def _():
            mk(i, i % _DEPTH).wait()

        s = slab[i % _DEPTH].reshape(48, 256)
        dy0 = dy_ref[i]
        dx0 = dx_ref[i]

        # exact masked selection (bit-identical to the source values; the
        # MXU's bf16 passes would round them)
        # rows: for r in 0..8 pick slab row 16*(r//3) + dy0 + r%3
        rowio = jax.lax.broadcasted_iota(jnp.int32, (48, 256), 0)
        G = jnp.stack([
            jnp.sum(jnp.where(rowio == 16 * (r // 3) + dy0 + (r % 3),
                              s, 0.0), axis=0)
            for r in range(9)
        ])  # (9, 256)

        # columns: roll the target column window to lane 0 and keep the
        # first 3 lanes
        colio = jax.lax.broadcasted_iota(jnp.int32, (9, 256), 1)
        sel = [jnp.sum(jnp.where(colio == dx0 + c, G, 0.0), axis=1,
                       keepdims=True) for c in range(3)]
        vals = jnp.concatenate(sel, axis=1)                     # (9, 3)
        D = jnp.pad(vals, ((0, 0), (0, 125)))                    # (9, 128)

        # write-back via double-buffered VMEM -> HBM DMA
        oslot = i % 2

        @pl.when(i >= 2)
        def _():
            mk_out(i - 2, oslot).wait()

        obuf[oslot] = D
        mk_out(i, oslot).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    @pl.when(n >= 2)
    def _():
        mk_out(n - 2, (n - 2) % 2).wait()

    @pl.when(n >= 1)
    def _():
        mk_out(n - 1, (n - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather27_pallas(dog_padded, za, ya, xa, dy0, dx0, active,
                     interpret: bool = False):
    n = za.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((_DEPTH, 3, 16, 256), jnp.float32),
                        pltpu.VMEM((2, 9, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((_DEPTH,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 9, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(za.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      dy0.astype(jnp.int32), dx0.astype(jnp.int32),
      active.astype(jnp.int32), dog_padded)


def gather27(dog_padded: jnp.ndarray, n_x, n_y, n_z, active=None,
             interpret: bool | None = None) -> jnp.ndarray:
    """Batched 27-point neighbourhood read around (z, y, x) centres.

    dog_padded : (L, Hp, Wp) with Hp multiple of 8 (>= 16) and Wp multiple
    of 128 (>= 256).  Returns (N, 3, 3, 3) with [dz, dy, dx] offsets.

    ``active`` (optional bool (N,)): slots marked inactive skip their DMA
    entirely and return stale/undefined values — callers must mask their
    results (the Newton loop does: converged slots keep their prior
    state).  DMA issue cost dominates, so this makes iterations 2..5 of
    the refinement loop nearly free once most candidates converge.
    """
    L, Hp, Wp = dog_padded.shape
    z = jnp.clip(n_z, 1, L - 2)
    y = jnp.clip(n_y, 1, Hp - 2)
    x = jnp.clip(n_x, 1, Wp - 2)
    za = z - 1
    ya = jnp.minimum((y - 1) // 8 * 8, Hp - 16)
    xa = jnp.minimum((x - 1) // 128 * 128, Wp - 256)
    dy0 = (y - 1) - ya
    dx0 = (x - 1) - xa
    if active is None:
        act = jnp.ones(z.shape, jnp.int32)
    else:
        act = active.astype(jnp.int32)

    from .dispatch import kernel_interpret, pallas_enabled
    # explicit interpret=True forces the Pallas path in interpret mode
    # (kernel unit tests on CPU); debug mode does the same globally
    interpret = kernel_interpret(interpret)
    use_pallas = pallas_enabled() or interpret
    # the scalar-prefetch arrays must fit in SMEM (1 MiB)
    if z.shape[0] > 16384:
        use_pallas = False
    if use_pallas:
        from .refine_batch import GROUP, gather27_batch_pallas
        if z.shape[0] % GROUP == 0:
            out = gather27_batch_pallas(dog_padded, za, ya, xa, dy0, dx0,
                                        act, interpret=bool(interpret))
        else:
            out = _gather27_pallas(dog_padded, za, ya, xa, dy0, dx0,
                                   act, interpret=bool(interpret))
        return out[:, :, :3].reshape(-1, 3, 3, 3)

    # XLA fallback: flat gather
    flat = dog_padded.reshape(-1)
    dz = jnp.repeat(jnp.arange(-1, 2, dtype=z.dtype), 9)[None, :]
    dy = jnp.tile(jnp.repeat(jnp.arange(-1, 2, dtype=z.dtype), 3),
                  3)[None, :]
    dx = jnp.tile(jnp.arange(-1, 2, dtype=z.dtype), 9)[None, :]
    idx = ((z[:, None] + dz) * Hp + (y[:, None] + dy)) * Wp \
        + (x[:, None] + dx)
    return flat[idx].reshape(-1, 3, 3, 3)
