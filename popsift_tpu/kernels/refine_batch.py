"""Pallas TPU kernel: batched 3x3x3 DoG neighbourhood extraction, v2.

Processes candidates in groups of 16 per grid step: 16 aligned slabs are
DMA'd into a double-buffered VMEM scratch while the previous group is
extracted with fully-vectorised masked reductions (full VPU lanes),
removing the per-candidate loop overhead of kernels/refine.py.

Layout: out[g] is a (16, 9, 128) block; out[g, j, (dz+1)*3+(dy+1), dx+1]
holds the neighbour value for candidate g*16+j.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16


def _kernel(za_ref, ya_ref, xa_ref, act_ref, dog_ref, dy_ref, dx_ref,
            out_ref, slabs, sems):
    g = pl.program_id(0)
    n_groups = pl.num_programs(0)

    def mk(i, slot, j):
        return pltpu.make_async_copy(
            dog_ref.at[pl.ds(za_ref[i], 3),
                       pl.ds(pl.multiple_of(ya_ref[i], 8), 16),
                       pl.ds(pl.multiple_of(xa_ref[i], 128), 256)],
            slabs.at[slot, j],
            sems.at[slot, j],
        )

    # DMAs are skipped for inactive slots (already-converged candidates on
    # Newton iterations >= 2, invalid padding slots): the slab then holds
    # stale data whose extracted values are discarded downstream.  DMA
    # issue/latency dominates this kernel, so the gating — not the
    # extraction arithmetic — is what the refinement loop's cost scales by.
    def start_group(gg, slot):
        for j in range(GROUP):
            i = gg * GROUP + j

            @pl.when(act_ref[i] != 0)
            def _():
                mk(i, slot, j).start()

    def wait_group(gg, slot):
        for j in range(GROUP):
            i = gg * GROUP + j

            @pl.when(act_ref[i] != 0)
            def _():
                mk(i, slot, j).wait()

    @pl.when(g == 0)
    def _():
        start_group(0, 0)

    @pl.when(g + 1 < n_groups)
    def _():
        start_group(g + 1, (g + 1) % 2)

    # whole-group skip: on Newton iterations >= 2 nearly every group has
    # zero active candidates, and the masked-sum extraction below — not
    # the DMAs — is what dominates this kernel (device trace: ~0.3 ms per
    # full pass).  The output block then keeps stale values, which the
    # refinement loop discards for inactive slots.
    base = g * GROUP
    group_active = act_ref[base]
    for j in range(1, GROUP):
        group_active = group_active | act_ref[base + j]

    @pl.when(group_active != 0)
    def _():
        wait_group(g, g % 2)

        s = slabs[g % 2].reshape(GROUP, 48, 256)
        dy0 = dy_ref[0].reshape(GROUP, 1, 1)  # block (1, GROUP, 1) int32
        dx0 = dx_ref[0].reshape(GROUP, 1, 1)

        rowio = jax.lax.broadcasted_iota(jnp.int32, (1, 48, 1), 1)
        colio = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 256), 2)

        # accumulate the (GROUP, 9, 128) result in registers, single store
        res = jnp.zeros((GROUP, 9, 128), jnp.float32)
        oio_r = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 9, 128), 1)
        oio_c = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 9, 128), 2)
        for r in range(9):
            target = 16 * (r // 3) + dy0 + (r % 3)      # (GROUP,1,1)
            G = jnp.sum(jnp.where(rowio == target, s, 0.0),
                        axis=1, keepdims=True)           # (GROUP,1,256)
            for c in range(3):
                cmask = colio == dx0 + c                 # (GROUP,1,256)
                val = jnp.sum(jnp.where(cmask, G, 0.0), axis=2,
                              keepdims=True)             # (GROUP,1,1)
                res = jnp.where((oio_r == r) & (oio_c == c), val, res)
        out_ref[0] = res


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather27_batch_pallas(dog_padded, za, ya, xa, dy0, dx0, active,
                          interpret: bool = False):
    n = za.shape[0]
    assert n % GROUP == 0
    n_groups = n // GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, GROUP, 1), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, 1), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GROUP, 9, 128), lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, GROUP, 3, 16, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, GROUP))],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, GROUP, 9, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(za.astype(jnp.int32), ya.astype(jnp.int32), xa.astype(jnp.int32),
      active.astype(jnp.int32), dog_padded,
      dy0.astype(jnp.int32).reshape(n_groups, GROUP, 1),
      dx0.astype(jnp.int32).reshape(n_groups, GROUP, 1))
    return out.reshape(n, 9, 128)
