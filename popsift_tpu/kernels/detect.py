"""Pallas TPU kernel: dense 26-neighbour DoG extremum detection.

The XLA formulation of the strict 26-neighbour test needs lane-shifted
views of the DoG volume; every lane-misaligned operand lowers to a full
relayout copy of the octave (the 160 MB octave-0 volume several times
over — ~4 ms of the fused program at 1080p).  Here each (R, C) tile is
DMA'd once with an 8-row/128-lane margin and all 26 shifted variants are
produced with in-register ``pltpu.roll``s; roll wraparound only pollutes
the margin, never the tile interior that is written out.

The caller pads the DoG to ``(L, 8 + nR*R + 8, 128 + nC*C + 128)`` (pad
values are never read for valid outputs: border pixels are excluded from
the mask exactly like the reference's offset launch grid,
s_extrema.cu:506-517).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SiftMode


def _tile_dims(h: int, w: int) -> tuple[int, int]:
    # (R+16, C+256) f32 slabs x (levels+2) layers, double-buffered, plus
    # the shift temporaries must fit VMEM: (120, 512) keeps the working
    # set ~8 MB.
    R = 120 if h >= 240 else max(8, -(-h // 8) * 8)
    C = 512 if w >= 512 else max(128, -(-w // 128) * 128)
    return R, C


def _kernel(dog_ref, out_ref, slabs, sems, *, levels, R, C, nC, h, w,
            gate_lo, border, packed=False):
    k = pl.program_id(0)
    n = pl.num_programs(0)
    L = levels + 2

    def origin(kk):
        return (kk // nC) * R, (kk % nC) * C

    def mk(kk, slot):
        r0, c0 = origin(kk)
        return pltpu.make_async_copy(
            dog_ref.at[:, pl.ds(r0, R + 16), pl.ds(c0, C + 256)],
            slabs.at[slot],
            sems.at[slot],
        )

    @pl.when(k == 0)
    def _():
        mk(0, 0).start()

    @pl.when(k + 1 < n)
    def _():
        mk(k + 1, (k + 1) % 2).start()

    mk(k, k % 2).wait()

    # all shift variants are in-register 2-D rolls per layer (3-D rolls
    # stall the Mosaic compiler); wraparound only pollutes the margin
    def up(a):
        return pltpu.roll(a, (R + 16) - 1, 0)

    def dn(a):
        return pltpu.roll(a, 1, 0)

    def lf(a):
        return pltpu.roll(a, (C + 256) - 1, 1)

    def rt(a):
        return pltpu.roll(a, 1, 1)

    s = [slabs[k % 2, z] for z in range(levels + 2)]

    # image-coordinate border exclusion for this tile
    r0, c0 = origin(k)
    yy = jax.lax.broadcasted_iota(jnp.int32, (R + 16, C + 256), 0) \
        + (r0 - 8)
    xx = jax.lax.broadcasted_iota(jnp.int32, (R + 16, C + 256), 1) \
        + (c0 - 128)
    b = border
    inb = (xx >= b) & (xx < w - b) & (yy >= b) & (yy < h - b)

    for op, name in ((jnp.maximum, "mx"), (jnp.minimum, "mn")):
        rowe = [op(op(a, lf(a)), rt(a)) for a in s]
        plane = [op(op(r, up(r)), dn(r)) for r in rowe]
        if name == "mx":
            rowe_mx, plane_mx = rowe, plane
        else:
            rowe_mn, plane_mn = rowe, plane

    for z in range(1, levels + 1):
        c = s[z]
        same_mx = jnp.maximum(
            jnp.maximum(up(rowe_mx[z]), dn(rowe_mx[z])),
            jnp.maximum(lf(c), rt(c)))
        nb_mx = jnp.maximum(jnp.maximum(plane_mx[z - 1], plane_mx[z + 1]),
                            same_mx)
        same_mn = jnp.minimum(
            jnp.minimum(up(rowe_mn[z]), dn(rowe_mn[z])),
            jnp.minimum(lf(c), rt(c)))
        nb_mn = jnp.minimum(jnp.minimum(plane_mn[z - 1], plane_mn[z + 1]),
                            same_mn)
        mask = ((c > nb_mx) | (c < nb_mn)) \
            & (jnp.abs(c) >= gate_lo) & inb
        if not packed:
            out_ref[z - 1] = mask[8:8 + R, 128:128 + C]
        else:
            # bit-pack along sublanes: word (g, x) carries mask rows
            # 32g..32g+31 at lane x (weighted u32 sum over the reshaped
            # 32-row groups; each bit is a distinct power of two so the
            # sum is exact)
            # i32 arithmetic (Pallas lacks u32 reductions); the weighted
            # sum of distinct bit powers is exact mod 2^32 either way
            m = mask[8:8 + R, 128:128 + C].astype(jnp.int32)
            m3 = m.reshape(R // 32, 32, C)
            wts = jnp.left_shift(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1))
            words = jnp.sum(m3 * wts, axis=1,
                            dtype=jnp.int32).view(jnp.uint32)
            g = R // 32
            out_ref[0, (z - 1) * g:z * g] = words


@functools.partial(jax.jit,
                   static_argnames=("levels", "h", "w", "gate_lo",
                                    "border", "nR", "nC", "interpret"))
def _detect_pallas(dogp, levels: int, h: int, w: int, gate_lo: float,
                   border: int, nR: int = 0, nC: int = 0,
                   interpret: bool = False):
    L = levels + 2
    R, C = _tile_dims(h, w)
    nR = nR or -(-h // R)
    nC = nC or -(-w // C)
    kern = functools.partial(_kernel, levels=levels, R=R, C=C, nC=nC,
                             h=h, w=w, gate_lo=gate_lo, border=border)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nR * nC,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((levels, R, C),
                               lambda k: (0, k // nC, k % nC),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, L, R + 16, C + 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((levels, nR * R, nC * C),
                                       jnp.bool_),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dogp)
    return out[:, :h, :w]


def _tile_dims_packed(h: int, w: int) -> tuple[int, int]:
    # like _tile_dims but R must be a multiple of 32 (sublane bit-packing)
    R = 96 if h >= 192 else max(32, -(-h // 32) * 32)
    C = 512 if w >= 512 else max(128, -(-w // 128) * 128)
    return R, C


@functools.partial(jax.jit,
                   static_argnames=("levels", "h", "w", "gate_lo",
                                    "border", "nR", "nC", "interpret"))
def _detect_packed(dogp, levels: int, h: int, w: int, gate_lo: float,
                   border: int, nR: int = 0, nC: int = 0,
                   interpret: bool = False):
    L = levels + 2
    R, C = _tile_dims_packed(h, w)
    nR = nR or -(-h // R)
    nC = nC or -(-w // C)
    kern = functools.partial(_kernel, levels=levels, R=R, C=C, nC=nC,
                             h=h, w=w, gate_lo=gate_lo, border=border,
                             packed=True)
    g = R // 32
    # u32 out blocks must keep their last two dims (8, 128)-tileable, so
    # the per-tile words go out as (1, levels*g, C) with the tile-row as
    # the leading dim; one cheap XLA transpose restores (levels, G, Wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nR * nC,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, levels * g, C),
                               lambda k: (k // nC, 0, k % nC),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, L, R + 16, C + 256), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nR, levels * g, nC * C),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dogp)
    return (out.reshape(nR, levels, g, nC * C)
            .transpose(1, 0, 2, 3)
            .reshape(levels, nR * g, nC * C))


def detect_packed_pallas(dog: jnp.ndarray, sift_mode: SiftMode,
                         peak_threshold: float,
                         interpret: bool | None = None,
                         true_dims: tuple | None = None) -> jnp.ndarray:
    """Fused detection + sublane bit-packing.

    Returns a ``(levels, ceil(h/R)*R/32, ceil(w/C)*C)`` uint32 word volume:
    ``words[z, g, x]`` bit ``r`` is the candidate mask at image row
    ``32*g + r``, column ``x`` for searchable DoG layer ``z+1``.  Bits at
    padded rows/columns (``>= h``/``>= w``) are always zero (the in-bounds
    gate).  Consumed by :func:`popsift_tpu.ops.extrema.compact_words` —
    the mask never round-trips HBM as bools.

    ``true_dims=(h, w)``: true image dims when ``dog`` carries the fused
    octave chain's block-alignment surplus.  The surplus values (finite
    edge replicas) take the place of halo-pad zeros directly — the
    in-bounds gate keeps their mask bits zero — so the surplus costs NO
    extra copy (a slice-to-true-dims followed by the halo pad was two
    full-volume copies; XLA does not fuse them).
    """
    L, hp, wp = dog.shape
    h, w = true_dims if true_dims is not None else (hp, wp)
    levels = L - 2
    R, C = _tile_dims_packed(h, w)
    # the grid covers the SURPLUS dims: tiles past the true image only
    # produce gated-out zero bits (a few % extra detect work), which is
    # far cheaper than a slice-to-true-dims copy of the whole volume
    nR = -(-max(h, hp) // R)
    nC = -(-max(w, wp) // C)
    dogp = jnp.pad(dog, ((0, 0), (8, nR * R + 16 - hp - 8),
                         (128, nC * C + 256 - wp - 128)))

    import math
    t = float(peak_threshold)
    if sift_mode == SiftMode.OPENCV:
        gate_lo, border = math.floor(t), 5
    elif sift_mode == SiftMode.VLFEAT:
        gate_lo, border = 0.8 * 2.0 * t, 1
    else:
        gate_lo, border = 1.6 * t, 1
    from .dispatch import kernel_interpret
    return _detect_packed(dogp, levels, h, w, float(gate_lo), border,
                          nR=nR, nC=nC,
                          interpret=kernel_interpret(interpret))


def detect_pallas(dog: jnp.ndarray, sift_mode: SiftMode,
                  peak_threshold: float,
                  interpret: bool | None = None,
                  true_dims: tuple | None = None) -> jnp.ndarray:
    """Dense candidate mask via the tiled roll kernel.

    Numerics identical to the XLA path of
    :func:`popsift_tpu.ops.extrema.detect_candidates` (strict 26-neighbour
    comparison + mode contrast gate + border exclusion).
    ``true_dims``: see :func:`detect_packed_pallas`.
    """
    L, hp, wp = dog.shape
    h, w = true_dims if true_dims is not None else (hp, wp)
    levels = L - 2
    R, C = _tile_dims(h, w)
    nR = -(-max(h, hp) // R)
    nC = -(-max(w, wp) // C)
    dogp = jnp.pad(dog, ((0, 0), (8, nR * R + 16 - hp - 8),
                         (128, nC * C + 256 - wp - 128)))

    import math
    t = float(peak_threshold)
    if sift_mode == SiftMode.OPENCV:
        gate_lo, border = math.floor(t), 5
    elif sift_mode == SiftMode.VLFEAT:
        gate_lo, border = 0.8 * 2.0 * t, 1
    else:
        gate_lo, border = 1.6 * t, 1
    from .dispatch import kernel_interpret
    return _detect_pallas(dogp, levels, h, w, float(gate_lo), border,
                          nR=nR, nC=nC,
                          interpret=kernel_interpret(interpret))
