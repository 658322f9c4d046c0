"""Dense gradient (magnitude, angle) fields.

The reference computes gradients on demand inside the orientation and
descriptor kernels (s_gradiant.h:34-69, central differences + hypot/atan2)
and explicitly documents the trade-off of not precomputing
(s_gradiant.h:19-33).  On TPU the dense precompute is the right trade
(SURVEY.md §7 "hard parts"): it turns every later use into a pure gather of
two floats instead of four texture reads + transcendentals.

Field layout (round-3): INTERLEAVED along the leading axis —
``field[2l] = mag_l``, ``field[2l+1] = theta_l`` — so one kernel grid
step can write both planes of a level in a single (2, bh, W) block.  On
TPU the field is produced UNPADDED by a fused Pallas kernel
(kernels/grad.py, one HBM pass at the byte floor); window consumers
clamp their DMA origins into the array, which makes the old (pad_y,
pad_x) window padding pure filler.  The padded XLA form remains for
small octaves, non-TPU backends, and consumers that genuinely need
padded coordinates (the XLA fallback gathers) — those re-pad on demand.
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_fields(stack: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level central-difference gradients with clamp borders.

    stack : (L, H, W) blurred levels.
    Returns (mag, theta), each (L, H, W).
    """
    padded = jnp.pad(stack, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = stack.shape[-2], stack.shape[-1]
    dx = padded[:, 1:1 + h, 2:2 + w] - padded[:, 1:1 + h, 0:w]
    dy = padded[:, 2:2 + h, 1:1 + w] - padded[:, 0:h, 1:1 + w]
    mag = jnp.hypot(dx, dy)
    theta = jnp.arctan2(dy, dx)
    return mag, theta


def interleave_field(mag: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """(L, H, W) x2 -> (2L, H, W) with mag_l at 2l, theta_l at 2l+1."""
    L, H, W = mag.shape
    return jnp.stack([mag, theta], axis=1).reshape(2 * L, H, W)


def padded_gradient_field(stack: jnp.ndarray, pad_y: int,
                          pad_x: int) -> jnp.ndarray:
    """Window-padded interleaved field (XLA form).

    Pad values are never *used* (every consumer masks to image bounds)
    but must be finite.
    """
    field = interleave_field(*gradient_fields(stack))
    if pad_y == 0 and pad_x == 0:
        return field
    return jnp.pad(field, ((0, 0), (pad_y, pad_y), (pad_x, pad_x)))


def gradient_field(stack: jnp.ndarray, pad_y: int,
                   pad_x: int) -> jnp.ndarray:
    """Backend-dispatching field builder.

    With zero pads on TPU this is the one-pass Pallas kernel
    (kernels/grad.py); callers choose the pads via
    :func:`popsift_tpu.extract.field_pads` so the producer and all
    consumers agree.
    """
    if pad_y == 0 and pad_x == 0:
        from ..kernels.dispatch import pallas_enabled
        from ..kernels.grad import grad_field_ok, gradient_field_fused
        if pallas_enabled() and grad_field_ok(stack.shape):
            return gradient_field_fused(stack)
    return padded_gradient_field(stack, pad_y, pad_x)
