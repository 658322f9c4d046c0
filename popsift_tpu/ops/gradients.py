"""Dense gradient (magnitude, angle) fields.

The reference computes gradients on demand inside the orientation and
descriptor kernels (s_gradiant.h:34-69, central differences + hypot/atan2)
and explicitly documents the trade-off of not precomputing
(s_gradiant.h:19-33).  On TPU the dense precompute is the right trade
(SURVEY.md §7 "hard parts"): it turns every later use into a pure gather of
two floats instead of four texture reads + transcendentals.
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


def padded_gradient_field(stack: jnp.ndarray, pad_y: int,
                          pad_x: int) -> jnp.ndarray:
    """Zero-padded ``[mag; theta]`` concat along the level axis.

    This is the shared window-gather source for the orientation AND
    descriptor stages: one materialisation per octave instead of one
    pad+concat copy per stage (each a full-array HBM round trip — the
    octave-0 copy alone is ~0.5 GB).  Pad values are never *used* (every
    consumer masks to image bounds) but must be finite.
    """
    mag, theta = gradient_fields(stack)
    return jnp.pad(jnp.concatenate([mag, theta], axis=0),
                   ((0, 0), (pad_y, pad_y), (pad_x, pad_x)))
