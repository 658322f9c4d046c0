"""Brute-force descriptor matching, TPU-native.

Replaces the warp-per-descriptor L2 scan of the reference
(/root/reference/src/popsift/features.cu:165-304) with a single MXU matmul
+ top-2 selection: squared L2 distance matrix via
|l|^2 + |r|^2 - 2 l.r^T, best/second-best per row, Lowe ratio test 0.8
(features.cu:225).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def match_brute_force(l_desc: jnp.ndarray, r_desc: jnp.ndarray,
                      l_valid: jnp.ndarray | None = None,
                      r_valid: jnp.ndarray | None = None,
                      ratio: float = 0.8):
    """Match every left descriptor against all right descriptors.

    Returns (best_idx, second_idx, accept, best_dist, second_dist); accept
    is the Lowe ratio test d1/d2 < ratio (features.cu:225).
    """
    ln = jnp.sum(l_desc * l_desc, axis=-1, keepdims=True)       # (N,1)
    rn = jnp.sum(r_desc * r_desc, axis=-1)[None, :]             # (1,M)
    cross = jnp.dot(l_desc, r_desc.T,
                    preferred_element_type=jnp.float32)          # (N,M)
    d2 = jnp.maximum(ln + rn - 2.0 * cross, 0.0)

    if r_valid is not None:
        d2 = jnp.where(r_valid[None, :], d2, jnp.inf)

    # best / second-best (the CUDA kernel's running min pair,
    # features.cu:199-221); argmin keeps the first index on ties like the
    # sequential scan does
    best_idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, best_idx[:, None], axis=-1)[:, 0]
    masked = d2.at[jnp.arange(d2.shape[0]), best_idx].set(jnp.inf)
    second_idx = jnp.argmin(masked, axis=-1)
    second = jnp.take_along_axis(masked, second_idx[:, None], axis=-1)[:, 0]

    accept = best / second < ratio
    if l_valid is not None:
        accept = accept & l_valid
    return (best_idx.astype(jnp.int32), second_idx.astype(jnp.int32),
            accept, best, second)


match_brute_force_jit = jax.jit(match_brute_force, static_argnames=("ratio",))
