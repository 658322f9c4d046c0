"""Backend dispatch control for Pallas kernels.

Custom kernels are used on the TPU backend; elsewhere (CPU tests, the
virtual multi-chip dry-run) XLA fallbacks with identical numerics run
instead.  ``disable_pallas()`` opts out explicitly — needed when tracing
under ``jax.vmap`` (e.g. the batched multi-image extractor), where
pallas_call with manual DMA has no batching rule.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

_disabled = contextvars.ContextVar("popsift_tpu_disable_pallas",
                                   default=False)


@contextlib.contextmanager
def disable_pallas():
    token = _disabled.set(True)
    try:
        yield
    finally:
        _disabled.reset(token)


def pallas_enabled() -> bool:
    return jax.default_backend() == "tpu" and not _disabled.get()
