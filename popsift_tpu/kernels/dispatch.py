"""Backend dispatch control for Pallas kernels.

Custom kernels are used on the TPU backend; elsewhere (CPU tests, the
virtual multi-chip dry-run) XLA fallbacks with identical numerics run
instead.  ``disable_pallas()`` opts out explicitly — needed when tracing
under ``jax.vmap`` (e.g. the batched multi-image extractor), where
pallas_call with manual DMA has no batching rule.

``POPSIFT_TPU_DEBUG=1`` enables kernel-debug mode — the analog of the
reference's ``PopSift_ERRCHK_AFTER_KERNEL`` / ``GRID_AND_BLOCK_CHECK``
builds (debug_macros.h:26-32, debug_macros.cu:33-35): every Pallas
kernel runs in interpret mode (bounds-checked, python-level DMA
emulation) and ``jax_debug_nans`` surfaces NaN producers at the op that
made them instead of at the final readback.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax

_disabled = contextvars.ContextVar("popsift_tpu_disable_pallas",
                                   default=False)

_DEBUG = os.environ.get("POPSIFT_TPU_DEBUG", "") not in ("", "0")


def debug_mode() -> bool:
    """Kernel-debug mode (POPSIFT_TPU_DEBUG=1)."""
    return _DEBUG


def kernel_interpret(explicit: bool | None = None) -> bool:
    """Resolve a kernel's interpret flag: an explicit caller choice wins;
    otherwise debug mode turns interpretation on globally."""
    if explicit is not None:
        return explicit
    return _DEBUG


@contextlib.contextmanager
def disable_pallas():
    token = _disabled.set(True)
    try:
        yield
    finally:
        _disabled.reset(token)


def pallas_enabled() -> bool:
    return jax.default_backend() == "tpu" and not _disabled.get()
