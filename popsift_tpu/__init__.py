"""popsift_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of PopSift.

A real-time SIFT (Scale-Invariant Feature Transform) feature extractor with
the full capability surface of alicevision/popsift (mounted read-only at
/root/reference), redesigned for TPU hardware: dense scale-space arrays,
fixed-capacity masked compaction instead of atomics, batched gather kernels
instead of per-extremum thread blocks, and MXU matmuls for matching.

Public API mirrors the reference:

    import popsift_tpu as popsift
    ps  = popsift.PopSift(popsift.Config())
    job = ps.enqueue(w, h, image_bytes)
    features = job.get()
"""

def _enable_compilation_cache() -> None:
    """Persist compiled XLA programs across processes.

    The extraction pipeline compiles one fused program per (config, image
    bucket, count-bucket triple); on a remotely-attached TPU each compile
    costs tens of seconds, and the reference's analog (CUDA fatbin cache)
    is free.  Best-effort: never fail import over cache setup."""
    import os

    try:
        import jax

        # Respect an embedding application's own cache configuration:
        # only install ours when none is set (via jax config or env).
        if (jax.config.jax_compilation_cache_dir is not None
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        cache_dir = os.environ.get("POPSIFT_TPU_CACHE")
        explicit = cache_dir is not None
        if cache_dir is None:
            cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                     "popsift_tpu_xla")
        # XLA:CPU caches AOT executables whose key does NOT include the
        # host's machine features: an entry written on one host can
        # SIGILL/SIGSEGV when deserialised on another (observed: a cache
        # carried across container hosts crashed mid-test in jax
        # _cache_read).  Scope any CPU-backend cache — default OR
        # explicit — to a host fingerprint; TPU/accelerator executables
        # are device code and host-independent, so an explicit
        # POPSIFT_TPU_CACHE (e.g. bench.py's repo-shipped cache of TPU
        # programs) is used verbatim on non-CPU backends only.
        platforms = (os.environ.get("JAX_PLATFORMS", "")
                     or getattr(jax.config, "jax_platforms", None) or "")
        if platforms == "" or "cpu" in platforms.split(","):
            try:
                with open("/proc/cpuinfo") as f:
                    flags = next((ln for ln in f
                                  if ln.startswith("flags")), "")
                import hashlib
                fp = hashlib.blake2b(flags.encode(),
                                     digest_size=4).hexdigest()
            except OSError:
                fp = "generic"
            if platforms == "" and explicit:
                # backend auto-detect: the process may still land on an
                # accelerator; resolve it (initialises the backend) so a
                # TPU run keeps the verbatim shipped cache
                try:
                    if jax.default_backend() != "cpu":
                        fp = None
                except Exception:
                    pass
            if fp is not None:
                cache_dir = os.path.join(cache_dir, f"cpu-{fp}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


def _enable_debug_mode() -> None:
    """POPSIFT_TPU_DEBUG=1: kernel-debug mode.

    The analog of the reference's PopSift_ERRCHK_AFTER_KERNEL /
    DEBUG_INIT_DEVICE_ALLOCATIONS debug builds (debug_macros.h:26-32,
    debug_macros.cu:33-35): Pallas kernels run in interpret mode
    (kernels/dispatch.py:kernel_interpret) and jax_debug_nans pinpoints
    the op that produced a NaN instead of the final readback."""
    import os

    if os.environ.get("POPSIFT_TPU_DEBUG", "") in ("", "0"):
        return
    try:
        import jax

        jax.config.update("jax_debug_nans", True)
    except Exception:  # pragma: no cover
        pass


_enable_compilation_cache()
_enable_debug_mode()

from .config import (Config, DescMode, GaussMode, GridFilterMode, ImageMode,
                     LogMode, NormMode, ProcessingMode, ScalingMode, SiftMode,
                     MAX_LEVELS, MAX_OCTAVES)
from .features import (Feature, Features, FeaturesBase, FeaturesDev,
                       FeaturesHost)
from .pipeline import PopSift, SiftJob

__version__ = "0.1.0"

__all__ = [
    "Config", "DescMode", "GaussMode", "GridFilterMode", "ImageMode",
    "LogMode", "NormMode", "ProcessingMode", "ScalingMode", "SiftMode",
    "MAX_LEVELS", "MAX_OCTAVES",
    "Feature", "Features", "FeaturesBase", "FeaturesDev", "FeaturesHost",
    "PopSift", "SiftJob",
]
