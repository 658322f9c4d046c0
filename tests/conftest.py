"""Test configuration: force the CPU backend with 8 virtual devices.

The container's interpreter boot registers the remote 'axon' TPU backend
(JAX_PLATFORMS=axon); tests must run hermetically on CPU and exercise the
multi-chip sharding paths on a virtual 8-device mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def blob_image():
    """Synthetic grey image with Gaussian blobs at known positions."""
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for (cx, cy, s, a) in [(40, 30, 3.0, 1.0), (90, 60, 5.0, 0.8),
                           (64, 20, 2.0, 0.6)]:
        img += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * s * s)))
    return np.clip(img * 200, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def textured_image():
    """Smooth random texture (reproducible) with plenty of keypoints."""
    rng = np.random.default_rng(42)
    h, w = 120, 160
    img = rng.random((h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    # light smoothing to create scale-space structure
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


@pytest.fixture(scope="module", autouse=True)
def _release_compiled_executables():
    """Unmap compiled XLA:CPU executables between test modules.

    Every CPU executable XLA JITs stays mmapped for the life of the jit
    cache entry; a full-suite process accumulates mappings at ~10k/min
    and crosses the kernel's vm.max_map_count (default 65530) around
    test ~130, at which point LLVM's memory manager gets ENOMEM and the
    process dies with SIGABRT/SIGSEGV inside compilation-cache
    read/write (observed 4x at the same suite position).  Clearing the
    jit caches at module teardown releases the executables; re-entry
    costs a persistent-cache deserialise, not a recompile.  The staged
    extractor LRU is cleared too so its jit wrappers do not pin their
    programs."""
    yield
    import jax

    try:
        from popsift_tpu.staged import get_staged_extractor
        get_staged_extractor.cache_clear()
    except Exception:
        pass
    jax.clear_caches()
