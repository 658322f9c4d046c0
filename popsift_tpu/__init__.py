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
