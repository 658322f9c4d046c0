"""Derived compile-time constants.

Mirrors sift_constants.{h,cu} of the reference:
* fixed algorithm constants (sift_constants.h:33-54)
* the per-run ``ConstInfo`` block (sift_constants.cu:22-53), which on TPU
  becomes a frozen set of trace-time scalars + numpy windows baked into the
  compiled program instead of CUDA ``__constant__`` memory.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .config import Config

# sift_constants.h:33-54
ORI_NBINS = 36
ORI_WINFACTOR = 1.5
DESC_BINS = 8
DESC_V_SIZE = 128
DESC_MAGNIFY = 3.0
ORIENTATION_MAX_COUNT = 4

M_PI = math.pi
M_PI2 = 2.0 * math.pi
M_4RPI = 4.0 / math.pi


@dataclasses.dataclass(frozen=True)
class ConstInfo:
    """init_constants (sift_constants.cu:22-53)."""

    sigma0: float
    sigma_k: float
    edge_limit: float
    threshold: float           # the *peak* threshold (popsift.cpp:100)
    max_extrema: int
    max_orientations: int
    norm_multi: int
    desc_gauss: np.ndarray     # (40, 40) f32 window for grid/notile descs
    desc_tile: np.ndarray      # (16,) f32 bilinear tile weights


def build_const_info(config: Config) -> ConstInfo:
    levels = config.levels
    max_extrema = config.max_extrema

    # 40x40 descriptor Gaussian window (sift_constants.cu:34-42)
    dn_step = 1.0 / 8.0
    dn_base = 0.5 * dn_step - 20.0 * dn_step
    idx = np.arange(40, dtype=np.float32)
    dnx = (dn_base + idx * dn_step)[None, :]
    dny = (dn_base + idx * dn_step)[:, None]
    desc_gauss = np.exp(-((dnx * dnx + dny * dny) / 8.0)).astype(np.float32)

    # 16-entry bilinear tile weights (sift_constants.cu:44-47)
    i = np.arange(16, dtype=np.float32)
    nx = -1.0 + 1.0 / 16.0 + i * (1.0 / 8.0)
    desc_tile = (1.0 - np.abs(nx)).astype(np.float32)

    return ConstInfo(
        sigma0=float(config.sigma),
        sigma_k=2.0 ** (1.0 / levels),
        edge_limit=float(config.edge_limit),
        threshold=float(config.get_peak_threshold()),
        max_extrema=max_extrema,
        max_orientations=max_extrema + max_extrema // 4,
        norm_multi=int(config.norm_multiplier),
        desc_gauss=desc_gauss,
        desc_tile=desc_tile,
    )
