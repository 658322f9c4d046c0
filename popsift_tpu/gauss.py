"""Gaussian filter bank construction.

Reimplements the four table families of the reference
(/root/reference/src/popsift/gauss_filter.cu:127-257) as trace-time numpy
constants:

* ``inc``    — incremental level-to-level sigmas sqrt(s_l^2 - s_{l-1}^2)
* ``abs_o0`` — absolute-from-input sigmas for octave 0 (minus initial blur)
* ``abs_oN`` — level-0-to-level-N sigmas for octaves > 0
* ``dd``     — direct-downscale per-octave level-0 sigmas

Span policies follow gauss_filter.cu:275-327.  The hardware-interpolation
table (``i_filter``, gauss_filter.cu:373-410) is deliberately omitted: it is a
texture-unit trick with no TPU analog; the plain ``filter`` table carries the
same information (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .config import Config, GaussMode

GAUSS_ALIGN = 32   # sift_constants.h:35
GAUSS_LEVELS = 12  # sift_constants.h:37


def _span_for(mode: GaussMode, sigma: float) -> int:
    """Half-sided filter span including the centre tap."""
    if mode in (GaussMode.VLFEAT_COMPUTE, GaussMode.VLFEAT_RELATIVE_ALL):
        return _vlfeat_span(sigma)
    if mode == GaussMode.VLFEAT_RELATIVE:
        return _vlfeat_relative_span(sigma)
    if mode == GaussMode.OPENCV_COMPUTE:
        return _opencv_span(sigma)
    if mode == GaussMode.FIXED9:
        return 5
    if mode == GaussMode.FIXED15:
        return 8
    raise ValueError(f"invalid Gauss span mode {mode}")


def _vlfeat_span(sigma: float) -> int:
    # gauss_filter.cu:301-307
    return min(int(math.ceil(4.0 * sigma)) + 1, GAUSS_ALIGN - 1)


def _vlfeat_relative_span(sigma: float) -> int:
    # gauss_filter.cu:310-318 — next equal-or-larger odd span
    spn = _vlfeat_span(sigma)
    if spn % 2 == 0:
        spn += 1
    return spn


def _opencv_span(sigma: float) -> int:
    # gauss_filter.cu:321-327
    span = int(round(2.0 * 4.0 * sigma + 1.0)) | 1
    span >>= 1
    span += 1
    return min(span, GAUSS_ALIGN - 1)


def _filter_from_sigma(mode: GaussMode, sigma: float) -> tuple[np.ndarray, int]:
    """One half-sided normalised Gaussian (gauss_filter.cu:341-371).

    Returns an array of length GAUSS_ALIGN (zero beyond the span) and the
    span.  Mirrors the reference exactly: un-normalised exp() taps summed in
    double precision, then divided by (centre + 2*sum(tail)).
    """
    span = min(_span_for(mode, sigma), GAUSS_ALIGN - 1)
    taps = np.zeros(GAUSS_ALIGN, dtype=np.float64)
    taps[0] = 1.0
    acc = 1.0
    for x in range(1, span):
        val = math.exp(-0.5 * (float(x) / sigma) ** 2)
        taps[x] = val
        acc += np.float32(2.0 * val)  # reference accumulates `2.0f * val`
    taps[:span] /= acc
    return taps.astype(np.float32), span


@dataclasses.dataclass(frozen=True)
class GaussTable:
    """One family of per-level filters."""

    sigma: np.ndarray   # (levels,) f32
    span: np.ndarray    # (levels,) int
    filter: np.ndarray  # (levels, GAUSS_ALIGN) f32

    @property
    def max_span(self) -> int:
        return int(self.span.max())


def _build_table(mode: GaussMode, sigmas: list[float]) -> GaussTable:
    spans = []
    filters = []
    for s in sigmas:
        if s > 0.0:
            f, spn = _filter_from_sigma(mode, s)
        else:
            # sigma 0 => identity (abs_oN level 0 is never applied)
            f = np.zeros(GAUSS_ALIGN, dtype=np.float32)
            f[0] = 1.0
            spn = 1
        spans.append(spn)
        filters.append(f)
    return GaussTable(
        sigma=np.asarray(sigmas, dtype=np.float32),
        span=np.asarray(spans, dtype=np.int32),
        filter=np.stack(filters),
    )


@dataclasses.dataclass(frozen=True)
class GaussInfo:
    """All four filter families (gauss_filter.h:62-82)."""

    inc: GaussTable
    abs_o0: GaussTable
    abs_oN: GaussTable
    dd: GaussTable
    required_filter_stages: int


def build_gauss_info(config: Config) -> GaussInfo:
    """init_filter (gauss_filter.cu:127-257) without the device upload."""
    sigma0 = float(config.sigma)
    levels = int(config.levels)
    if sigma0 > 2.0:
        raise ValueError("Sigma > 2.0 is not supported.")
    if levels > GAUSS_LEVELS:
        raise ValueError(f"More than {GAUSS_LEVELS} levels not supported.")

    mode = config.gauss_mode
    stages = levels + 3

    initial_blur = (config.initial_blur * (2.0 ** config.upscale_factor)
                    if config.assume_initial_blur else 0.0)

    # inc — gauss_filter.cu:173-188
    inc_sigmas = []
    if config.assume_initial_blur:
        inc_sigmas.append(
            math.sqrt(abs(sigma0 * sigma0 - initial_blur * initial_blur)))
    else:
        inc_sigmas.append(sigma0)
    for lvl in range(1, stages):
        sp = sigma0 * 2.0 ** ((lvl - 1) / levels)
        ss = sigma0 * 2.0 ** (lvl / levels)
        inc_sigmas.append(math.sqrt(ss * ss - sp * sp))

    # abs_o0 — gauss_filter.cu:190-199
    abs_o0_sigmas = []
    for lvl in range(stages):
        ss = sigma0 * 2.0 ** (lvl / levels)
        abs_o0_sigmas.append(
            math.sqrt(abs(ss * ss - initial_blur * initial_blur)))

    # abs_oN — gauss_filter.cu:201-215
    abs_oN_sigmas = [0.0]
    for lvl in range(1, stages):
        ss = sigma0 * 2.0 ** (lvl / levels)
        abs_oN_sigmas.append(math.sqrt(ss * ss - sigma0 * sigma0))

    # dd — gauss_filter.cu:217-237
    dd_sigmas = []
    from .config import MAX_OCTAVES
    for octv in range(MAX_OCTAVES):
        oct_sigma = math.ldexp(sigma0, octv)
        b = math.sqrt(abs(oct_sigma * oct_sigma - initial_blur * initial_blur))
        dd_sigmas.append(math.ldexp(b, -octv))

    return GaussInfo(
        inc=_build_table(mode, inc_sigmas),
        abs_o0=_build_table(mode, abs_o0_sigmas),
        abs_oN=_build_table(mode, abs_oN_sigmas),
        dd=_build_table(mode, dd_sigmas),
        required_filter_stages=stages,
    )


def format_gauss_tables(info: GaussInfo, columns: int = 10) -> str:
    """Debug dump in the spirit of print_gauss_filter_symbol
    (gauss_filter.cu:24-121); used by --print-gauss-tables."""
    out = []

    def emit(title: str, table: GaussTable, rows: int) -> None:
        out.append(title)
        for lvl in range(rows):
            spn = int(table.span[lvl])
            full = spn + spn - 1
            m = min(spn, columns)
            taps = " ".join(f"{table.filter[lvl, x]:0.8f}" for x in range(m))
            tail = " ..." if m < spn else ""
            out.append(f"      {lvl} {full} {table.sigma[lvl]:2.6f}: "
                       f"{taps}{tail}")
        out.append("")

    n = info.required_filter_stages
    emit("Gauss tables (incremental)", info.inc, n)
    emit("Gauss tables, absolute filters octave 0", info.abs_o0, n)
    emit("Gauss tables, absolute filters other octaves", info.abs_oN, n)
    emit("Level 0-filters for direct downscaling", info.dd,
         len(info.dd.sigma))
    return "\n".join(out)
