"""Unit tests for the Gauss filter bank (vs hand-derived values; mirrors the
table math of /root/reference/src/popsift/gauss_filter.cu)."""

import math

import numpy as np
import pytest

from popsift_tpu.config import Config, GaussMode
from popsift_tpu.gauss import (GAUSS_ALIGN, build_gauss_info,
                               format_gauss_tables, _vlfeat_span,
                               _opencv_span, _vlfeat_relative_span)


def test_vlfeat_span():
    # span = min(ceil(4*sigma)+1, 31)
    assert _vlfeat_span(1.0) == 5
    assert _vlfeat_span(1.6) == 8  # ceil(6.4)+1
    assert _vlfeat_span(2.0) == 9
    assert _vlfeat_span(10.0) == 31


def test_vlfeat_relative_span_is_odd():
    for s in (0.5, 1.0, 1.6, 2.0, 3.3):
        assert _vlfeat_relative_span(s) % 2 == 1
        assert _vlfeat_relative_span(s) >= _vlfeat_span(s)


def test_opencv_span():
    # span = ((round(8*sigma+1)|1)>>1)+1
    sigma = 1.6
    expect = ((int(round(8 * sigma + 1)) | 1) >> 1) + 1
    assert _opencv_span(sigma) == expect


def test_inc_sigmas_default():
    cfg = Config()
    info = build_gauss_info(cfg)
    sigma0, levels = 1.6, 3
    init_blur = 0.5 * 2.0  # scaled by 2^upscale (gauss_filter.cu:169-171)
    assert info.inc.sigma[0] == pytest.approx(
        math.sqrt(sigma0 ** 2 - init_blur ** 2), rel=1e-6)
    for lvl in range(1, levels + 3):
        sp = sigma0 * 2 ** ((lvl - 1) / levels)
        ss = sigma0 * 2 ** (lvl / levels)
        assert info.inc.sigma[lvl] == pytest.approx(
            math.sqrt(ss * ss - sp * sp), rel=1e-6)


def test_no_initial_blur():
    cfg = Config()
    cfg.set_initial_blur(0.0)
    info = build_gauss_info(cfg)
    assert info.inc.sigma[0] == pytest.approx(1.6)
    # abs_o0 sigma[lvl] = sigma0 * 2^(lvl/levels) with no blur subtraction
    assert info.abs_o0.sigma[0] == pytest.approx(1.6)


def test_filters_normalised():
    cfg = Config()
    info = build_gauss_info(cfg)
    for table in (info.inc, info.abs_o0, info.abs_oN, info.dd):
        for lvl in range(len(table.sigma)):
            spn = int(table.span[lvl])
            taps = table.filter[lvl]
            total = taps[0] + 2 * taps[1:spn].sum()
            assert total == pytest.approx(1.0, abs=1e-5)
            assert np.all(taps[spn:] == 0.0)


def test_filter_tap_values_match_formula():
    cfg = Config()
    info = build_gauss_info(cfg)
    lvl = 2
    sig = float(info.inc.sigma[lvl])
    spn = int(info.inc.span[lvl])
    raw = np.array([1.0] + [math.exp(-0.5 * (x / sig) ** 2)
                            for x in range(1, spn)])
    norm = raw[0] + 2 * raw[1:].sum()
    np.testing.assert_allclose(info.inc.filter[lvl, :spn], raw / norm,
                               rtol=1e-5)


def test_dd_octave0_matches_abs0_level0():
    # gauss_filter.cu:227-237: dd[0] uses the same sigma as abs_o0[0]
    cfg = Config()
    info = build_gauss_info(cfg)
    assert info.dd.sigma[0] == pytest.approx(info.abs_o0.sigma[0], rel=1e-6)


def test_abs_oN_level0_is_identity():
    cfg = Config()
    info = build_gauss_info(cfg)
    assert info.abs_oN.sigma[0] == 0.0
    assert info.abs_oN.filter[0, 0] == 1.0
    assert np.all(info.abs_oN.filter[0, 1:] == 0.0)


def test_sigma_cap():
    cfg = Config()
    cfg.set_sigma(2.5)
    with pytest.raises(ValueError):
        build_gauss_info(cfg)


def test_levels_cap():
    cfg = Config()
    cfg.set_levels(13)
    with pytest.raises(ValueError):
        build_gauss_info(cfg)


def test_fixed_modes_span():
    for mode, span in ((GaussMode.FIXED9, 5), (GaussMode.FIXED15, 8)):
        cfg = Config()
        cfg.set_gauss_mode(mode)
        info = build_gauss_info(cfg)
        assert int(info.inc.span[1]) == span


def test_format_tables_runs():
    cfg = Config()
    info = build_gauss_info(cfg)
    text = format_gauss_tables(info)
    assert "incremental" in text
    assert len(text.splitlines()) > 20
