"""Extremum detection/refinement tests on synthetic DoG volumes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.config import SiftMode
from popsift_tpu.ops import extrema as E


def make_dog_with_peak(shape=(5, 32, 40), pos=(2, 16, 20), amp=50.0,
                       width=2.0):
    """Smooth 3-D Gaussian bump — a well-conditioned extremum."""
    L, H, W = shape
    z, y, x = np.mgrid[0:L, 0:H, 0:W].astype(np.float32)
    pz, py, px = pos
    d2 = ((x - px) ** 2 + (y - py) ** 2) / (2 * width ** 2) \
        + (z - pz) ** 2 / (2 * 1.2 ** 2)
    return (amp * np.exp(-d2)).astype(np.float32)


def test_detect_single_peak():
    dog = make_dog_with_peak()
    mask = np.asarray(jax.jit(
        lambda d: E.detect_candidates(d, SiftMode.POPSIFT, 1.0))(
        jnp.asarray(dog)))
    # mask layer z corresponds to dog layer z+1
    assert mask.sum() == 1
    z, y, x = np.argwhere(mask)[0]
    assert (z + 1, y, x) == (2, 16, 20)


def test_detect_minimum_too():
    dog = -make_dog_with_peak()
    mask = np.asarray(jax.jit(
        lambda d: E.detect_candidates(d, SiftMode.POPSIFT, 1.0))(
        jnp.asarray(dog)))
    assert mask.sum() == 1


def test_detect_contrast_gate():
    dog = make_dog_with_peak(amp=1.0)
    # PopSift gate: |val| >= 1.6 * thresh ; with thresh=2 -> 3.2 > 1.0
    mask = np.asarray(jax.jit(
        lambda d: E.detect_candidates(d, SiftMode.POPSIFT, 2.0))(
        jnp.asarray(dog)))
    assert mask.sum() == 0


def test_detect_border_exclusion_opencv():
    dog = make_dog_with_peak(pos=(2, 4, 4))  # inside 1-border, not 5-border
    m_pop = np.asarray(E.detect_candidates(
        jnp.asarray(dog), SiftMode.POPSIFT, 1.0))
    m_ocv = np.asarray(E.detect_candidates(
        jnp.asarray(dog), SiftMode.OPENCV, 1.0))
    assert m_pop.sum() == 1
    assert m_ocv.sum() == 0


def test_compact_mask_order_and_caps():
    mask = np.zeros((2, 4, 5), bool)
    mask[0, 1, 2] = True
    mask[0, 3, 1] = True
    mask[1, 0, 0] = True
    x, y, z, valid, count, overflow = jax.jit(
        lambda m: E.compact_mask(m, 2))(jnp.asarray(mask))
    assert int(count) == 2
    assert int(overflow) == 1
    np.testing.assert_array_equal(np.asarray(x)[:2], [2, 1])
    np.testing.assert_array_equal(np.asarray(y)[:2], [1, 3])
    np.testing.assert_array_equal(np.asarray(z)[:2], [0, 0])


def _find(dog, mode, cap=64, thresh=1.0, edge=10.0):
    return jax.jit(lambda d: E.find_extrema(
        d, mode, 1.6, 2 ** (1 / 3), thresh, edge, 2, 256, cap))(
        jnp.asarray(dog))


@pytest.mark.parametrize("mode", [SiftMode.POPSIFT, SiftMode.VLFEAT,
                                  SiftMode.OPENCV])
def test_refine_subvoxel_position(mode):
    # peak slightly off-centre => refinement should land near true pos
    dog = make_dog_with_peak(shape=(5, 40, 48), pos=(2, 20.4, 24.3),
                             amp=60.0, width=2.5)
    ext = _find(dog, mode)
    assert int(ext.count) == 1
    assert abs(float(ext.xpos[0]) - 24.3) < 0.2
    assert abs(float(ext.ypos[0]) - 20.4) < 0.2
    assert int(ext.lpos[0]) == 2
    # sigma = sigma0 * k^sn with sn ~ 2
    assert float(ext.sigma[0]) == pytest.approx(1.6 * 2 ** (2 / 3), rel=0.2)


def test_refine_rejects_edge_response():
    """A ridge (edge-like structure) must be rejected by the edge test."""
    L, H, W = 5, 32, 40
    z, y, x = np.mgrid[0:L, 0:H, 0:W].astype(np.float32)
    # elongated ridge: tight in y, long in x
    d2 = (y - 16) ** 2 / (2 * 0.8 ** 2) + (x - 20) ** 2 / (2 * 30.0 ** 2) \
        + (z - 2) ** 2 / (2 * 1.2 ** 2)
    dog = (50 * np.exp(-d2)).astype(np.float32)
    ext = _find(dog, SiftMode.POPSIFT, edge=10.0)
    assert int(ext.count) == 0


def test_refine_low_contrast_after_interp_rejected():
    dog = make_dog_with_peak(amp=3.0)
    # final gate: |contr| >= 2*threshold -> amp 3 < 2*2
    ext = _find(dog, SiftMode.POPSIFT, thresh=2.0)
    assert int(ext.count) == 0


def test_capacity_clamp():
    rng = np.random.default_rng(0)
    dog = rng.standard_normal((5, 64, 64)).astype(np.float32) * 30
    ext = _find(dog, SiftMode.POPSIFT, cap=4)
    assert int(ext.count) <= 4
    assert np.asarray(ext.valid).sum() == int(ext.count)


def test_cell_ids():
    dog = make_dog_with_peak(shape=(5, 40, 48), pos=(2, 30, 36))
    ext = _find(dog, SiftMode.POPSIFT)
    # grid 2x2 on 48x40: (36,30) is in the bottom-right cell => id 3
    assert int(ext.cell[0]) == 3


def test_detect_and_compact_surplus_parity():
    """A DoG volume carrying fused-chain block-alignment surplus
    (edge-replicated rows/cols) must yield exactly the candidates of the
    exact-dims volume when true_dims is passed — including the Pallas
    kernels' pad-from-surplus path (exercised in interpret mode via the
    kernel wrappers directly)."""
    import numpy as np
    import jax.numpy as jnp
    from popsift_tpu.config import SiftMode
    from popsift_tpu.kernels.detect import detect_packed_pallas
    from popsift_tpu.ops.extrema import (compact_words, detect_and_compact)

    rng = np.random.default_rng(21)
    L, h, w = 5, 43, 150
    dog = (rng.random((L, h, w)).astype(np.float32) - 0.5) * 30.0
    hp, wp = 64, 256  # block-rounded surplus
    sur = np.empty((L, hp, wp), np.float32)
    sur[:, :h, :w] = dog
    sur[:, h:, :w] = dog[:, h - 1:h, :]
    sur[:, :, w:] = sur[:, :, w - 1:w]

    for mode in (SiftMode.POPSIFT, SiftMode.OPENCV):
        ref = detect_and_compact(jnp.asarray(dog), mode, 1.0, 64)
        got = detect_and_compact(jnp.asarray(sur), mode, 1.0, 64,
                                 true_dims=(h, w))
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the packed Pallas wrapper, pad-from-surplus vs exact
        wa = detect_packed_pallas(jnp.asarray(dog), mode, 1.0,
                                  interpret=True)
        wb = detect_packed_pallas(jnp.asarray(sur), mode, 1.0,
                                  interpret=True, true_dims=(h, w))
        ca = compact_words(wa, 64)
        cb = compact_words(wb, 64)
        for a, b in zip(ca, cb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
