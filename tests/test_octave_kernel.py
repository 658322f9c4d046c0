"""Fused octave-chain kernel (kernels/octave.py) vs the XLA chain."""

import jax.numpy as jnp
import numpy as np
import pytest

from popsift_tpu.kernels.octave import (chain_halo, octave_chain_fused,
                                        octave_chain_ok)
from popsift_tpu.ops import gradients as G
from popsift_tpu.ops import pyramid as P


def _xla_chain(lvl0, filters, spans):
    """Reference: the exact per-level XLA chain build_pyramid_and_dogs
    runs off-TPU (per-level edge clamp, then DoG, then gradients)."""
    lvls = [lvl0]
    dogs = []
    for lvl in range(1, len(spans)):
        nxt = P.sep_blur(lvls[-1], np.asarray(filters[lvl]),
                         int(spans[lvl]))
        dogs.append(nxt - lvls[-1])
        lvls.append(nxt)
    stack = jnp.stack(lvls)
    mag, theta = G.gradient_fields(stack)
    return stack, jnp.stack(dogs), G.interleave_field(mag, theta)


def _mk_filters(spans):
    filters = []
    for s in spans:
        t = np.exp(-0.5 * (np.arange(s) / max(s / 2.5, 1.0)) ** 2)
        t = t / (t[0] + 2 * t[1:].sum())
        filters.append(t.astype(np.float32))
    return filters


@pytest.mark.parametrize("dims", [(70, 200), (96, 300)])
def test_octave_chain_matches_xla(dims):
    H, W = dims
    spans = (1, 4, 5, 6, 7, 9)
    filters = _mk_filters(spans)
    rng = np.random.default_rng(11)
    lvl0 = jnp.asarray(rng.random((H, W)).astype(np.float32) * 255.0)

    stack_ref, dogs_ref, field_ref = _xla_chain(lvl0, filters, spans)
    stack, dogs, field = octave_chain_fused(
        lvl0, filters, spans, emit_stack=True, emit_field=True,
        interpret=True)

    assert stack.shape[1] % 32 == 0 and stack.shape[2] % 128 == 0
    np.testing.assert_allclose(np.asarray(stack)[:, :H, :W],
                               np.asarray(stack_ref),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dogs)[:, :H, :W],
                               np.asarray(dogs_ref),
                               rtol=1e-4, atol=2e-4)
    got = np.asarray(field)[:, :H, :W]
    ref = np.asarray(field_ref)
    np.testing.assert_allclose(got[0::2], ref[0::2], rtol=2e-5, atol=2e-3)
    # angle: Cephes polynomial atan2 (max err ~2e-7 rad); near-zero
    # gradients amplify the chained-blur fp drift into the angle, so
    # compare where the magnitude is meaningful (all drift stays ~1e-3
    # rad, far below the 36-bin granularity of 0.17 rad)
    m = ref[0::2] > 5e-2
    np.testing.assert_allclose(got[1::2][m], ref[1::2][m],
                               rtol=0, atol=1e-3)
    assert np.isfinite(got).all()


def test_octave_chain_level3_only():
    """emit_stack=False + stack_levels=(3,): the default hot-path shape
    (only the next octave's downscale source is written)."""
    H, W = 64, 180
    spans = (1, 4, 5, 6, 7, 9)
    filters = _mk_filters(spans)
    rng = np.random.default_rng(13)
    lvl0 = jnp.asarray(rng.random((H, W)).astype(np.float32) * 255.0)

    stack_ref, dogs_ref, _ = _xla_chain(lvl0, filters, spans)
    stack, dogs, field = octave_chain_fused(
        lvl0, filters, spans, emit_stack=False, emit_field=True,
        stack_levels=(3,), interpret=True)
    assert stack.shape[0] == 1
    np.testing.assert_allclose(np.asarray(stack)[0, :H, :W],
                               np.asarray(stack_ref)[3],
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dogs)[:, :H, :W],
                               np.asarray(dogs_ref),
                               rtol=1e-4, atol=2e-4)
    assert field.shape[0] == 12
    assert np.isfinite(np.asarray(field)).all()


def test_octave_chain_surplus_is_finite():
    rng = np.random.default_rng(17)
    spans = (1, 4, 5)
    lvl0 = jnp.asarray(rng.random((41, 140)).astype(np.float32))
    stack, dogs, field = octave_chain_fused(
        lvl0, _mk_filters(spans), spans, emit_stack=True,
        emit_field=True, interpret=True)
    for a in (stack, dogs, field):
        assert np.isfinite(np.asarray(a)).all()


def test_octave_chain_ok_gates():
    spans = (1, 6, 6, 8, 9, 11)
    assert octave_chain_ok(2160, 3840, spans, True)
    assert octave_chain_ok(270, 480, spans, True)
    assert not octave_chain_ok(135, 240, spans, True)   # too small
    assert not octave_chain_ok(2160, 3840,
                               (1, 30, 30, 30, 30, 30), True)  # halo
    assert chain_halo(spans, True) == sum(s - 1 for s in spans) + 1
