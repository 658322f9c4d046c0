"""Sigma-classed window processing: classed == max-window when every
slot fits its region's window; violations counted (-> staged fallback)
otherwise."""

import numpy as np
import pytest

import jax.numpy as jnp

from popsift_tpu.config import Config
from popsift_tpu.extract import grad_pad_dims, window_classes
from popsift_tpu.ops import descriptors as ops_desc
from popsift_tpu.ops import orientation as ops_ori
from popsift_tpu.ops.gradients import padded_gradient_field
from popsift_tpu.staged import StagedExtractor


def _field_and_slots(seed=3, h=96, w=160, L=4, cap=256,
                     sig_lo=1.8, sig_hi=3.4):
    rng = np.random.default_rng(seed)
    stack = rng.random((L, h, w)).astype(np.float32)
    for _ in range(2):
        stack = (stack + np.roll(stack, 1, 1) + np.roll(stack, 1, 2)
                 + np.roll(stack, -1, 1) + np.roll(stack, -1, 2)) / 5
    x = rng.uniform(4, w - 5, cap).astype(np.float32)
    y = rng.uniform(4, h - 5, cap).astype(np.float32)
    lv = rng.integers(1, L - 1, cap).astype(np.int32)
    sig = rng.uniform(sig_lo, sig_hi, cap).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, cap).astype(np.float32)
    valid = rng.random(cap) < 0.9
    return stack, x, y, lv, sig, ang, valid


def _classes_for(win_max, cap, fracs, chunk):
    c = window_classes(win_max, cap, fracs, chunk=chunk, min_cap=1)
    assert c is not None and sum(s for _, s in c) == cap
    return c


def test_orientation_classed_matches_max_window():
    stack, x, y, lv, sig, ang, valid = _field_and_slots()
    plan_win = ops_ori.ori_window_size(1.6, 3)   # 48 for defaults
    pad_y, pad_x = 64, 256
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    h, w = stack.shape[1:]
    ref = ops_ori.assign_orientations(
        bothp, pad_y, pad_x, x, y, lv, sig, valid, w, h, plan_win)
    classes = _classes_for(plan_win, x.shape[0], (1 / 8, 3 / 8, 1 / 2),
                           chunk=64)
    num, oris, viol = ops_ori.assign_orientations_classed(
        bothp, pad_y, pad_x, x, y, lv, sig, valid, w, h, classes)
    assert int(viol) == 0
    np.testing.assert_array_equal(np.asarray(num), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(oris), np.asarray(ref[1]),
                               atol=1e-5)


def test_orientation_classed_counts_violations():
    stack, x, y, lv, sig, ang, valid = _field_and_slots(
        sig_lo=4.5, sig_hi=5.0)   # every slot needs the max window
    plan_win = ops_ori.ori_window_size(1.6, 3)
    pad_y, pad_x = 64, 256
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    h, w = stack.shape[1:]
    classes = _classes_for(plan_win, x.shape[0], (1 / 8, 3 / 8, 1 / 2),
                           chunk=64)
    _, _, viol = ops_ori.assign_orientations_classed(
        bothp, pad_y, pad_x, x, y, lv, sig, valid, w, h, classes)
    # the small+mid regions (7/8 of slots) cannot fit sigma ~5
    assert int(viol) > x.shape[0] // 2


def test_loop_descriptors_classed_matches_max_window():
    stack, x, y, lv, sig, ang, valid = _field_and_slots(seed=5)
    cfg = Config()
    win = ops_desc.desc_window_size(cfg.sigma, cfg.levels)
    pad_y, pad_x = 128, 256
    bothp = padded_gradient_field(jnp.asarray(stack), pad_y, pad_x)
    h, w = stack.shape[1:]
    ref = ops_desc.loop_descriptors(
        bothp, pad_y, pad_x, x, y, lv, sig, ang, valid, w, h, win)
    classes = _classes_for(win, x.shape[0], (1 / 8, 1 / 2, 3 / 8),
                           chunk=64)
    out, viol = ops_desc.loop_descriptors_classed(
        bothp, pad_y, pad_x, x, y, lv, sig, ang, valid, w, h, classes)
    assert int(viol) == 0
    r = np.asarray(ref)
    np.testing.assert_allclose(np.asarray(out), r,
                               atol=1e-4 * max(1.0, float(np.abs(r).max())))


def test_required_windows_monotone_in_sigma():
    sig = jnp.asarray(np.linspace(0.5, 6.0, 64, dtype=np.float32))
    rd = np.asarray(ops_desc.desc_required_win(sig))
    ro = np.asarray(ops_ori.ori_required_win(sig))
    assert (np.diff(rd) >= 0).all() and (np.diff(ro) >= 0).all()
    # the static windows cover the worst-case sigma of the configuration
    smax = ops_ori.max_sigma(1.6, 3)
    assert float(ops_desc.desc_required_win(jnp.float32(smax))) \
        <= ops_desc.desc_window_size(1.6, 3)
    assert float(ops_ori.ori_required_win(jnp.float32(smax))) \
        <= ops_ori.ori_window_size(1.6, 3)


@pytest.mark.slow
def test_staged_classed_packed_equals_exact(textured_image):
    """End-to-end: with the class gate lowered, the optimistic classed
    packed program must agree with the exact max-window path."""
    norm = textured_image.astype(np.float32) / 255.0
    cfg = Config()
    ex = StagedExtractor(cfg, norm.shape[1], norm.shape[0])
    ex._classes_enabled = True  # classes are opt-in since round 5
    ex.CLASS_MIN_CAP = 1
    f_exact = ex.extract_features(norm)      # first image: exact path
    f_packed = ex.extract_features(norm)     # steady state: classed packed
    assert f_packed.get_feature_count() == f_exact.get_feature_count()
    assert f_packed.get_descriptor_count() == f_exact.get_descriptor_count()
    np.testing.assert_allclose(
        np.asarray(f_packed.get_descriptors()),
        np.asarray(f_exact.get_descriptors()), atol=0.05)


@pytest.mark.slow
def test_staged_violation_falls_back_to_exact(textured_image, monkeypatch):
    """Force window violations: the packed path must detect them via the
    flat-buffer validation and redo with the exact max-window path."""
    import popsift_tpu.staged as staged_mod

    norm = textured_image.astype(np.float32) / 255.0
    cfg = Config()
    ex = StagedExtractor(cfg, norm.shape[1], norm.shape[0])
    ex._classes_enabled = True  # classes are opt-in since round 5
    ex.CLASS_MIN_CAP = 1

    from popsift_tpu import extract as extract_mod
    orig = extract_mod.window_classes

    def tiny_windows(win_max, cap, fracs, chunk, min_cap=512):
        c = orig(win_max, cap, fracs, chunk, min_cap=1)
        if c is None:
            return None
        # shrink every region's window so real slots violate
        return [(max(16, w_r // 2 // 8 * 8), s) for w_r, s in c]

    monkeypatch.setattr(extract_mod, "window_classes", tiny_windows)
    ref = ex.extract_features(norm)           # exact (first image)
    out = ex.extract_features(norm)           # packed -> violation -> exact
    assert out.get_feature_count() == ref.get_feature_count()
    np.testing.assert_allclose(np.asarray(out.get_descriptors()),
                               np.asarray(ref.get_descriptors()),
                               atol=2e-2)

    # a streak of violations disables the classes: the next compiled
    # optimistic program is max-window and validates clean
    assert ex._classes_enabled
    for _ in range(2):
        ex.extract_features(norm)
    assert not ex._classes_enabled
    f = ex.extract_features(norm)
    assert ex._class_viol_streak == 0
    assert f.get_feature_count() == ref.get_feature_count()


def test_class_probation_state_machine():
    """Host-only unit test of _note_frame_classes: 3-strike disable,
    compile-free probation re-enable after the interval (only when the
    classed program is still cached), instant re-disable + 4x backoff on
    a failed probation, and full recovery on a clean probation."""
    cfg = Config()
    ex = StagedExtractor(cfg, 128, 96)
    ex._classes_enabled = True  # classes are opt-in since round 5
    O = ex.plan.octaves
    key = ((128,) * O, (128,) * O, (128,) * O, 256, 256)

    # 2 violations do not disable; a clean frame resets the streak
    ex._note_frame_classes(5, key)
    ex._note_frame_classes(5, key)
    assert ex._classes_enabled and ex._class_viol_streak == 2
    ex._note_frame_classes(0, key)
    assert ex._class_viol_streak == 0

    # 3-strike disable
    for _ in range(3):
        ex._note_frame_classes(7, key)
    assert not ex._classes_enabled
    p0 = ex._class_probation

    # clean frames tick toward probation, but WITHOUT a cached classed
    # program at this key the re-enable never fires (no compile allowed)
    for _ in range(p0 + 5):
        ex._note_frame_classes(0, key)
    assert not ex._classes_enabled

    # with the classed program cached, probation re-enables
    ex._fused_packed[(key, True)] = lambda *a: None
    ex._frames_since_disable = 0
    for _ in range(p0):
        ex._note_frame_classes(0, key)
    assert ex._classes_enabled and ex._class_probation_active
    assert ex._class_viol_streak == 2  # one violation re-disables

    # failed probation: instant re-disable + 4x backoff
    ex._note_frame_classes(1, key)
    assert not ex._classes_enabled
    assert ex._class_probation == min(p0 * 4, 4096)

    # next probation succeeds: a clean classed frame clears probation
    ex._frames_since_disable = ex._class_probation
    ex._note_frame_classes(0, key)
    assert ex._classes_enabled
    ex._note_frame_classes(0, key)
    assert ex._classes_enabled and not ex._class_probation_active
    assert ex._class_viol_streak == 0
