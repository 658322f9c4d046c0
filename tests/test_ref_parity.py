"""Parity of popsift_tpu against the executable reference golden
(tests/ref_golden.py — independent numpy ports of the CUDA math).

These are the executable analog of the reference's Oxford golden-file
harness (testScripts/testOxfordDataset.sh.in): every stage of the chain —
pyramid, DoG, detection+refinement, orientation — is compared against
scalar ports of the corresponding CUDA kernels on synthetic scenes, per
SiftMode, with float tolerance (texture fixed-point interpolation makes
bit-equality meaningless, SURVEY.md §7)."""

import numpy as np
import pytest

import jax

from popsift_tpu.config import Config, SiftMode
from popsift_tpu.extract import make_plan, normalize_input
from popsift_tpu.gauss import build_gauss_info
from popsift_tpu.ops import extrema as ops_ext
from popsift_tpu.ops import orientation as ops_ori
from popsift_tpu.ops import pyramid as ops_pyr

import ref_golden as ref


@pytest.fixture(scope="module")
def scene():
    """Reproducible natural-texture scene, big enough for 3 octaves."""
    rng = np.random.default_rng(7)
    h, w = 96, 128
    img = rng.random((h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def _build_repo_pyramid(config, image):
    h, w = image.shape
    plan = make_plan(config, w, h)
    gauss = build_gauss_info(config)
    stacks = jax.jit(lambda im: ops_pyr.build_pyramid(
        im, gauss, plan.dims, plan.levels, plan.gauss_mode,
        plan.scaling_mode, plan.sift_mode, plan.upscale_factor))(
            normalize_input(image))
    return plan, gauss, [np.asarray(s) for s in stacks]


def test_pyramid_parity_default(scene):
    """Repo pyramid vs the golden port of normalizedSource::horiz +
    absoluteSource blurs + downscale (default VLFeat-table incremental
    path), every level of every octave."""
    config = Config()
    plan, gauss, stacks = _build_repo_pyramid(config, scene)

    shift0 = ops_pyr.input_shift(plan.sift_mode, plan.upscale_factor, 0)
    # dims are (w, h); the golden builds [ (w,h) ] in the same order
    ref_stacks = ref.ref_pyramid_default(
        normalize_input(scene), plan.dims, plan.levels, gauss, shift0)

    for o, (got, want) in enumerate(zip(stacks, ref_stacks)):
        assert got.shape == want.shape
        # interior: strict tolerance.  Borders differ slightly by design:
        # the repo resamples the input to the octave grid then clamps on
        # that grid, the reference clamps in source texture coordinates.
        gi = got[:, 2:-2, 2:-2]
        wi = want[:, 2:-2, 2:-2]
        err = np.max(np.abs(gi - wi))
        assert err < 2e-3, f"octave {o}: interior max err {err}"
        full_err = np.max(np.abs(got - want))
        assert full_err < 0.35, f"octave {o}: border max err {full_err}"


def _dog_from_stack(stack):
    return ref.ref_make_dog(stack)


@pytest.mark.parametrize("mode", [SiftMode.POPSIFT, SiftMode.VLFEAT,
                                  SiftMode.OPENCV])
def test_detection_refinement_parity(scene, mode):
    """Repo detection+refinement vs the golden port of
    find_extrema_in_dog_sub on the SAME DoG volume (isolates the
    refinement numerics from pyramid differences), per SiftMode."""
    config = Config()
    config.set_mode(mode)
    plan, gauss, stacks = _build_repo_pyramid(config, scene)

    total_checked = 0
    for o in range(min(plan.octaves, 3)):
        dog = _dog_from_stack(stacks[o])
        w, h = plan.dims[o]

        want = ref.ref_find_extrema(
            dog, mode.value, w, h, plan.levels, plan.peak_threshold,
            plan.edge_limit, plan.sigma0, plan.sigma_k,
            plan.filter_grid_size)

        got = jax.jit(lambda d: ops_ext.find_extrema(
            d, plan.sift_mode, plan.sigma0, plan.sigma_k,
            plan.peak_threshold, plan.edge_limit, plan.filter_grid_size,
            plan.cand_caps[o], plan.ext_caps[o]))(dog)
        n = int(got.count)
        gx = np.asarray(got.xpos[:n])
        gy = np.asarray(got.ypos[:n])
        gl = np.asarray(got.lpos[:n])
        gs = np.asarray(got.sigma[:n])
        gc = np.asarray(got.cell[:n])

        assert n == len(want), \
            f"octave {o} {mode}: {n} vs golden {len(want)} extrema"
        # both are in raster order (level-major, y, x of the original
        # candidate); compare slot by slot
        for i, r in enumerate(want):
            assert abs(gx[i] - r["xpos"]) < 1e-3, (o, i, mode)
            assert abs(gy[i] - r["ypos"]) < 1e-3, (o, i, mode)
            assert gl[i] == r["lpos"], (o, i, mode)
            assert abs(gs[i] - r["sigma"]) < 1e-3, (o, i, mode)
            assert gc[i] == r["cell"], (o, i, mode)
        total_checked += n
    assert total_checked >= 20, "scene too sparse to be meaningful"


def test_orientation_parity(scene):
    """Repo orientation assignment vs the golden port of ori_par on the
    same keypoints and the same blurred levels."""
    config = Config()
    plan, gauss, stacks = _build_repo_pyramid(config, scene)
    from popsift_tpu.extract import grad_pad_dims
    from popsift_tpu.ops import gradients as ops_grad

    pad_y, pad_x = grad_pad_dims(plan)
    checked = 0
    for o in range(min(plan.octaves, 2)):
        dog = _dog_from_stack(stacks[o])
        w, h = plan.dims[o]
        got_ext = jax.jit(lambda d: ops_ext.find_extrema(
            d, plan.sift_mode, plan.sigma0, plan.sigma_k,
            plan.peak_threshold, plan.edge_limit, plan.filter_grid_size,
            plan.cand_caps[o], plan.ext_caps[o]))(dog)
        n = int(got_ext.count)
        if n == 0:
            continue

        field = jax.jit(lambda s: ops_grad.padded_gradient_field(
            s, pad_y, pad_x))(jax.numpy.asarray(stacks[o]))
        num_ori, oris = jax.jit(lambda f, e: ops_ori.assign_orientations(
            f, pad_y, pad_x, e.xpos, e.ypos, e.lpos, e.sigma, e.valid,
            w, h, plan.ori_win))(field, got_ext)
        num_ori = np.asarray(num_ori)
        oris = np.asarray(oris)

        for i in range(n):
            lvl = int(got_ext.lpos[i])
            lvl = min(max(lvl, 0), stacks[o].shape[0] - 1)
            want = ref.ref_orientation(
                stacks[o][lvl], float(got_ext.xpos[i]),
                float(got_ext.ypos[i]), float(got_ext.sigma[i]), w, h)
            assert num_ori[i] == len(want), (o, i)
            for k, ang in enumerate(want):
                assert abs(oris[i, k] - ang) < 2e-3, (o, i, k)
            checked += 1
    assert checked >= 10
