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


def test_desc_tables_parity():
    """Repo desc_gauss/desc_tile vs the golden port of init_constants
    (sift_constants.cu:34-47)."""
    from popsift_tpu.constants import build_const_info
    consts = build_const_info(Config())
    g, t = ref.ref_desc_tables()
    np.testing.assert_allclose(np.asarray(consts.desc_gauss), g,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(consts.desc_tile), t, rtol=1e-6)


def _desc_fixture(seed=11, h=64, w=96, n=6):
    rng = np.random.default_rng(seed)
    layer = rng.random((h, w)).astype(np.float32)
    for _ in range(2):
        layer = (layer + np.roll(layer, 1, 0) + np.roll(layer, -1, 0)
                 + np.roll(layer, 1, 1) + np.roll(layer, -1, 1)) / 5.0
    x = rng.uniform(12, w - 13, n).astype(np.float32)
    y = rng.uniform(12, h - 13, n).astype(np.float32)
    sig = rng.uniform(1.0, 2.2, n).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    return layer, x, y, sig, ang


def test_desc_notile_parity():
    """Repo NoTile/IGrid descriptors (ops.descriptors.grid_descriptors)
    vs the golden port of ext_desc_notile_sub (s_desc_notile.cu:31-92)."""
    from popsift_tpu.constants import build_const_info
    from popsift_tpu.ops import descriptors as ops_desc

    layer, x, y, sig, ang = _desc_fixture()
    n = x.shape[0]
    consts = build_const_info(Config())
    stack = layer[None]
    got = np.asarray(ops_desc.grid_descriptors(
        jax.numpy.asarray(stack), x, y, np.zeros(n, np.int32), sig, ang,
        np.ones(n, bool), np.asarray(consts.desc_gauss),
        np.asarray(consts.desc_tile)))
    for i in range(n):
        want = ref.ref_desc_notile(layer, float(x[i]), float(y[i]),
                                   float(sig[i]), float(ang[i]))
        np.testing.assert_allclose(
            got[i], want, atol=2e-3 * max(1.0, float(np.abs(want).max())),
            err_msg=f"slot {i}")


def test_desc_grid_parity():
    """Repo Grid descriptors (grid_rounded_descriptors) vs the golden
    port of ext_desc_grid_sub (s_desc_grid.cu:18-121)."""
    from popsift_tpu.ops import descriptors as ops_desc

    layer, x, y, sig, ang = _desc_fixture(seed=13)
    n = x.shape[0]
    stack = layer[None]
    got = np.asarray(ops_desc.grid_rounded_descriptors(
        jax.numpy.asarray(stack), x, y, np.zeros(n, np.int32), sig, ang,
        np.ones(n, bool)))
    for i in range(n):
        want = ref.ref_desc_grid(layer, float(x[i]), float(y[i]),
                                 float(sig[i]), float(ang[i]))
        np.testing.assert_allclose(
            got[i], want, atol=2e-3 * max(1.0, float(np.abs(want).max())),
            err_msg=f"slot {i}")


@pytest.mark.parametrize("mode_name,ref_mode", [
    ("largest", "largest"), ("smallest", "smallest")])
def test_grid_filter_parity(mode_name, ref_mode):
    """Repo grid filter (ops.filtergrid.grid_filter_keep_masks) vs the
    golden port of the host-side newlimit algorithm
    (s_filtergrid.cu:110-318), including the C++ integer division."""
    from popsift_tpu.config import GridFilterMode
    from popsift_tpu.ops import filtergrid as ops_fg
    from popsift_tpu.ops.extrema import InitialExtrema

    rng = np.random.default_rng(17)
    grid_size = 2
    n_cells = grid_size * grid_size
    octave_counts = [60, 40, 20]
    budget = 70   # 70 * 1.1 < 120 -> filter triggers

    entries = []
    exts = []
    for o, cnt in enumerate(octave_counts):
        cap = 64
        cell = rng.integers(0, n_cells, cap).astype(np.int32)
        sigma = rng.uniform(1.0, 4.0, cap).astype(np.float32)
        valid = np.arange(cap) < cnt
        import jax.numpy as jnp
        exts.append(InitialExtrema(
            xpos=jnp.zeros(cap), ypos=jnp.zeros(cap),
            lpos=jnp.zeros(cap, jnp.int32), sigma=jnp.asarray(sigma),
            cell=jnp.asarray(cell), valid=jnp.asarray(valid),
            count=jnp.int32(cnt), overflow=jnp.int32(0)))
        for i in range(cnt):
            entries.append(dict(octave=o, cell=int(cell[i]),
                                sigma=float(sigma[i])))

    mode = (GridFilterMode.LARGEST_SCALE_FIRST if mode_name == "largest"
            else GridFilterMode.SMALLEST_SCALE_FIRST)
    keeps = ops_fg.grid_filter_keep_masks(exts, budget, grid_size, mode)

    want = ref.ref_grid_filter(entries, budget, grid_size, ref_mode)
    got = []
    for o, cnt in enumerate(octave_counts):
        got.extend(bool(v) for v in np.asarray(keeps[o])[:cnt])
    assert got == want
    # the surviving total respects the budget the way the reference's
    # clamp does (within one cell's worth of slack)
    assert sum(got) <= budget + n_cells
