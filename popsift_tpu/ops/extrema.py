"""DoG extremum detection + sub-voxel refinement, TPU-native.

Replaces the atomic-compaction CUDA kernel of the reference
(/root/reference/src/popsift/s_extrema.cu) with:

1. a **dense** 26-neighbour strict-extremum test + contrast gate over the
   whole DoG volume (vector ops, no divergence),
2. cumsum-based **compaction** of the candidate mask into a fixed-capacity
   buffer (replaces ballot/popc/atomicAdd, s_extrema.cu:22-44, and the
   clamp-to-max_extrema barrier, s_extrema.cu:549-557 — here the clamp is a
   simple `min(count, capacity)` in raster order),
3. a **batched** Newton refinement over candidate slots (≤5 iterations,
   closed-form 3x3 solve from s_solve.h:25-86) with the three SiftMode
   policies (ModeFunctions<...>, s_extrema.cu:145-298).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiftMode

MAX_ITERATIONS = 5  # s_extrema.cu:362


class InitialExtrema(NamedTuple):
    """SoA analog of InitialExtremum[] (sift_extremum.h:25-39), padded to a
    fixed capacity."""

    xpos: jnp.ndarray    # (cap,) f32
    ypos: jnp.ndarray    # (cap,) f32
    lpos: jnp.ndarray    # (cap,) i32
    sigma: jnp.ndarray   # (cap,) f32
    cell: jnp.ndarray    # (cap,) i32 grid-filter cell id
    valid: jnp.ndarray   # (cap,) bool
    count: jnp.ndarray   # () i32 — number of valid leading slots
    overflow: jnp.ndarray  # () i32 — survivors dropped by the capacity clamp


def detect_candidates(dog: jnp.ndarray, sift_mode: SiftMode,
                      peak_threshold: float) -> jnp.ndarray:
    """Dense candidate mask.

    dog : (levels+2, H, W).  Returns a bool mask of shape (levels, H, W)
    where mask[z] corresponds to dog layer z+1 (the searchable inner layers,
    find_extrema_in_dog launch shape, s_extrema.cu:506-517).

    Implements first_contrast_ok (per mode) + is_extremum
    (s_extrema.cu:56-120): value strictly greater than (or strictly less
    than) all 26 neighbours, clamp addressing at the borders.
    """
    levels = dog.shape[0] - 2
    h, w = dog.shape[-2], dog.shape[-1]

    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and h * w >= 256 * 1024:
        # tiled roll kernel: one HBM pass instead of 26 lane-misaligned
        # relayouts (kernels/detect.py)
        from ..kernels.detect import detect_pallas
        return detect_pallas(dog, sift_mode, peak_threshold)

    # Border pixels are excluded by the launch-grid offset of the CUDA
    # kernel anyway (s_extrema.cu:506-517), so the 26-neighbour test runs
    # on the (h-2, w-2) interior using pure slices of the UNPADDED volume
    # — a jnp.pad of the 160 MB octave-0 DoG materialises a full copy per
    # shifted operand, which dominated this stage's cost — and the mask
    # gets one cheap bool pad back to (levels, h, w).
    hi, wi = h - 2, w - 2
    center = dog[1:levels + 1, 1:1 + hi, 1:1 + wi]

    nb_max = None
    nb_min = None
    for dz in (-1, 0, 1):
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dz == 0 and dy == 1 and dx == 1:
                    continue
                nb = dog[1 + dz:levels + 1 + dz, dy:dy + hi, dx:dx + wi]
                nb_max = nb if nb_max is None else jnp.maximum(nb_max, nb)
                nb_min = nb if nb_min is None else jnp.minimum(nb_min, nb)

    is_ext = (center > nb_max) | (center < nb_min)

    # first_contrast_ok (s_extrema.cu:150-153, 200-204, 252-256)
    t = jnp.float32(peak_threshold)
    aval = jnp.abs(center)
    if sift_mode == SiftMode.OPENCV:
        gate = aval >= jnp.floor(t)
    elif sift_mode == SiftMode.VLFEAT:
        gate = aval >= 0.8 * 2.0 * t
    else:
        gate = aval >= 1.6 * t

    mask = is_ext & gate
    if sift_mode == SiftMode.OPENCV:
        # OpenCV mode excludes a 5-pixel border (s_extrema.cu:151)
        ys = jnp.arange(hi)[None, :, None]
        xs = jnp.arange(wi)[None, None, :]
        mask &= (xs >= 4) & (xs < wi - 4) & (ys >= 4) & (ys < hi - 4)

    return jnp.pad(mask, ((0, 0), (1, 1), (1, 1)))


_BLOCK = 1024      # compaction block (one x-run of the raster)
_PER_BLOCK = 16    # max survivors kept per block (strict 26-neighbour
                   # extrema are >= 2 apart along x, so a block can
                   # physically hold <= 512; realistic images hold < 10).
                   # 8 was tried (round 5: the extraction loop + raster
                   # sort cost ~2.9 ms/image, one full pass over the
                   # packed word volume per slot) and rejected — the
                   # Poisson tail of moderately dense content exceeds 8
                   # per block, and a ~1.5 ms device win does not buy
                   # weakened clamp semantics.


def compact_mask(mask: jnp.ndarray, cap: int):
    """Compact True positions of a (levels, H, W) mask into a fixed-capacity
    coordinate buffer, in raster (z, y, x) order.

    Returns (x, y, z, valid, count, overflow); z is the *mask* layer index
    (add 1 for the DoG layer / blur level).

    A naive cumsum+scatter over the full voxel count costs ~160 ms at 4K on
    TPU (XLA scatter is per-update).  Instead: per 1024-element block,
    extract up to 16 survivors with vectorised iterative min-extraction
    (no gather/scatter), then compact the (n_blocks, 16) survivor table —
    three orders of magnitude fewer scatter updates.  Block overflow counts
    toward `overflow` (the reference clamps on overflow too,
    s_extrema.cu:549-557).
    """
    levels, h, w = mask.shape
    n = levels * h * w
    flat = mask.reshape(-1)
    total = jnp.sum(flat.astype(jnp.int32))

    nb = -(-n // _BLOCK)
    pad = nb * _BLOCK - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    big = jnp.int32(n + 1)

    # Pack each 1024-element block into 32 uint32 bit-words: all further
    # extraction work then runs on a 32x smaller array (the earlier
    # formulation iterated min-extraction over a full (nb, 1024) i32 key
    # array — 16 passes over 100 MB at 1080p, ~7 ms of the fused program).
    flat2 = flat.reshape(nb, _BLOCK)
    weights = jnp.asarray((1 << np.arange(32, dtype=np.int64))
                          .astype(np.uint32))
    word_cols = []
    for j in range(_BLOCK // 32):
        seg = flat2[:, j * 32:(j + 1) * 32]
        word_cols.append(
            jnp.sum(seg.astype(jnp.uint32) * weights[None, :], axis=1,
                    dtype=jnp.uint32))
    words = jnp.stack(word_cols, axis=1)               # (nb, 32) u32

    # extract the first _PER_BLOCK set bits per block, in raster order:
    # find the first nonzero word, strip its lowest set bit, repeat
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 32), 1)
    block_base = jnp.arange(nb, dtype=jnp.int32) * _BLOCK
    recs = []
    for _ in range(_PER_BLOCK):
        nz = words != 0
        widx = jnp.min(jnp.where(nz, lane, 33), axis=1)          # (nb,)
        sel = lane == widx[:, None]
        wsel = jnp.max(jnp.where(sel, words, 0), axis=1)         # (nb,) u32
        low = wsel & (~wsel + jnp.uint32(1))
        pos = jax.lax.population_count(low - jnp.uint32(1)) \
            .astype(jnp.int32)
        found = widx < 33
        recs.append(jnp.where(found,
                              block_base + widx * 32 + pos, big))
        words = jnp.where(sel, words & ~low[:, None], words)
    rec = jnp.stack(recs, axis=1)                      # (nb, _PER_BLOCK)

    # compact the survivor table: ascending sort moves the big sentinels
    # past every valid linear index while preserving raster order
    rflat = rec.reshape(-1)
    rvalid = rflat < big
    if cap > rflat.shape[0]:
        rflat = jnp.pad(rflat, (0, cap - rflat.shape[0]),
                        constant_values=n + 1)
    # k-smallest by full sort.  A top_k formulation was tried (round 5)
    # and REJECTED: XLA:TPU lowers top_k over this size to a two-array
    # (keys + iota) sort — strictly more work than this single-array
    # sort, which the device trace puts at ~0.5 ms/image in-program.
    buf = jnp.minimum(jax.lax.sort(rflat)[:cap], n - 1)

    kept = jnp.minimum(jnp.sum(rvalid.astype(jnp.int32)), cap)
    count = kept
    overflow = total - count
    valid = jnp.arange(cap, dtype=jnp.int32) < count

    z = buf // (h * w)
    rem = buf % (h * w)
    y = rem // w
    x = rem % w
    # park invalid slots at a safe interior coordinate
    one = jnp.int32(1)
    x = jnp.where(valid, x, one)
    y = jnp.where(valid, y, one)
    z = jnp.where(valid, z, jnp.int32(0))
    return x, y, z, valid, count, overflow


def compact_words(words: jnp.ndarray, cap: int):
    """Compact a sublane-bit-packed candidate volume (from
    :func:`popsift_tpu.kernels.detect.detect_packed_pallas`) into the same
    fixed-capacity coordinate buffer as :func:`compact_mask`.

    ``words``: (levels, G, Wp) uint32 — bit r of ``words[z, g, x]`` is the
    mask at row ``32g + r``, column ``x``.  Global raster (z, y, x) order
    is restored exactly by sorting true raster keys; only the per-block
    survivor budget differs from :func:`compact_mask` (16 per 32x32 patch
    instead of 16 per 1024-pixel x-run — both clamp to `overflow` like
    s_extrema.cu:549-557, and neither triggers on natural images).
    """
    levels, G, Wp = words.shape
    Hp = G * 32
    n = levels * Hp * Wp
    big = jnp.int32(n + 1)

    wflat = words.reshape(-1)
    total = jnp.sum(jax.lax.population_count(wflat).astype(jnp.int32))

    nwords = levels * G * Wp
    nb = -(-nwords // 32)
    if nb * 32 != nwords:
        wflat = jnp.pad(wflat, (0, nb * 32 - nwords))
    w2 = wflat.reshape(nb, 32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, 32), 1)
    block_base = jnp.arange(nb, dtype=jnp.int32) * 32
    gw = jnp.int32(G * Wp)
    recs = []
    for _ in range(_PER_BLOCK):
        nz = w2 != 0
        widx = jnp.min(jnp.where(nz, lane, 33), axis=1)          # (nb,)
        sel = lane == widx[:, None]
        wsel = jnp.max(jnp.where(sel, w2, 0), axis=1)            # u32
        low = wsel & (~wsel + jnp.uint32(1))
        pos = jax.lax.population_count(low - jnp.uint32(1)) \
            .astype(jnp.int32)
        found = widx < 33
        gwi = block_base + jnp.minimum(widx, 31)
        z = gwi // gw
        rem = gwi - z * gw
        g = rem // Wp
        x = rem - g * Wp
        key = (z * Hp + g * 32 + pos) * Wp + x
        recs.append(jnp.where(found, key, big))
        w2 = jnp.where(sel, w2 & ~low[:, None], w2)
    rec = jnp.stack(recs, axis=1)

    rflat = rec.reshape(-1)
    rvalid = rflat < big
    if cap > rflat.shape[0]:
        rflat = jnp.pad(rflat, (0, cap - rflat.shape[0]),
                        constant_values=n + 1)
    # k-smallest by full sort.  A top_k formulation was tried (round 5)
    # and REJECTED: XLA:TPU lowers top_k over this size to a two-array
    # (keys + iota) sort — strictly more work than this single-array
    # sort, which the device trace puts at ~0.5 ms/image in-program.
    buf = jnp.minimum(jax.lax.sort(rflat)[:cap], n - 1)

    count = jnp.minimum(jnp.sum(rvalid.astype(jnp.int32)), cap)
    overflow = total - count
    valid = jnp.arange(cap, dtype=jnp.int32) < count

    z = buf // (Hp * Wp)
    rem = buf % (Hp * Wp)
    y = rem // Wp
    x = rem % Wp
    one = jnp.int32(1)
    x = jnp.where(valid, x, one)
    y = jnp.where(valid, y, one)
    z = jnp.where(valid, z, jnp.int32(0))
    return x, y, z, valid, count, overflow


def detect_and_compact(dog: jnp.ndarray, sift_mode: SiftMode,
                       peak_threshold: float, cap: int,
                       true_dims: tuple | None = None):
    """Dense detection + candidate compaction, picking the fused
    Pallas detect+bitpack path on TPU for large planes (the bool mask
    never round-trips HBM) and the mask path elsewhere.

    ``true_dims=(h, w)``: true image dims when ``dog`` carries the fused
    octave chain's block-alignment surplus.  The Pallas path folds the
    surplus into its own halo pad for free (in-bounds gating keeps
    border exclusion and candidate raster coordinates reference-exact);
    the XLA path slices it off."""
    h, w = true_dims if true_dims is not None else dog.shape[-2:]
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and h * w >= 256 * 1024:
        from ..kernels.detect import detect_packed_pallas
        words = detect_packed_pallas(dog, sift_mode, peak_threshold,
                                     true_dims=(h, w))
        return compact_words(words, cap)
    if (h, w) != dog.shape[-2:]:
        dog = dog[:, :h, :w]
    mask = detect_candidates(dog, sift_mode, peak_threshold)
    return compact_mask(mask, cap)


def _gather27(dog_padded: jnp.ndarray, n_x, n_y, n_z,
              active=None) -> jnp.ndarray:
    """Batched 3x3x3 window gather around integer coordinates (z, y, x);
    Pallas DMA + one-hot extraction on TPU, flat XLA gather elsewhere.
    Inactive slots skip their DMA and return unusable values."""
    from ..kernels.refine import gather27
    return gather27(dog_padded, n_x, n_y, n_z, active=active)


def _solve3(A00, A01, A02, A11, A12, A22, bx, by, bz):
    """Closed-form symmetric 3x3 solve (s_solve.h:25-86).

    Returns (ok, dx, dy, dz); ok==False means det == 0.
    """
    det0 = A11 * A22 - A12 * A12
    det1 = A12 * A02 - A01 * A22
    det2 = A01 * A12 - A11 * A02
    det3 = A00 * A22 - A02 * A02
    det4 = A01 * A02 - A00 * A12
    det5 = A00 * A11 - A01 * A01
    det = A00 * det0 + A01 * det1 + A02 * det2
    ok = det != 0.0
    rsd = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    i00 = det0 * rsd
    i01 = det1 * rsd
    i02 = det2 * rsd
    i11 = det3 * rsd
    i12 = det4 * rsd
    i22 = det5 * rsd
    dx = i00 * bx + i01 * by + i02 * bz
    dy = i01 * bx + i11 * by + i12 * bz
    dz = i02 * bx + i12 * by + i22 * bz
    return ok, dx, dy, dz


def refine_extrema(dog: jnp.ndarray,
                   cand_x: jnp.ndarray, cand_y: jnp.ndarray,
                   cand_z: jnp.ndarray, cand_valid: jnp.ndarray,
                   sift_mode: SiftMode,
                   sigma0: float, sigma_k: float,
                   peak_threshold: float, edge_limit: float,
                   grid_w_div: float, grid_h_div: float,
                   grid_width: int):
    """Batched Newton refinement of candidate extrema (single octave).

    cand_z is the DoG layer index (candidate layers are 1..levels).
    Returns per-slot (xpos, ypos, lpos, sigma, cell, ok).
    """
    outs = refine_extrema_multi(
        [dog], [(cand_x, cand_y, cand_z, cand_valid)], sift_mode,
        sigma0, sigma_k, peak_threshold, edge_limit,
        [(grid_w_div, grid_h_div)], grid_width)
    return outs[0]


def refine_extrema_multi(dogs, cands, sift_mode: SiftMode,
                         sigma0: float, sigma_k: float,
                         peak_threshold: float, edge_limit: float,
                         grid_divs, grid_width: int,
                         true_dims=None):
    """Joint Newton refinement across octaves.

    One while_loop drives ALL octaves' candidates concatenated into one
    vector state: the per-iteration cost of the refinement loop is
    dominated by fixed per-op dispatch overhead on small vectors, not by
    the 27-point DMA gathers (measured 6.3 ms vs 0.4 ms at 1080p), so a
    per-octave loop pays that overhead once per octave per iteration
    while this pays it once per iteration.  The gathers stay per-octave
    (each octave has its own DoG field); everything else is vectorised
    over the concatenation, with per-slot width/height/grid constants.

    dogs : list of (L, H_o, W_o) DoG stacks (same L).
    cands : list of (cand_x, cand_y, cand_z, cand_valid) per octave.
    grid_divs : list of (grid_w_div, grid_h_div) per octave.
    Returns a list of per-octave (xpos, ypos, lpos, sigma, cell, ok).
    """
    n_layers = dogs[0].shape[0]
    maxlevel = n_layers  # find_extrema passes _levels-1 == dog layers

    # pad to the DMA-friendly shape the 27-point kernel expects; pad values
    # are never selected (candidate coordinates stay >= 1 from the borders)
    dogps = []
    for dog in dogs:
        h, w = dog.shape[-2], dog.shape[-1]
        hp = max(-(-h // 8) * 8, 16)
        wp = max(-(-w // 128) * 128, 256)
        dogps.append(jnp.pad(dog, ((0, 0), (0, hp - h), (0, wp - w)),
                             mode="edge"))

    ns = [c[0].shape[0] for c in cands]
    offs = np.concatenate([[0], np.cumsum(ns)]).astype(int)

    def catv(i, dtype=None):
        parts = [c[i] for c in cands]
        out = jnp.concatenate(parts)
        return out.astype(dtype) if dtype is not None else out

    nx = catv(0, jnp.int32)
    ny = catv(1, jnp.int32)
    nz = catv(2, jnp.int32)
    cand_valid = catv(3)

    def per_slot(vals, dtype):
        return jnp.concatenate([
            jnp.full((n,), v, dtype) for n, v in zip(ns, vals)])

    # boundary clamps/rejection use the TRUE image dims: a fused-chain
    # DoG carries block-alignment surplus (edge-replicated values) that
    # must not widen the reference's [border, dim-border) window
    if true_dims is None:
        true_dims = [(d.shape[-1], d.shape[-2]) for d in dogs]
    width = per_slot([td[0] for td in true_dims], jnp.int32)
    height = per_slot([td[1] for td in true_dims], jnp.int32)
    w_f = width.astype(jnp.float32)
    h_f = height.astype(jnp.float32)
    gwd = per_slot([g[0] for g in grid_divs], jnp.float32)
    ghd = per_slot([g[1] for g in grid_divs], jnp.float32)

    zeros = jnp.zeros(nx.shape, jnp.float32)
    state = dict(
        nx=nx, ny=ny, nz=nz,
        v=zeros,  # DoG value at the *initial* position (s_extrema.cu:356)
        dx=zeros, dy=zeros, dz=zeros,
        Dx=zeros, Dy=zeros, Dz=zeros,
        DDx=zeros, DDy=zeros, DDz=zeros,
        DXx=zeros, DXy=zeros, DXz=zeros,
        done=jnp.zeros_like(cand_valid),
        failed=~cand_valid,
        done_iter=jnp.full(nx.shape, MAX_ITERATIONS + 1, jnp.int32),
    )

    is_opencv = sift_mode == SiftMode.OPENCV
    is_vlfeat = sift_mode == SiftMode.VLFEAT

    def body(it, st):
        active = ~st["done"] & ~st["failed"]

        win = jnp.concatenate([
            _gather27(dogps[o],
                      st["nx"][offs[o]:offs[o + 1]],
                      st["ny"][offs[o]:offs[o + 1]],
                      st["nz"][offs[o]:offs[o + 1]],
                      active=active[offs[o]:offs[o + 1]])
            for o in range(len(dogs))])                      # (cap,3,3,3)
        p = lambda dz_, dy_, dx_: win[:, 1 + dz_, 1 + dy_, 1 + dx_]
        # the first iteration's centre is the initial position (inactive
        # slots read stale data here, but they are already failed and
        # every v consumer is gated on ok/active)
        st = dict(st, v=jnp.where((it == 1) & active, p(0, 0, 0), st["v"]))

        Dx = 0.5 * (p(0, 0, 1) - p(0, 0, -1))
        Dy = 0.5 * (p(0, 1, 0) - p(0, -1, 0))
        Dz = 0.5 * (p(1, 0, 0) - p(-1, 0, 0))
        c = p(0, 0, 0)
        DDx = p(0, 0, 1) + p(0, 0, -1) - 2.0 * c
        DDy = p(0, 1, 0) + p(0, -1, 0) - 2.0 * c
        DDz = p(1, 0, 0) + p(-1, 0, 0) - 2.0 * c
        DXx = 0.25 * (p(0, 1, 1) + p(0, -1, -1) - p(0, 1, -1) - p(0, -1, 1))
        DXy = 0.25 * (p(1, 0, 1) + p(-1, 0, -1) - p(1, 0, -1) - p(-1, 0, 1))
        DXz = 0.25 * (p(1, 1, 0) + p(-1, -1, 0) - p(1, -1, 0) - p(-1, 1, 0))

        ok, sx, sy, sz = _solve3(DDx, DXx, DXy, DDy, DXz, DDz,
                                 -Dx, -Dy, -Dz)
        # det == 0: d = 0, break with success (s_extrema.cu:425-430)
        dx = jnp.where(ok, sx, 0.0)
        dy = jnp.where(ok, sy, 0.0)
        dz = jnp.where(ok, sz, 0.0)
        solve_break = ~ok

        nx_, ny_, nz_ = st["nx"], st["ny"], st["nz"]
        last_it = it == MAX_ITERATIONS

        if is_opencv:
            conv = (jnp.abs(dx) < 0.5) & (jnp.abs(dy) < 0.5) \
                & (jnp.abs(dz) < 0.5)
            mx = nx_ + jnp.round(dx).astype(jnp.int32)
            my = ny_ + jnp.round(dy).astype(jnp.int32)
            mz = nz_ + jnp.round(dz).astype(jnp.int32)
            oob = (mx < 5) | (mx >= width - 5) | (my < 5) | \
                (my >= height - 5) | (mz < 1) | (mz > maxlevel - 2)
            step_fail = ~conv & oob
            new_done = conv | solve_break
            new_fail = ~solve_break & step_fail
            nx_n = jnp.where(~conv & ~solve_break, mx, nx_)
            ny_n = jnp.where(~conv & ~solve_break, my, ny_)
            nz_n = jnp.where(~conv & ~solve_break, mz, nz_)
        else:
            # VLFeat (s_extrema.cu:207-232) / PopSift (s_extrema.cu:259-284)
            tx = jnp.where((dx >= 0.6) & (nx_ < width - 2), 1, 0) \
                + jnp.where((dx <= -0.6) & (nx_ > 1), -1, 0)
            ty = jnp.where((dy >= 0.6) & (ny_ < height - 2), 1, 0) \
                + jnp.where((dy <= -0.6) & (ny_ > 1), -1, 0)
            if is_vlfeat:
                tz = jnp.zeros_like(tx)
            else:
                tz = jnp.where((dz >= 0.6) & (nz_ < maxlevel - 1), 1, 0) \
                    + jnp.where((dz <= -0.6) & (nz_ > 1), -1, 0)
            no_move = (tx == 0) & (ty == 0) & (tz == 0)
            # on the last iteration refine() returns 0 without moving
            new_done = solve_break | (~last_it & no_move)
            new_fail = jnp.zeros_like(no_move)
            do_move = ~solve_break & ~last_it & ~no_move
            nx_n = jnp.where(do_move, nx_ + tx, nx_)
            ny_n = jnp.where(do_move, ny_ + ty, ny_)
            nz_n = jnp.where(do_move, nz_ + tz, nz_)

        upd = lambda old, new: jnp.where(active, new, old)
        st2 = dict(st)  # carries the it==1 'v' update above
        st2["nx"] = upd(nx_, nx_n)
        st2["ny"] = upd(ny_, ny_n)
        st2["nz"] = upd(nz_, nz_n)
        for name, val in (("dx", dx), ("dy", dy), ("dz", dz),
                          ("Dx", Dx), ("Dy", Dy), ("Dz", Dz),
                          ("DDx", DDx), ("DDy", DDy), ("DDz", DDz),
                          ("DXx", DXx), ("DXy", DXy), ("DXz", DXz)):
            st2[name] = upd(st[name], val)
        st2["done"] = st["done"] | (active & new_done)
        st2["failed"] = st["failed"] | (active & new_fail)
        st2["done_iter"] = jnp.where(active & new_done, it, st["done_iter"])
        return st2

    # Early-exit iteration: the reference's per-thread loop breaks as soon
    # as a candidate stops moving (s_extrema.cu:362-430); on natural images
    # almost every candidate converges on the first iteration, so a global
    # all-converged exit skips most of the 5 dense gather passes.  Results
    # are bit-identical to the fixed fori_loop: the body is a no-op for
    # slots already done/failed.
    def cond(carry):
        it, st = carry
        return (it <= MAX_ITERATIONS) & jnp.any(~st["done"] & ~st["failed"])

    def wbody(carry):
        it, st = carry
        return it + 1, body(it, st)

    _, st = jax.lax.while_loop(cond, wbody, (jnp.int32(1), state))

    ok = cand_valid & ~st["failed"]

    if is_opencv:
        # ensure convergence (s_extrema.cu:447-452): done before hitting the
        # iteration limit — converging *on* the 5th iteration still leaves
        # iter >= MAX_ITERATIONS and is rejected
        ok &= st["done_iter"] < MAX_ITERATIONS
    else:
        # excessive movement (s_extrema.cu:454-459) — signed comparison!
        ok &= ~((st["dx"] >= 1.5) | (st["dy"] >= 1.5) | (st["dz"] >= 1.5))

    xn = st["nx"].astype(jnp.float32) + st["dx"]
    yn = st["ny"].astype(jnp.float32) + st["dy"]
    sn = st["nz"].astype(jnp.float32) + st["dz"]

    if not is_opencv:
        # verify (s_extrema.cu:234-245, 286-297)
        ok &= ~((xn < 0.0) | (xn > w_f - 1.0) | (yn < 0.0)
                | (yn > h_f - 1.0) | (sn < 0.0) | (sn > maxlevel))

    contr = st["v"] + 0.5 * (st["Dx"] * st["dx"] + st["Dy"] * st["dy"]
                             + st["Dz"] * st["dz"])
    tr = st["DDx"] + st["DDy"]
    det = st["DDx"] * st["DDy"] - st["DXx"] * st["DXx"]
    edgeval = tr * tr / jnp.where(det == 0, 1.0, det)

    ok &= det > 0.0
    ok &= jnp.abs(contr) >= 2.0 * peak_threshold
    r = edge_limit
    ok &= edgeval < (r + 1.0) * (r + 1.0) / r

    lpos = jnp.round(sn).astype(jnp.int32)
    sigma = sigma0 * jnp.power(jnp.float32(sigma_k), sn)
    cell = (jnp.floor(yn / ghd).astype(jnp.int32) * grid_width
            + jnp.floor(xn / gwd).astype(jnp.int32))

    return [tuple(v[offs[o]:offs[o + 1]]
                  for v in (xn, yn, lpos, sigma, cell, ok))
            for o in range(len(dogs))]


def compact_extrema(xn, yn, lpos, sigma, cell, ok, cap: int) -> InitialExtrema:
    """Re-compact surviving refined extrema to the front of a fixed-capacity
    buffer (raster order; the CUDA version's order is atomic-nondeterministic
    so any stable order is fair)."""
    incl = jnp.cumsum(ok.astype(jnp.int32))
    total = incl[-1]
    idx = incl - 1
    dest = jnp.where(ok & (idx < cap), idx, cap)

    def scat(vals, fill):
        return jnp.full((cap,), fill, vals.dtype).at[dest].set(
            vals, mode="drop")

    count = jnp.minimum(total, cap)
    overflow = total - count
    valid = jnp.arange(cap, dtype=jnp.int32) < count
    return InitialExtrema(
        xpos=scat(xn, np.float32(0)),
        ypos=scat(yn, np.float32(0)),
        lpos=scat(lpos, np.int32(1)),
        sigma=scat(sigma, np.float32(0)),
        cell=scat(cell, np.int32(0)),
        valid=valid,
        count=count,
        overflow=overflow,
    )


def find_extrema(dog: jnp.ndarray,
                 sift_mode: SiftMode,
                 sigma0: float, sigma_k: float,
                 peak_threshold: float, edge_limit: float,
                 filter_grid_size: int,
                 cand_cap: int, ext_cap: int) -> InitialExtrema:
    """Full per-octave pipeline: dense detect -> compact -> refine ->
    compact (Pyramid::find_extrema, s_extrema.cu:560-640)."""
    h, w = dog.shape[-2], dog.shape[-1]
    mask = detect_candidates(dog, sift_mode, peak_threshold)
    cx, cy, cz, cvalid, _, _ = compact_mask(mask, cand_cap)
    cz = cz + 1  # mask layer -> DoG layer
    xn, yn, lpos, sigma, cell, ok = refine_extrema(
        dog, cx, cy, cz, cvalid, sift_mode, sigma0, sigma_k,
        peak_threshold, edge_limit,
        grid_w_div=w / filter_grid_size,
        grid_h_div=h / filter_grid_size,
        grid_width=filter_grid_size)
    return compact_extrema(xn, yn, lpos, sigma, cell, ok, ext_cap)
