"""Executable reference golden: independent numpy ports of the CUDA math.

Each function re-implements the corresponding reference kernel
(/root/reference/src/popsift/...) scalar-for-scalar from its CUDA source,
WITHOUT reusing any popsift_tpu code, so the pytest suite can measure
parity between popsift_tpu and the reference numerics on synthetic scenes
(the role testOxfordDataset.sh.in's byte-compares play for the reference,
SURVEY.md §4.2, with float tolerance instead of cmp).

Ports (citations into /root/reference/src/popsift):
* pyramid: normalizedSource::horiz (s_pyramid_build_ra.cu:17-56) +
  absoluteSource::horiz/vert (s_pyramid_build_aa.cu:17-100),
  get_by_2_pick_every_second (s_pyramid_build.cu:50-71),
  make_dog (s_pyramid_build.cu:74-92)
* detection/refinement: is_extremum (s_extrema.cu:56-120), solve
  (s_solve.h:25-86), ModeFunctions<*> (s_extrema.cu:145-298),
  find_extrema_in_dog_sub (s_extrema.cu:308-505)
* orientation: ori_par (s_orientation.cu:75-259)

float32 discipline: array math is done in np.float32; scalar decisions
use np.float32 intermediates where gate flips could otherwise occur.
"""

from __future__ import annotations

import math

import numpy as np

M_PI = math.pi
M_PI2 = 2.0 * math.pi
ORI_NBINS = 36
ORI_WINFACTOR = 1.5
MAX_ITERATIONS = 5  # s_extrema.cu:362


# ---------------------------------------------------------------------------
# pyramid
# ---------------------------------------------------------------------------

def tex2d_bilinear_norm(img: np.ndarray, u: np.ndarray,
                        v: np.ndarray) -> np.ndarray:
    """CUDA tex2D with normalized coords, clamp addressing, bilinear
    filtering: sample at pixel coordinate (u*W - 0.5, v*H - 0.5)."""
    h, w = img.shape
    px = u * np.float32(w) - np.float32(0.5)
    py = v * np.float32(h) - np.float32(0.5)
    x0 = np.floor(px)
    y0 = np.floor(py)
    fx = (px - x0).astype(np.float32)
    fy = (py - y0).astype(np.float32)
    x0i = np.clip(x0.astype(np.int64), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y0i = np.clip(y0.astype(np.int64), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    # clamped coordinate => clamped fraction (sampling below -0.5 or past
    # the last texel centre must not extrapolate)
    fx = np.where(x0 < 0, np.float32(0.0), fx)
    fx = np.where(x0 >= w - 1, np.float32(0.0), fx)
    fy = np.where(y0 < 0, np.float32(0.0), fy)
    fy = np.where(y0 >= h - 1, np.float32(0.0), fy)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def ref_level_from_input(image: np.ndarray, dst_w: int, dst_h: int,
                         taps_h: np.ndarray, span_h: int,
                         taps_v: np.ndarray, span_v: int,
                         shift: float) -> np.ndarray:
    """normalizedSource::horiz (s_pyramid_build_ra.cu:17-56: samples the
    input texture at (x+shift±off)/dst_w, scales by 255) followed by the
    vertical absolute pass over the written surface."""
    xs = np.arange(dst_w, dtype=np.float32)
    ys = np.arange(dst_h, dtype=np.float32)
    read_x = (xs + np.float32(shift)) / np.float32(dst_w)
    read_y = (ys + np.float32(shift)) / np.float32(dst_h)
    u = np.broadcast_to(read_x[None, :], (dst_h, dst_w))
    v = np.broadcast_to(read_y[:, None], (dst_h, dst_w))
    out = tex2d_bilinear_norm(image, u, v) * np.float32(taps_h[0])
    for off in range(span_h - 1, 0, -1):
        offrel = np.float32(off) / np.float32(dst_w)
        v1 = tex2d_bilinear_norm(image, u - offrel, v)
        v2 = tex2d_bilinear_norm(image, u + offrel, v)
        out = out + (v1 + v2) * np.float32(taps_h[off])
    out = out * np.float32(255.0)
    return ref_blur_axis(out, taps_v, span_v, axis=0)


def ref_blur_axis(arr: np.ndarray, taps: np.ndarray, span: int,
                  axis: int) -> np.ndarray:
    """absoluteSource::horiz/vert (s_pyramid_build_aa.cu:17-100): point
    texture reads with clamp addressing, symmetric tap pairs."""
    arr = arr.astype(np.float32)
    n = arr.shape[axis]
    idx = np.arange(n)

    def take(off):
        return np.take(arr, np.clip(idx + off, 0, n - 1), axis=axis)

    out = arr * np.float32(taps[0])
    for off in range(1, span):
        out = out + (take(-off) + take(off)) * np.float32(taps[off])
    return out


def ref_downscale(level: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """get_by_2_pick_every_second (s_pyramid_build.cu:50-71)."""
    return level[0:2 * dst_h:2, 0:2 * dst_w:2]


def ref_pyramid_default(image: np.ndarray, dims, levels: int,
                        gauss, shift0: float) -> list[np.ndarray]:
    """Default incremental build (s_pyramid_build.cu:550-572): octave-0
    level 0 from the input (dd[0] horiz + inc[0] vert), incremental levels
    with inc[lvl], octave o>0 level 0 by downscale of level L-3."""
    L = levels + 3
    stacks = []
    for o, (w, h) in enumerate(dims):
        lvls = []
        for lvl in range(L):
            if lvl == 0 and o == 0:
                lvls.append(ref_level_from_input(
                    image, w, h, gauss.dd.filter[0], gauss.dd.span[0],
                    gauss.inc.filter[0], gauss.inc.span[0], shift0))
            elif lvl == 0:
                src = stacks[o - 1][L - 3]
                lvls.append(ref_downscale(src, h, w))
            else:
                t = ref_blur_axis(lvls[lvl - 1], gauss.inc.filter[lvl],
                                  gauss.inc.span[lvl], axis=1)
                lvls.append(ref_blur_axis(t, gauss.inc.filter[lvl],
                                          gauss.inc.span[lvl], axis=0))
        stacks.append(np.stack(lvls))
    return stacks


def ref_make_dog(stack: np.ndarray) -> np.ndarray:
    """make_dog (s_pyramid_build.cu:74-92): dog[l] = level[l+1] - level[l]."""
    return stack[1:] - stack[:-1]


# ---------------------------------------------------------------------------
# detection + refinement
# ---------------------------------------------------------------------------

def _rd(dog: np.ndarray, x: int, y: int, z: int) -> np.float32:
    """readTex point with clamp addressing (common/assist.h:68-83)."""
    L, h, w = dog.shape
    return dog[min(max(z, 0), L - 1), min(max(y, 0), h - 1),
               min(max(x, 0), w - 1)]


def ref_is_extremum(dog: np.ndarray, x: int, y: int, z: int) -> bool:
    """is_extremum (s_extrema.cu:56-120): called with the corner (x-1,
    y-1, level-1); center is (x, y, z) + 1 in each axis.  The bitmask
    logic requires the centre to be strictly greater than ALL 26
    neighbours or strictly less than all."""
    cx, cy, cz = x + 1, y + 1, z + 1
    val = _rd(dog, cx, cy, cz)
    gt_all = True
    lt_all = True
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                f = _rd(dog, cx + dx, cy + dy, cz + dz)
                gt_all &= bool(val > f)
                lt_all &= bool(val < f)
        if not (gt_all or lt_all):
            return False
    return gt_all or lt_all


def ref_solve(i: np.ndarray, b: np.ndarray):
    """Closed-form 3x3 symmetric solve (s_solve.h:25-86).  Returns the
    solution or None on det == 0."""
    i = i.astype(np.float32)
    b = b.astype(np.float32)
    f = np.float32
    det0 = f(-i[1][2] * i[1][2]) + f(i[1][1] * i[2][2])
    det1 = f(-i[0][1] * i[2][2]) + f(i[1][2] * i[0][2])
    det2 = f(-i[1][1] * i[0][2]) + f(i[0][1] * i[1][2])
    det3 = f(-i[0][2] * i[0][2]) + f(i[0][0] * i[2][2])
    det4 = f(-i[0][0] * i[1][2]) + f(i[0][1] * i[0][2])
    det5 = f(-i[0][1] * i[0][1]) + f(i[0][0] * i[1][1])
    det = f(f(i[0][0] * det0) + f(i[0][1] * det1) + f(i[0][2] * det2))
    if det == 0.0:
        return None
    rsd = f(1.0) / det
    m00, m10, m20 = f(det0 * rsd), f(det1 * rsd), f(det2 * rsd)
    m11, m12, m22 = f(det3 * rsd), f(det4 * rsd), f(det5 * rsd)
    out = np.array([
        m00 * b[0] + m10 * b[1] + m20 * b[2],
        m10 * b[0] + m11 * b[1] + m12 * b[2],
        m20 * b[0] + m12 * b[1] + m22 * b[2],
    ], dtype=np.float32)
    return out


def ref_refine(dog: np.ndarray, x: int, y: int, level: int, mode: str,
               w: int, h: int, maxlevel: int, threshold: float,
               edge_limit: float, sigma0: float, sigma_k: float,
               w_grid_divider: float, h_grid_divider: float,
               grid_width: int):
    """find_extrema_in_dog_sub after is_extremum (s_extrema.cu:354-505).

    mode in {"popsift", "vlfeat", "opencv"}.  Returns None (rejected) or
    dict(xpos, ypos, lpos, sigma, cell)."""
    f = np.float32
    v = _rd(dog, x, y, level)
    n = [x, y, level]
    d = np.zeros(3, np.float32)
    D = np.zeros(3, np.float32)
    DD = np.zeros(3, np.float32)
    DXv = np.zeros(3, np.float32)

    it = 0
    failed = False
    while True:
        it += 1
        x2y1z1 = _rd(dog, n[0] + 1, n[1], n[2])
        x0y1z1 = _rd(dog, n[0] - 1, n[1], n[2])
        x1y2z1 = _rd(dog, n[0], n[1] + 1, n[2])
        x1y0z1 = _rd(dog, n[0], n[1] - 1, n[2])
        x1y1z2 = _rd(dog, n[0], n[1], n[2] + 1)
        x1y1z0 = _rd(dog, n[0], n[1], n[2] - 1)
        D = np.array([f(0.5) * f(x2y1z1 - x0y1z1),
                      f(0.5) * f(x1y2z1 - x1y0z1),
                      f(0.5) * f(x1y1z2 - x1y1z0)], np.float32)
        x1y1z1 = _rd(dog, n[0], n[1], n[2])
        DD = np.array([f(x2y1z1 + x0y1z1) - f(2.0) * x1y1z1,
                       f(x1y2z1 + x1y0z1) - f(2.0) * x1y1z1,
                       f(x1y1z2 + x1y1z0) - f(2.0) * x1y1z1], np.float32)
        x0y0z1 = _rd(dog, n[0] - 1, n[1] - 1, n[2])
        x0y1z0 = _rd(dog, n[0] - 1, n[1], n[2] - 1)
        x0y1z2 = _rd(dog, n[0] - 1, n[1], n[2] + 1)
        x0y2z1 = _rd(dog, n[0] - 1, n[1] + 1, n[2])
        x1y0z0 = _rd(dog, n[0], n[1] - 1, n[2] - 1)
        x1y0z2 = _rd(dog, n[0], n[1] - 1, n[2] + 1)
        x1y2z0 = _rd(dog, n[0], n[1] + 1, n[2] - 1)
        x1y2z2 = _rd(dog, n[0], n[1] + 1, n[2] + 1)
        x2y0z1 = _rd(dog, n[0] + 1, n[1] - 1, n[2])
        x2y1z0 = _rd(dog, n[0] + 1, n[1], n[2] - 1)
        x2y1z2 = _rd(dog, n[0] + 1, n[1], n[2] + 1)
        x2y2z1 = _rd(dog, n[0] + 1, n[1] + 1, n[2])
        DXv = np.array(
            [f(0.25) * f(x2y2z1 + x0y0z1 - x0y2z1 - x2y0z1),
             f(0.25) * f(x2y1z2 + x0y1z0 - x0y1z2 - x2y1z0),
             f(0.25) * f(x1y2z2 + x1y0z0 - x1y2z0 - x1y0z2)], np.float32)

        A = np.array([[DD[0], DXv[0], DXv[1]],
                      [DXv[0], DD[1], DXv[2]],
                      [DXv[1], DXv[2], DD[2]]], np.float32)
        b = ref_solve(A, -D)
        if b is None:
            d = np.zeros(3, np.float32)
            break
        d = b

        last_it = it == MAX_ITERATIONS
        if mode == "opencv":
            # ModeFunctions<OpenCV>::refine (s_extrema.cu:160-188)
            t = np.abs(d)
            if t[0] < 0.5 and t[1] < 0.5 and t[2] < 0.5:
                break
            n[0] += int(np.round(d[0]))
            n[1] += int(np.round(d[1]))
            n[2] += int(np.round(d[2]))
            if (n[0] < 5 or n[0] >= w - 5 or n[1] < 5 or n[1] >= h - 5
                    or n[2] < 1 or n[2] > maxlevel - 2):
                return None
        elif mode == "vlfeat":
            # ModeFunctions<VLFeat>::refine (s_extrema.cu:208-240)
            if not last_it:
                tx = ((1 if (d[0] >= 0.6 and n[0] < w - 2) else 0)
                      + (-1 if (d[0] <= -0.6 and n[0] > 1) else 0))
                ty = ((1 if (d[1] >= 0.6 and n[1] < h - 2) else 0)
                      + (-1 if (d[1] <= -0.6 and n[1] > 1) else 0))
                if tx == 0 and ty == 0:
                    break
                n[0] += tx
                n[1] += ty
        else:
            # ModeFunctions<PopSift>::refine (s_extrema.cu:260-297)
            if not last_it:
                tx = ((1 if (d[0] >= 0.6 and n[0] < w - 2) else 0)
                      + (-1 if (d[0] <= -0.6 and n[0] > 1) else 0))
                ty = ((1 if (d[1] >= 0.6 and n[1] < h - 2) else 0)
                      + (-1 if (d[1] <= -0.6 and n[1] > 1) else 0))
                tz = ((1 if (d[2] >= 0.6 and n[2] < maxlevel - 1) else 0)
                      + (-1 if (d[2] <= -0.6 and n[2] > 1) else 0))
                if tx == 0 and ty == 0 and tz == 0:
                    break
                n[0] += tx
                n[1] += ty
                n[2] += tz
        if it >= MAX_ITERATIONS:
            break

    if it >= MAX_ITERATIONS and mode == "opencv":
        return None  # convergence required (s_extrema.cu:452-457)

    if mode in ("popsift", "vlfeat"):
        # SIGNED movement test (s_extrema.cu:460-465)
        if d[0] >= 1.5 or d[1] >= 1.5 or d[2] >= 1.5:
            return None

    xn = f(n[0] + d[0])
    yn = f(n[1] + d[1])
    sn = f(n[2] + d[2])

    # verify (s_extrema.cu:191-195 / 243-256 / 277-297)
    if mode in ("popsift", "vlfeat"):
        if (xn < 0.0 or xn > w - 1.0 or yn < 0.0 or yn > h - 1.0
                or sn < 0.0 or sn > maxlevel):
            return None

    contr = f(v + f(0.5) * f(D[0] * d[0] + D[1] * d[1] + D[2] * d[2]))
    tr = f(DD[0] + DD[1])
    det = f(DD[0] * DD[1] - DXv[0] * DXv[0])
    if det <= 0.0:
        return None
    if abs(contr) < f(threshold * 2.0):
        return None
    edgeval = f(tr * tr / det)
    lim = f((edge_limit + 1.0) * (edge_limit + 1.0) / edge_limit)
    if edgeval >= lim:
        return None

    sigma = f(sigma0 * math.pow(sigma_k, float(sn)))
    cell = (int(math.floor(yn / h_grid_divider)) * grid_width
            + int(math.floor(xn / w_grid_divider)))
    return dict(xpos=float(xn), ypos=float(yn),
                lpos=int(np.round(sn)), sigma=float(sigma), cell=cell)


def _first_contrast_ok(val: float, mode: str, threshold: float) -> bool:
    """s_extrema.cu:150-153 / 200-204 / 252-256."""
    f = np.float32
    if mode == "opencv":
        return abs(val) >= math.floor(f(threshold))
    if mode == "vlfeat":
        return abs(val) >= f(0.8) * f(2.0) * f(threshold)
    return abs(val) >= f(1.6) * f(threshold)


def ref_find_extrema(dog: np.ndarray, mode: str, w: int, h: int,
                     levels: int, threshold: float, edge_limit: float,
                     sigma0: float, sigma_k: float,
                     grid_size: int) -> list[dict]:
    """Full per-octave detection sweep (find_extrema_in_dog_sub,
    s_extrema.cu:308-505 + launch geometry :560-640): candidate centres
    at x,y >= 1 (thread + 1 offset), level in 1..levels, raster order."""
    maxlevel = levels + 2
    results = []
    w_div = float(w) / grid_size   # sift_octave.cu:40-41
    h_div = float(h) / grid_size
    # vectorized pre-gates for speed: contrast + strict 26-neighbour test
    for level in range(1, levels + 1):
        val = dog[level]
        if mode == "opencv":
            gate = np.abs(val) >= math.floor(np.float32(threshold))
        elif mode == "vlfeat":
            gate = np.abs(val) >= np.float32(0.8) * np.float32(2.0) \
                * np.float32(threshold)
        else:
            gate = np.abs(val) >= np.float32(1.6) * np.float32(threshold)
        ys, xs = np.nonzero(gate)
        for y, x in zip(ys, xs):
            if x < 1 or y < 1 or x >= w - 1 or y >= h - 1:
                continue  # launch offset excludes borders
            if mode == "opencv" and (x < 5 or y < 5 or x >= w - 5
                                     or y >= h - 5):
                continue
            if not ref_is_extremum(dog, x - 1, y - 1, level - 1):
                continue
            r = ref_refine(dog, int(x), int(y), level, mode, w, h,
                           maxlevel, threshold, edge_limit, sigma0,
                           sigma_k, w_div, h_div, grid_size)
            if r is not None:
                results.append(r)
    return results


# ---------------------------------------------------------------------------
# orientation
# ---------------------------------------------------------------------------

def ref_orientation(layer: np.ndarray, xpos: float, ypos: float,
                    sig: float, w: int, h: int,
                    max_count: int = 4) -> list[float]:
    """ori_par (s_orientation.cu:75-259) for one extremum on one blurred
    level image: 36-bin weighted histogram, VLFeat smoothing (3 double
    box passes), quadratic peak refinement, peaks >= 0.8*max in
    descending strength, up to max_count angles."""
    f = np.float32
    sigw = f(ORI_WINFACTOR * sig)
    rad = int(np.round(f(3.0) * sigw))
    factor = f(-0.5) / f(sigw * sigw)
    sq_thres = rad * rad

    xmin = max(1, int(np.round(xpos)) - rad)
    xmax = min(w - 2, int(np.round(xpos)) + rad)
    ymin = max(1, int(np.round(ypos)) - rad)
    ymax = min(h - 2, int(np.round(ypos)) + rad)

    hist = np.zeros(ORI_NBINS, np.float32)
    for yy in range(ymin, ymax + 1):
        for xx in range(xmin, xmax + 1):
            # get_gradiant point-texture variant (s_gradiant.h:55-69)
            dx = f(layer[yy, xx + 1]) - f(layer[yy, xx - 1])
            dy = f(layer[yy + 1, xx]) - f(layer[yy - 1, xx])
            grad = f(math.hypot(dx, dy))
            theta = f(math.atan2(dy, dx))
            fdx = f(xx - xpos)
            fdy = f(yy - ypos)
            sq_dist = int(fdx * fdx + fdy * fdy)   # int truncation (:142)
            if sq_dist <= sq_thres:
                weight = f(grad * math.exp(float(f(sq_dist) * factor)))
                bidx = int(np.round(
                    f(ORI_NBINS) * (theta + f(M_PI)) / f(M_PI2)))
                if bidx == ORI_NBINS:
                    bidx = 0
                hist[bidx] += weight

    # VLFeat smoothing: 3 iterations x 2 box passes (:165-178)
    for _ in range(6):
        sm = np.empty_like(hist)
        for b in range(ORI_NBINS):
            sm[b] = (hist[(b - 1) % ORI_NBINS] + hist[b]
                     + hist[(b + 1) % ORI_NBINS]) / f(3.0)
        hist = sm

    refined = np.full(ORI_NBINS, -1.0, np.float32)
    yval = np.full(ORI_NBINS, -np.inf, np.float32)
    for b in range(ORI_NBINS):
        prev = (b - 1) % ORI_NBINS
        nxt = (b + 1) % ORI_NBINS
        if not (hist[b] > max(hist[prev], hist[nxt])):
            continue
        num = f(3.0) * hist[prev] - f(4.0) * hist[b] + hist[nxt]
        denB = f(2.0) * (hist[prev] - f(2.0) * hist[b] + hist[nxt])
        newbin = f(num / denB)
        if 0.0 <= newbin <= 2.0:
            refined[b] = f(prev + newbin) if b != 0 \
                else f(ORI_NBINS - 1 + newbin)
            yval[b] = f(-(num * num) / (f(4.0) * denB) + hist[prev])

    order = np.argsort(-yval, kind="stable")
    best = yval[order[0]]
    angles = []
    for r in order[:max_count]:
        if not np.isfinite(yval[r]) or yval[r] < f(0.8) * best:
            break
        chosen = refined[r]
        if chosen >= ORI_NBINS:
            chosen -= ORI_NBINS
        angles.append(float(f(M_PI2) * chosen / f(ORI_NBINS) - f(M_PI)))
    return angles


# ---------------------------------------------------------------------------
# descriptors: grid family
# ---------------------------------------------------------------------------

DESC_MAGNIFY = 3.0
DESC_BINS = 8
M_4RPI = 4.0 / M_PI


def ref_desc_tables():
    """desc_gauss (40x40) + desc_tile (16) (sift_constants.cu:34-47)."""
    f = np.float32
    dn_step = f(1.0 / 8.0)
    dn_base = f(0.5) * dn_step - f(20.0) * dn_step
    gauss = np.empty((40, 40), np.float32)
    for y in range(40):
        for x in range(40):
            dnx = f(dn_base + x * dn_step)
            dny = f(dn_base + y * dn_step)
            gauss[y, x] = math.exp(-float(dnx * dnx + dny * dny) / 8.0)
    tile = np.empty(16, np.float32)
    for i in range(16):
        nx = f(-1.0 + 1.0 / 16.0 + i * (1.0 / 8.0))
        tile[i] = f(1.0) - abs(nx)
    return gauss, tile


def ref_tex_bilinear(layer: np.ndarray, px: float, py: float) -> np.float32:
    """CUDA linear texture with unnormalized coords + clamp addressing,
    through readTex's +0.5 (common/assist.h:68-83): continuous pixel
    coordinates; out-of-range coordinates read the edge texel."""
    h, w = layer.shape
    f = np.float32
    px = min(max(px, 0.0), w - 1.0)
    py = min(max(py, 0.0), h - 1.0)
    x0 = int(math.floor(px))
    y0 = int(math.floor(py))
    fx = f(px - x0)
    fy = f(py - y0)
    x1 = min(x0 + 1, w - 1)
    y1 = min(y0 + 1, h - 1)
    top = f(layer[y0, x0] * (1 - fx) + layer[y0, x1] * fx)
    bot = f(layer[y1, x0] * (1 - fx) + layer[y1, x1] * fx)
    return f(top * (1 - fy) + bot * fy)


def ref_desc_notile(layer: np.ndarray, x: float, y: float, sig: float,
                    ang: float) -> np.ndarray:
    """ext_desc_notile_sub (s_desc_notile.cu:31-92): rotated 40x40 sample
    grid with precomputed Gaussian window + triangle tile weights and
    rotated-derivative gradients via the linear texture; returns the
    (128,) descriptor in [ty][tx][bin] order (features[out_y*32 + tx*8 +
    bin], :91)."""
    f = np.float32
    gauss, tile = ref_desc_tables()
    sbp = abs(f(DESC_MAGNIFY) * f(sig))
    if sbp == 0.0:
        return np.zeros(128, np.float32)
    cos_t = f(math.cos(ang))
    sin_t = f(math.sin(ang))
    stepbase = f(-2.5 + 1.0 / 16.0)

    dpt = np.zeros((4, 4, 8), np.float32)
    for ty in range(4):
        for tx in range(4):
            for yd in range(16):
                newy = (ty << 3) + yd
                if newy >= 40:
                    continue
                for xd in range(16):
                    newx = (tx << 3) + xd
                    if newx >= 40:
                        continue
                    wgt = f(tile[xd] * tile[yd])
                    stepx = f(stepbase + newx / 8.0)
                    stepy = f(stepbase + newy / 8.0)
                    ptx = f(cos_t * stepx - sin_t * stepy)
                    pty = f(cos_t * stepy + sin_t * stepx)
                    sx = f(x + ptx * sbp)
                    sy = f(y + pty * sbp)
                    # rotated-derivative gradient (s_gradiant.h:71-87)
                    dx = f(ref_tex_bilinear(layer, sx + cos_t, sy + sin_t)
                           - ref_tex_bilinear(layer, sx - cos_t,
                                              sy - sin_t))
                    dy = f(ref_tex_bilinear(layer, sx - sin_t, sy + cos_t)
                           - ref_tex_bilinear(layer, sx + sin_t,
                                              sy - cos_t))
                    mod = f(math.hypot(dx, dy))
                    th = f(math.atan2(dy, dx))
                    if th < 0.0:
                        th = f(th + M_PI2)
                    tth = f(th * M_4RPI)
                    fo = int(math.floor(tth))
                    do0 = f(tth - fo)
                    fo0 = fo & 7
                    fo1 = (fo0 + 1) & 7
                    ww = f(gauss[newy, newx] * mod)
                    dpt[ty, tx, fo0] += f(wgt * (1.0 - do0) * ww)
                    dpt[ty, tx, fo1] += f(wgt * do0 * ww)
    return dpt.reshape(128)


def ref_desc_grid(layer: np.ndarray, x: float, y: float, sig: float,
                  ang: float) -> np.ndarray:
    """ext_desc_grid_sub (s_desc_grid.cu:18-121): per tile a rotated
    16x16 grid, each sample ROUNDED to the nearest pixel, weights
    recomputed from the rounded position (skipped when the recomputed
    triangle weight goes negative, :86), axis-aligned point-texture
    gradients, angle de-rotated by ang."""
    f = np.float32
    h, w = layer.shape
    sbp = abs(f(DESC_MAGNIFY) * f(sig))
    if sbp == 0.0:
        return np.zeros(128, np.float32)
    cos_t = f(math.cos(ang))
    sin_t = f(math.sin(ang))
    csbp = f(cos_t * sbp)
    ssbp = f(sin_t * sbp)

    def tex_point(px: float, py: float) -> np.float32:
        # point texture through readTex's +0.5: nearest texel with clamp
        xi = min(max(int(math.floor(px + 0.5)), 0), w - 1)
        yi = min(max(int(math.floor(py + 0.5)), 0), h - 1)
        return f(layer[yi, xi])

    dpt = np.zeros((4, 4, 9), np.float32)
    for iy in range(4):
        for ix in range(4):
            ox = f(ix - 1.5)
            oy = f(iy - 1.5)
            ptx = f(csbp * ox - ssbp * oy + x)
            pty = f(csbp * oy + ssbp * ox + y)
            for yd in range(16):
                for xd in range(16):
                    # lft_dn + (xd+.5)*rgt_stp + (yd+.5)*up_stp
                    # == cos*u - sin*v, sin*u + cos*v with
                    # u=(xd+.5)/8-1, v=(yd+.5)/8-1 (s_desc_grid.cu:60-70)
                    u = f((xd + 0.5) / 8.0 - 1.0)
                    v = f((yd + 0.5) / 8.0 - 1.0)
                    pixox = f(cos_t * u - sin_t * v)
                    pixoy = f(sin_t * u + cos_t * v)
                    pix_x = f(round(ptx + pixox * sbp) - ptx)
                    pix_y = f(round(pty + pixoy * sbp) - pty)
                    pxo_x = f(pix_x / sbp)
                    pxo_y = f(pix_y / sbp)
                    sx = f(ptx + pix_x)
                    sy = f(pty + pix_y)
                    dx = f(tex_point(sx + 1.0, sy) - tex_point(sx - 1.0,
                                                               sy))
                    dy = f(tex_point(sx, sy + 1.0) - tex_point(sx,
                                                               sy - 1.0))
                    mod = f(math.hypot(dx, dy))
                    th = f(math.atan2(dy, dx))
                    nx = f(cos_t * pxo_x + sin_t * pxo_y)
                    ny = f(cos_t * pxo_y - sin_t * pxo_x)
                    dnx = f(nx + ox)
                    dny = f(ny + oy)
                    ww = f(math.exp(-float(dnx * dnx + dny * dny) / 8.0))
                    wx = f(1.0 - abs(nx))
                    wy = f(1.0 - abs(ny))
                    if wx < 0.0 or wy < 0.0:
                        continue
                    wgt = f(ww * wx * wy * mod)
                    th = f(th - ang)
                    if th < 0.0:
                        th = f(th + M_PI2)
                    if th >= M_PI2:
                        th = f(th - M_PI2)
                    tth = f(th * M_4RPI)
                    fo0 = int(math.floor(tth))
                    do0 = f(tth - fo0)
                    fo = fo0 % DESC_BINS
                    dpt[iy, ix, fo] += f((1.0 - do0) * wgt)
                    dpt[iy, ix, fo + 1] += f(do0 * wgt)
    dpt[:, :, 0] += dpt[:, :, 8]     # dpt[0] += dpt[8] (:110)
    return dpt[:, :, :8].reshape(128)


# ---------------------------------------------------------------------------
# grid filter (extrema budget)
# ---------------------------------------------------------------------------

def ref_grid_filter(entries: list[dict], max_extrema: int, grid_size: int,
                    mode: str) -> list[bool]:
    """Host-side grid-filter algorithm (s_filtergrid.cu:110-318).

    entries: [{octave, cell, sigma}] in (octave, raster) order — the
    compact i_ext_dat layout.  mode in {"largest", "smallest"}
    (RandomScale's within-cell order is explicitly unspecified).
    Returns a keep flag per entry.
    """
    n = len(entries)
    slots = grid_size * grid_size
    order = list(range(n))
    # FunctionExtractCell: (cell, sigma * 2^octave) (s_filtergrid.cu:56-71)
    keyf = [(entries[i]["cell"],
             np.float32(entries[i]["sigma"]
                        * np.float32(2.0) ** entries[i]["octave"]))
            for i in range(n)]
    if mode == "largest":
        order.sort(key=lambda i: (keyf[i][0], -keyf[i][1]))
    else:
        order.sort(key=lambda i: (keyf[i][0], keyf[i][1]))

    cell_counts = [0] * slots
    for i in range(n):
        cell_counts[keyf[i][0]] += 1
    cell_offsets = np.concatenate([[0], np.cumsum(cell_counts)[:-1]])
    cell_limits = np.cumsum(cell_counts)

    # sort counts ascending with permutation (s_filtergrid.cu:225-231)
    perm = sorted(range(slots), key=lambda c: cell_counts[c])
    sorted_counts = [cell_counts[c] for c in perm]
    prefix = np.cumsum(sorted_counts)
    # sumup[i] = prefix[i] + count[i] * (slots-1-i) (:239-248)
    sumup = [int(prefix[i]) + sorted_counts[i] * (slots - 1 - i)
             for i in range(slots)]
    ct = sum(1 for v in sumup if v > max_extrema)
    if ct == 0:
        return [True] * n
    tailaverage = float(sum(sorted_counts[slots - ct:])) / ct
    # C++ int division in the subtrahend (:258)
    newlimit = int(math.ceil(tailaverage - (n - max_extrema) // ct))
    clamped = [min(c, newlimit) for c in cell_counts]

    keep = [True] * n
    # disable [offset+limit, offset+count) in cell-sorted order (:271-284)
    for c in range(slots):
        for pos in range(int(cell_offsets[c]) + clamped[c],
                         int(cell_limits[c])):
            keep[order[pos]] = False
    return keep
