"""User-facing feature containers.

Mirrors Features/FeaturesHost/FeaturesDev of the reference
(/root/reference/src/popsift/features.h:41-122):

* :class:`FeaturesHost` — host (numpy) features + descriptors with the
  STL-style iteration and ``print`` text format of the reference
  (features.cu:310-330).
* :class:`FeaturesDev` — device-resident (jax array) descriptors with the
  reverse descriptor->feature map and a brute-force :meth:`match`.

The reference's ``prep_features`` kernel (sift_pyramid.cu:250-280) — scaling
octave-local coordinates by 2^(octave - upscale) and wiring descriptor
pointers — happens in :func:`assemble_features`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterator

import numpy as np

from .constants import ORIENTATION_MAX_COUNT


@dataclasses.dataclass
class Feature:
    """One keypoint (sift_extremum.h / features.h:23-37)."""

    xpos: float
    ypos: float
    sigma: float
    num_ori: int
    orientation: np.ndarray        # (ORIENTATION_MAX_COUNT,)
    desc_idx: np.ndarray           # indices into the descriptor array (-1 pad)
    debug_octave: int
    _descriptors: np.ndarray | None = None  # back-reference (num_desc, 128)

    @property
    def desc(self) -> list[np.ndarray | None]:
        out = []
        for ori in range(ORIENTATION_MAX_COUNT):
            i = int(self.desc_idx[ori])
            out.append(self._descriptors[i] if i >= 0 else None)
        return out

    def print(self, ostr, write_as_uchar: bool = False) -> None:
        """Text output format of Feature::print (features.cu:310-330)."""
        sigval = 1.0 / (self.sigma * self.sigma)
        for ori in range(self.num_ori):
            d = self._descriptors[int(self.desc_idx[ori])]
            ostr.write(f"{_g(self.xpos)} {_g(self.ypos)} "
                       f"{_g(sigval)} 0 {_g(sigval)} ")
            if write_as_uchar:
                # roundf = half away from zero (features.cu:318), NOT
                # Python's banker's rounding: roundf(2.5)=3, round(2.5)=2
                ostr.write(" ".join(
                    str(int(math.copysign(math.floor(abs(float(v)) + 0.5),
                                          float(v)))) for v in d))
            else:
                ostr.write(" ".join(_g3(float(v)) for v in d))
            ostr.write(" \n")


def _g(v: float) -> str:
    """C++ ostream default float formatting (6 significant digits)."""
    return f"{v:.6g}"


def _g3(v: float) -> str:
    """setprecision(3) used for descriptor values (features.cu:322)."""
    return f"{v:.3g}"


class FeaturesBase:
    """features.h:41-56."""

    def __init__(self) -> None:
        self._num_ext = 0
        self._num_ori = 0

    def get_feature_count(self) -> int:
        return self._num_ext

    def get_descriptor_count(self) -> int:
        return self._num_ori


class FeaturesHost(FeaturesBase):
    """Host-side features: numpy SoA + iteration (features.h:69-104).

    Stored as structure-of-arrays; :class:`Feature` objects are
    materialised lazily on access so bulk extraction pays no per-keypoint
    Python cost."""

    def __init__(self, features: list[Feature] | None = None,
                 descriptors: np.ndarray | None = None,
                 soa: dict | None = None) -> None:
        super().__init__()
        self._descriptors = (descriptors if descriptors is not None
                             else np.zeros((0, 128), np.float32))
        self._num_ori = int(self._descriptors.shape[0])
        if soa is not None:
            self._soa = soa
        else:
            features = features or []
            self._soa = dict(
                xpos=np.array([f.xpos for f in features], np.float32),
                ypos=np.array([f.ypos for f in features], np.float32),
                sigma=np.array([f.sigma for f in features], np.float32),
                num_ori=np.array([f.num_ori for f in features], np.int32),
                orientation=(np.stack([f.orientation for f in features])
                             if features else np.zeros((0, 4), np.float32)),
                desc_idx=(np.stack([f.desc_idx for f in features])
                          if features else
                          np.zeros((0, ORIENTATION_MAX_COUNT), np.int64)),
                debug_octave=np.array([f.debug_octave for f in features],
                                      np.int32),
            )
        self._num_ext = int(self._soa["xpos"].shape[0])

    def get_features(self) -> list[Feature]:
        return [self[i] for i in range(self._num_ext)]

    def get_descriptors(self) -> np.ndarray:
        return self._descriptors

    def size(self) -> int:
        return self._num_ext

    def __len__(self) -> int:
        return self._num_ext

    def __iter__(self) -> Iterator[Feature]:
        for i in range(self._num_ext):
            yield self[i]

    def __getitem__(self, i: int) -> Feature:
        s = self._soa
        return Feature(
            xpos=float(s["xpos"][i]), ypos=float(s["ypos"][i]),
            sigma=float(s["sigma"][i]), num_ori=int(s["num_ori"][i]),
            orientation=s["orientation"][i], desc_idx=s["desc_idx"][i],
            debug_octave=int(s["debug_octave"][i]),
            _descriptors=self._descriptors)

    def print(self, ostr, write_as_uchar: bool = False) -> None:
        for f in self:
            f.print(ostr, write_as_uchar)

    def pin(self) -> None:
        """API parity with FeaturesHost::pin (features.cu:86-105): pins
        host memory for fast D2H on CUDA.  JAX manages transfer staging
        itself, so this is a documented no-op."""

    def unpin(self) -> None:
        """API parity with FeaturesHost::unpin (features.cu:107-111)."""


class FeaturesDev(FeaturesBase):
    """Device-resident features for MatchingMode (features.h:106-122)."""

    def __init__(self, features, descriptors, reverse_map) -> None:
        super().__init__()
        self._ext = features          # dict of device arrays
        self._ori = descriptors       # (num_ori, 128) device array
        self._rev = reverse_map       # (num_ori,) descriptor -> feature idx
        self._num_ext = int(features["xpos"].shape[0])
        self._num_ori = int(descriptors.shape[0])

    def get_features(self):
        return self._ext

    def get_descriptors(self):
        return self._ori

    def get_reverse_map(self):
        return self._rev

    def match(self, other: "FeaturesDev", ratio: float = 0.8):
        """Brute-force match; returns (best_idx, second_idx, accept) numpy
        arrays (FeaturesDev::match, features.cu:267-304)."""
        from .ops.match import match_brute_force_jit
        best, second, accept, d1, d2 = match_brute_force_jit(
            self._ori, other._ori, ratio=ratio)
        return (np.asarray(best), np.asarray(second), np.asarray(accept),
                np.asarray(d1), np.asarray(d2))

    def match_and_print(self, other: "FeaturesDev", ostr,
                        ratio: float = 0.8) -> None:
        """show_distance-style report (features.cu:230-265)."""
        best, second, accept, d1, d2 = self.match(other, ratio)
        l_rev = np.asarray(self._rev)
        r_rev = np.asarray(other._rev)
        for i in range(self._num_ori):
            verdict = "accept" if accept[i] else "reject"
            ostr.write(
                f"{verdict} feat {l_rev[i]:4d} [{i:4d}] matches feat "
                f"{r_rev[best[i]]:4d} [{best[i]:4d}] ( 2nd feat "
                f"{r_rev[second[i]]:4d} [{second[i]:4d}] ) "
                f"dist {d1[i]:.3f} vs {d2[i]:.3f}\n")


# Alias kept for API parity: the reference exposes `popsift::Features` as the
# host type's historical name (features.h:64).
Features = FeaturesHost


def assemble_features(result: dict, upscale_factor: float) -> FeaturesHost:
    """Turn the padded device output of :func:`popsift_tpu.extract.
    extract_pipeline` into a compact FeaturesHost.

    Performs prep_features' coordinate scaling (sift_pyramid.cu:250-280):
    multiply x/y/sigma by 2^(octave - upscale_factor); features are grouped
    by octave in ascending order like the reference's global extremum array.
    """
    desc_blocks: list[np.ndarray] = []
    xs_l, ys_l, sg_l, nm_l, or_l, di_l, oc_l = [], [], [], [], [], [], []
    desc_base = 0

    for octave, od in enumerate(result["octaves"]):
        count = int(od["count"])
        ori_count = int(od["ori_count"])
        if ori_count > 0:
            desc_blocks.append(np.asarray(od["desc"][:ori_count]))
        if count == 0:
            desc_base += ori_count
            continue
        scale = np.float32(2.0 ** (octave - upscale_factor))
        xs_l.append(np.asarray(od["x"][:count]) * scale)
        ys_l.append(np.asarray(od["y"][:count]) * scale)
        sg_l.append(np.asarray(od["sigma"][:count]) * scale)
        nums = np.asarray(od["num_ori"][:count]).astype(np.int64)
        idx0 = np.asarray(od["idx_ori"][:count]).astype(np.int64)
        or_l.append(np.asarray(od["orientations"][:count]))

        # descriptor indices: base + idx_ori + k where k < num_ori, clipped
        # to the descriptors actually produced (orientation-capacity clamp)
        k = np.arange(ORIENTATION_MAX_COUNT, dtype=np.int64)[None, :]
        didx = desc_base + idx0[:, None] + k
        in_range = (k < nums[:, None]) & (didx < desc_base + ori_count)
        didx = np.where(in_range, didx, -1)
        di_l.append(didx)
        nm_l.append(in_range.sum(axis=1).astype(np.int32))
        oc_l.append(np.full(count, octave, np.int32))
        desc_base += ori_count

    descriptors = (np.concatenate(desc_blocks, axis=0)
                   if desc_blocks else np.zeros((0, 128), np.float32))

    def cat(parts, empty_shape, dtype):
        return (np.concatenate(parts, axis=0) if parts
                else np.zeros(empty_shape, dtype))

    soa = dict(
        xpos=cat(xs_l, (0,), np.float32),
        ypos=cat(ys_l, (0,), np.float32),
        sigma=cat(sg_l, (0,), np.float32),
        num_ori=cat(nm_l, (0,), np.int32),
        orientation=cat(or_l, (0, ORIENTATION_MAX_COUNT), np.float32),
        desc_idx=cat(di_l, (0, ORIENTATION_MAX_COUNT), np.int64),
        debug_octave=cat(oc_l, (0,), np.int32),
    )
    return FeaturesHost(soa=soa, descriptors=descriptors)


def assemble_features_dev(result: dict, upscale_factor: float) -> FeaturesDev:
    """Device-resident variant (clone_device_descriptors,
    sift_pyramid.cu:324-362): descriptors stay as jax arrays; features are
    compacted host-side (cheap metadata) while the descriptor matrix is a
    device concat of the valid prefixes."""
    import jax.numpy as jnp

    desc_parts = []
    rev_parts = []
    feat_x, feat_y, feat_s, feat_n = [], [], [], []
    ext_base = 0
    for octave, od in enumerate(result["octaves"]):
        count = int(od["count"])
        ori_count = int(od["ori_count"])
        scale = 2.0 ** (octave - upscale_factor)
        if ori_count > 0:
            desc_parts.append(od["desc"][:ori_count])
            rev_parts.append(np.asarray(od["feat_map"][:ori_count])
                             + ext_base)
        if count > 0:
            feat_x.append(np.asarray(od["x"][:count]) * scale)
            feat_y.append(np.asarray(od["y"][:count]) * scale)
            feat_s.append(np.asarray(od["sigma"][:count]) * scale)
            feat_n.append(np.asarray(od["num_ori"][:count]))
        ext_base += count

    if desc_parts:
        descriptors = jnp.concatenate(desc_parts, axis=0)
        rev = np.concatenate(rev_parts)
    else:
        descriptors = jnp.zeros((0, 128), jnp.float32)
        rev = np.zeros((0,), np.int64)

    features = dict(
        xpos=np.concatenate(feat_x) if feat_x else np.zeros(0, np.float32),
        ypos=np.concatenate(feat_y) if feat_y else np.zeros(0, np.float32),
        sigma=np.concatenate(feat_s) if feat_s else np.zeros(0, np.float32),
        num_ori=np.concatenate(feat_n) if feat_n else np.zeros(0, np.int32),
    )
    return FeaturesDev(features, descriptors, rev)
