"""Staged extraction with host-side count readback and bucketed compiles.

The monolithic :func:`popsift_tpu.extract.extract_pipeline` pads every
per-keypoint stage to worst-case capacity, so orientation/descriptor work is
proportional to *capacity*, not to the actual keypoint count.  The reference
has the same problem in reverse and solves it the same way this module does:
it reads the extrema counters back to the host between detection and
orientation (readDescCountersFromDevice, sift_pyramid.cu:373-376) and sizes
the downstream launches from them (s_orientation.cu:364-441).

Staged flow:

* **stage 1** (one jit): pyramid -> DoG -> dense detection -> refinement ->
  compaction (+ grid filter).  Returns pyramid/gradient fields (stay in
  HBM) and per-octave extremum buffers + a packed count vector (one scalar
  readback).
* **stage 2** (jit per bucket tuple): orientations for the first
  ``bucket(count)`` slots of each octave; returns packed ori counts.
* **stage 3** (jit per bucket tuple): descriptors for ``bucket(ori_count)``
  slots + normalisation.

Buckets are powers of two (min 128), so the jit cache stays small and the
padding waste is bounded by 2x instead of capacity/count.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, DescMode, NormMode
from .constants import build_const_info
from .extract import ExtractorPlan, make_plan
from .gauss import build_gauss_info
from .ops import descriptors as ops_desc
from .ops import extrema as ops_ext
from .ops import gradients as ops_grad
from .ops import orientation as ops_ori
from .ops import pyramid as ops_pyr


def bucket(n: int, lo: int = 128) -> int:
    """Smallest quarter-power-of-two step >= n (128, 160, 192, 224, 256,
    320, ...): bounds padded-slot waste to 25% instead of 2x while keeping
    the set of compile shapes small."""
    if n <= 0:
        return 0
    if n <= lo:
        return lo
    p = 1 << (n - 1).bit_length()       # next pow2 >= n
    half = p // 2
    step = max(half // 4, lo // 4)
    k = -(-(n - half) // step)
    return half + k * step


class StagedExtractor:
    """Compiled staged extraction for one (config, W, H) bucket."""

    def __init__(self, config: Config, width: int, height: int) -> None:
        self.config = config
        self.plan: ExtractorPlan = make_plan(config, width, height)
        self.gauss = build_gauss_info(config)
        self.consts = build_const_info(config)
        self._stage1a = jax.jit(self._stage1a_fn)
        self._stage1b = {}
        self._stage2 = {}
        self._stage3 = {}
        self._fused = {}
        self._last_buckets = None

    # ------------------------------------------------------------------
    def _stage1a_fn(self, image):
        """Pyramid + DoG + dense detection + candidate compaction +
        gradient fields. Returns candidate buffers and their counts (one
        readback sizes the refinement stage).

        Accepts uint8 images and normalizes on-device (uploading bytes is
        4x cheaper than pre-normalized f32; the reference likewise uploads
        bytes and converts in the texture unit, s_image.cu:147)."""
        from .tracing import scope
        plan = self.plan
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) * (1.0 / 255.0)
        with scope("pyramid"):
            stacks = ops_pyr.build_pyramid(
                image, self.gauss, plan.dims, plan.levels, plan.gauss_mode,
                plan.scaling_mode, plan.sift_mode, plan.upscale_factor)
            dogs = [ops_pyr.make_dog(s) for s in stacks]
        cands = []
        cand_counts = []
        cand_overflows = []
        with scope("detect"):
            for o in range(plan.octaves):
                mask = ops_ext.detect_candidates(
                    dogs[o], plan.sift_mode, plan.peak_threshold)
                cx, cy, cz, cvalid, ccount, coverflow = \
                    ops_ext.compact_mask(mask, plan.cand_caps[o])
                cands.append((cx, cy, cz, cvalid))
                cand_counts.append(ccount)
                cand_overflows.append(coverflow)
        with scope("gradients"):
            grads = [ops_grad.gradient_fields(s) for s in stacks]
        return dict(stacks=stacks, dogs=dogs, grads=grads, cands=cands,
                    cand_counts=jnp.stack(cand_counts),
                    cand_overflows=jnp.stack(cand_overflows))

    # ------------------------------------------------------------------
    def _stage1b_body(self, dogs, cands, cks):
        """Refinement + extremum compaction (+ grid filter) at bucketed
        candidate counts."""
        plan = self.plan
        exts = []
        for o in range(plan.octaves):
            ck = cks[o]
            w, h = plan.dims[o]
            if ck == 0:
                exts.append(ops_ext.compact_extrema(
                    *(jnp.zeros((1,), t) for t in
                      (jnp.float32, jnp.float32, jnp.int32,
                       jnp.float32, jnp.int32)),
                    jnp.zeros((1,), bool), plan.ext_caps[o]))
                continue
            cx, cy, cz, cvalid = cands[o]
            xn, yn, lpos, sigma, cell, ok = ops_ext.refine_extrema(
                dogs[o], cx[:ck], cy[:ck], cz[:ck] + 1, cvalid[:ck],
                plan.sift_mode, plan.sigma0, plan.sigma_k,
                plan.peak_threshold, plan.edge_limit,
                grid_w_div=w / plan.filter_grid_size,
                grid_h_div=h / plan.filter_grid_size,
                grid_width=plan.filter_grid_size)
            exts.append(ops_ext.compact_extrema(
                xn, yn, lpos, sigma, cell, ok,
                min(plan.ext_caps[o], max(ck, 128))))
        if plan.filter_max_extrema > 0:
            from .ops import filtergrid as ops_fg
            keeps = ops_fg.grid_filter_keep_masks(
                exts, plan.filter_max_extrema, plan.filter_grid_size,
                plan.grid_filter_mode)
            exts = [ops_fg.recompact(e, k) for e, k in zip(exts, keeps)]
        counts = jnp.stack([e.count for e in exts])
        overflows = jnp.stack([e.overflow for e in exts])
        return exts, counts, overflows

    def _stage2_body(self, grads, exts, ks):
        plan = self.plan
        outs = []
        ori_counts = []
        for o, k in enumerate(ks):
            if k == 0:
                outs.append((jnp.zeros((0,), jnp.int32),
                             jnp.zeros((0, 4), jnp.float32),
                             jnp.zeros((0,), jnp.int32)))
                ori_counts.append(jnp.int32(0))
                continue
            w, h = plan.dims[o]
            mag, theta = grads[o]
            e = exts[o]
            num_ori, oris = ops_ori.assign_orientations(
                mag, theta, e.xpos[:k], e.ypos[:k], e.lpos[:k],
                e.sigma[:k], e.valid[:k], w, h, plan.ori_win)
            nums = jnp.where(e.valid[:k], num_ori, 0)
            incl = jnp.cumsum(nums)
            outs.append((nums, oris, incl))
            ori_counts.append(incl[-1])
        return outs, jnp.stack(ori_counts)

    def _stage3_body(self, grads, stacks, exts, oris, ks, bs):
        plan = self.plan
        descs = []
        for o in range(plan.octaves):
            k, b = ks[o], bs[o]
            if b == 0 or k == 0:
                descs.append(jnp.zeros((0, 128), jnp.float32))
                continue
            w, h = plan.dims[o]
            mag, theta = grads[o]
            e = exts[o]
            nums, angs, incl = oris[o]
            idx_ori = incl - nums
            j = jnp.arange(b, dtype=jnp.int32)
            fmap = jnp.searchsorted(incl, j, side="right") \
                .astype(jnp.int32)
            ovalid = j < jnp.minimum(incl[-1], b)
            ei = jnp.clip(fmap, 0, k - 1)
            kk = jnp.clip(j - idx_ori[ei], 0, 3)
            ang = angs[ei, kk]
            ex, ey = e.xpos[:k][ei], e.ypos[:k][ei]
            el, es = e.lpos[:k][ei], e.sigma[:k][ei]

            from .extract import _dispatch_descriptors
            d = _dispatch_descriptors(
                plan, self.consts, stacks[o], mag, theta,
                ex, ey, el, es, ang, ovalid, w, h)
            if plan.norm_mode == NormMode.ROOT_SIFT:
                d = ops_desc.normalize_rootsift(d, plan.norm_multi, ovalid)
            else:
                d = ops_desc.normalize_l2(d, plan.norm_multi, ovalid)
            descs.append(d)
        return descs

    def _get_stage1b(self, cks: tuple[int, ...]):
        fn = self._stage1b.get(cks)
        if fn is None:
            fn = jax.jit(lambda dogs, cands:
                         self._stage1b_body(dogs, cands, cks))
            self._stage1b[cks] = fn
        return fn

    def _get_stage2(self, ks: tuple[int, ...]):
        fn = self._stage2.get(ks)
        if fn is None:
            fn = jax.jit(lambda grads, exts:
                         self._stage2_body(grads, exts, ks))
            self._stage2[ks] = fn
        return fn

    def _get_stage3(self, key: tuple):
        fn = self._stage3.get(key)
        if fn is None:
            ks, bs = key
            fn = jax.jit(lambda grads, stacks, exts, oris:
                         self._stage3_body(grads, stacks, exts, oris,
                                           ks, bs))
            self._stage3[key] = fn
        return fn

    def _get_fused(self, key: tuple):
        """One jitted program running stage1a..stage3 for a known bucket
        triple — the optimistic fast path: one dispatch, zero intermediate
        syncs (compiled per stable bucket triple)."""
        fn = self._fused.get(key)
        if fn is None:
            cks, ks, bs = key

            def fused(image):
                s1 = self._stage1a_fn(image)
                exts, counts, overflows = self._stage1b_body(
                    s1["dogs"], s1["cands"], cks)
                oris, ori_counts = self._stage2_body(s1["grads"], exts, ks)
                descs = self._stage3_body(
                    s1["grads"], s1["stacks"], exts, oris, ks, bs)
                return dict(
                    cand_counts=s1["cand_counts"],
                    exts=[tuple(e) for e in exts],
                    counts=counts, overflows=overflows,
                    oris=oris, ori_counts=ori_counts, descs=descs)

            fn = jax.jit(fused)
            self._fused[key] = fn
        return fn

    # ------------------------------------------------------------------
    def extract(self, image) -> dict[str, Any]:
        """Run the staged pipeline.  ``image`` is a (H, W) f32 [0,1] array
        (numpy or device).  Returns the same result pytree layout as
        :func:`popsift_tpu.extract.extract_pipeline`.

        Bucket selection is **optimistic**: the previous image's bucket
        sizes are reused so all stages dispatch back-to-back without
        waiting on intermediate count readbacks (host<->device syncs are
        expensive); a single readback at the end validates the counts and
        only on overflow are the affected stages redone with exact
        buckets.  Steady-state streams (video, SfM bursts) therefore pay
        one sync per image."""
        plan = self.plan

        guess = self._last_buckets
        if guess is not None:
            # optimistic fast path: ONE dispatch (fused program for the
            # guessed bucket triple), ONE bulk readback
            cks, ks, bs = guess
            host = jax.device_get(self._get_fused(guess)(image))
            cand_counts = host["cand_counts"]
            counts = host["counts"]
            ori_counts = host["ori_counts"]
            ok = (all(int(c) <= cks[o] for o, c in enumerate(cand_counts))
                  and all(int(c) <= ks[o] for o, c in enumerate(counts))
                  and all(int(c) <= bs[o]
                          for o, c in enumerate(ori_counts)))
            if ok:
                self._update_buckets(cand_counts, counts, ori_counts)
                return self._package_host(host, counts, ori_counts, ks, bs)

        # exact path (first image or bucket overflow)
        s1 = self._stage1a(image)
        cand_counts = np.asarray(s1["cand_counts"])  # readback 1
        cks = tuple(min(bucket(int(c)), plan.cand_caps[o])
                    for o, c in enumerate(cand_counts))

        exts, counts_dev, overflows_dev = self._get_stage1b(cks)(
            s1["dogs"], s1["cands"])
        s1 = dict(s1, exts=exts, overflows=overflows_dev)

        counts = np.asarray(counts_dev)  # readback 2
        ks = tuple(min(bucket(int(c)), int(exts[o].valid.shape[0]))
                   for o, c in enumerate(counts))

        oris, ori_counts_dev = self._get_stage2(ks)(s1["grads"], s1["exts"])
        ori_counts = np.asarray(ori_counts_dev)  # readback 3
        bs = tuple(min(bucket(int(c)), plan.ori_caps[o])
                   for o, c in enumerate(ori_counts))

        descs = self._get_stage3((ks, bs))(
            s1["grads"], s1["stacks"], s1["exts"], oris)
        self._update_buckets(cand_counts, counts, ori_counts)

        host = jax.device_get(dict(
            exts=[tuple(e) for e in exts],
            overflows=s1["overflows"], oris=oris, descs=descs))
        return self._package_host(host, counts, ori_counts, ks, bs)

    def _update_buckets(self, cand_counts, counts, ori_counts):
        """Adapt the optimistic buckets to the observed counts with
        hysteresis: keep the current bucket while the count fits (stable
        bucket tuples = stable jit cache); grow with 2x headroom on
        overflow; shrink only when the count drops far below (< 1/8) so
        oscillating scenes don't churn compiles."""
        plan = self.plan
        last = self._last_buckets or ((0,) * plan.octaves,) * 3

        def step(cur: int, count: int, cap: int) -> int:
            count = int(count)
            grown = int(count * 1.3) + 1
            if count > cur:
                return min(bucket(grown), cap)
            if cur > 128 and count * 8 < cur:
                return min(bucket(grown), cap) if count else 0
            return cur

        cks = tuple(step(last[0][o], c, plan.cand_caps[o])
                    for o, c in enumerate(cand_counts))

        def ext_buf(o):
            if cks[o] == 0:
                return plan.ext_caps[o]
            return min(plan.ext_caps[o], max(cks[o], 128))

        ks = tuple(min(step(last[1][o], c, plan.ext_caps[o]), ext_buf(o))
                   for o, c in enumerate(counts))
        bs = tuple(step(last[2][o], c, plan.ori_caps[o])
                   for o, c in enumerate(ori_counts))
        self._last_buckets = (cks, ks, bs)

    def _package_host(self, host, counts, ori_counts,
                      ks, bs) -> dict[str, Any]:
        """Assemble the result pytree (layout-compatible with
        extract_pipeline's output) from already-fetched host data.

        Everything was fetched in ONE device_get upstream — no eager
        per-slice device ops (each would be a dispatch round-trip), which
        matters a lot on remote-attached TPUs."""
        plan = self.plan
        out: dict[str, Any] = {"octaves": []}
        for o in range(plan.octaves):
            xpos, ypos, lpos, sigma, cell, valid, _cnt, _ovf = \
                host["exts"][o]
            k, b = ks[o], bs[o]
            nums, angs, incl = host["oris"][o]
            idx_ori = incl - nums
            ori_count = int(min(ori_counts[o], b))
            j = np.arange(b, dtype=np.int32)
            if b > 0:
                fmap = np.searchsorted(incl, j, side="right") \
                    .astype(np.int32)
                fmap = np.clip(fmap, 0, max(k - 1, 0))
            else:
                fmap = j
            out["octaves"].append(dict(
                x=xpos[:k], y=ypos[:k], lpos=lpos[:k], sigma=sigma[:k],
                cell=cell[:k], valid=valid[:k],
                count=np.int32(min(int(counts[o]), k)),
                overflow=host["overflows"][o],
                num_ori=nums, orientations=angs, idx_ori=idx_ori,
                desc=host["descs"][o],
                ori_valid=j < ori_count,
                ori_count=np.int32(ori_count),
                ori_overflow=np.int32(max(0, int(ori_counts[o]) - b)),
                feat_map=fmap,
            ))
        return out


@functools.lru_cache(maxsize=16)
def get_staged_extractor(config: Config, width: int,
                         height: int) -> StagedExtractor:
    return StagedExtractor(config, width, height)
