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

import collections
import functools
import os
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
        import threading
        self.config = config
        self._wh = (width, height)
        # wire-lean transfer (u8/u8p descriptor modes): keypoint
        # coordinates, sigma and per-descriptor angles also ride the wire
        # as 16-bit fixed point.  Quantisation error (<= dim/131070 px,
        # ~1e-4 in log2 sigma, ~5e-5 rad) is far below the float
        # tolerance of the parity harness and below the positional
        # precision implied by the reference's own uchar descriptor
        # output; the default f32/u16 modes keep exact f32 sections.
        self._wire_lean = config.desc_transfer in ("u8", "u8p")
        self.plan: ExtractorPlan = make_plan(config, width, height)
        self.gauss = build_gauss_info(config)
        self.consts = build_const_info(config)
        self._stage1a = jax.jit(self._stage1a_fn)
        self._stage1b = {}
        self._stage2 = {}
        self._stage3 = {}
        self._fused = {}
        self._fused_packed = {}
        self._fused_packed_batch = {}
        self._last_buckets = None
        # Written ONLY by the collect/download thread (_update_buckets /
        # first-frame bootstrap under _init_lock); the dispatch thread
        # reads it through has_key() to decide batching.  A stale read
        # is safe: None/old-key only costs one extra single-dispatch or
        # a regrow round, never a wrong result.
        self._last_key5 = None
        # serialises first-frame key establishment across pipeline workers
        # (without it, N workers racing on frame 1 each derive their own
        # bucket key and compile N distinct fused programs)
        self._init_lock = threading.Lock()
        self._frames_seen = 0
        # sigma-classed windows (POPSIFT_TPU_SIGMA_CLASSES=1 to enable):
        # the optimistic program processes sigma-sorted slots at
        # class-sized windows, saving ~2 ms/image of device time — but
        # round-5 measurement on varied content showed class violations
        # are ENDEMIC (6-106 violating slots on most frames outside the
        # settling content regime), and every violating frame pays a
        # full exact-window redo while the enable/disable transitions
        # double the compiled program family.  On the wall-clock-
        # dominated pipeline that trade lost, so classes are opt-in.
        # When enabled: a streak of violations turns them off for this
        # extractor; after _class_probation clean frames the classed
        # program is re-tried once (only when still in the jit cache,
        # so probation is compile-free); another violation re-disables
        # with 4x backoff.
        import os as _os
        self._classes_enabled = _os.environ.get(
            "POPSIFT_TPU_SIGMA_CLASSES", "") not in ("", "0")
        self._class_viol_streak = 0
        self._frames_since_disable = 0
        self._class_probation = 64
        self._class_probation_active = False
        # recent actual descriptor totals, for the count-adaptive prefix
        # fetch of the flat transfer buffer (desc section is last).
        # The deque is mutated ONLY on the collect/download thread
        # (_update_buckets); the dispatch thread reads the precomputed
        # _recent_ori_max int instead (CPython attribute reads/writes are
        # atomic) — iterating the deque cross-thread raises "deque mutated
        # during iteration".
        self._recent_ori_totals: collections.deque = collections.deque(
            maxlen=8)
        self._recent_ori_max: int | None = None
        # per-bucket consecutive-low-frame counters for the shrink rule
        # (_update_buckets_locked.step)
        self._shrink_streaks: dict = {}
        # per-bucket floors established by REGROWS in this process: a
        # regrow is hard evidence the stream needs that size, so the
        # shrink rule never goes below it again (each wrong shrink
        # costs an ~85 s recompile when the regime returns); floors are
        # process-local, so a stale saved key with no regrow evidence
        # can still shrink away
        self._bucket_floors: dict = {}
        # (key, words) of the last prefix length handed to a dispatch
        # (sticky window; see wire_prefix_words)
        self._last_prefix: tuple | None = None
        # keys whose non-classed insurance program has been queued for
        # background compilation (see _prewarm_nonclassed)
        self._prewarmed: set = set()
        # recent nonzero-byte totals of the u8p-packed desc section
        self._recent_nz: collections.deque = collections.deque(maxlen=8)
        self._recent_nz_max: int | None = None
        # collect-side state (buckets, recent-count stats, class state
        # machine) is now updated from a POOL of downloader threads
        # (per-image concurrent fetches), so the single-writer invariant
        # of rounds 1-4 is replaced by this lock; it is uncontended in
        # the common case and held for microseconds
        self._stats_lock = threading.RLock()

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
            # pyramid + DoG + gradient fields; big octaves ride the
            # fused octave-chain kernel (one VMEM pass per octave,
            # kernels/octave.py — the s_pyramid_fixed.cu:69-120 shape).
            # Without a sampling descriptor mode the raw stack is never
            # read downstream, so chain octaves skip writing it
            # (stacks[o] is None there; every consumer accepts that).
            from .extract import field_pads
            pads = tuple(field_pads(plan, plan.dims[o])
                         for o in range(plan.octaves))
            full_stacks = (plan.desc_mode != DescMode.LOOP
                           or os.environ.get("POPSIFT_TPU_STACK_KERNELS",
                                             "") not in ("", "0"))
            stacks, dogs, grads = ops_pyr.build_pyramid_dogs_fields(
                image, self.gauss, plan.dims, plan.levels, plan.gauss_mode,
                plan.scaling_mode, plan.sift_mode, plan.upscale_factor,
                pads, full_stacks)
        cands = []
        cand_counts = []
        cand_overflows = []
        with scope("detect"):
            for o in range(plan.octaves):
                w, h = plan.dims[o]
                cx, cy, cz, cvalid, ccount, coverflow = \
                    ops_ext.detect_and_compact(
                        dogs[o], plan.sift_mode, plan.peak_threshold,
                        plan.cand_caps[o], true_dims=(h, w))
                cands.append((cx, cy, cz, cvalid))
                cand_counts.append(ccount)
                cand_overflows.append(coverflow)
        return dict(stacks=stacks, dogs=dogs, grads=grads, cands=cands,
                    cand_counts=jnp.stack(cand_counts),
                    cand_overflows=jnp.stack(cand_overflows))

    # ------------------------------------------------------------------
    def _stage1b_body(self, dogs, cands, cks):
        """Refinement + extremum compaction (+ grid filter) at bucketed
        candidate counts.  Refinement runs per octave: the joint
        all-octave variant (refine_extrema_multi with >1 octave) was
        measured slightly SLOWER on TPU (7.2 vs 6.3 ms at 1080p) because
        the global convergence loop runs the full 5 iterations for every
        octave, while per-octave loops early-exit independently."""
        plan = self.plan
        parts = [o for o in range(plan.octaves) if cks[o] > 0]
        refined = {}
        for o in parts:
            refined[o] = ops_ext.refine_extrema_multi(
                [dogs[o]],
                [(cands[o][0][:cks[o]], cands[o][1][:cks[o]],
                  cands[o][2][:cks[o]] + 1, cands[o][3][:cks[o]])],
                plan.sift_mode, plan.sigma0, plan.sigma_k,
                plan.peak_threshold, plan.edge_limit,
                [(plan.dims[o][0] / plan.filter_grid_size,
                  plan.dims[o][1] / plan.filter_grid_size)],
                plan.filter_grid_size,
                true_dims=[plan.dims[o]])[0]
        exts = []
        for o in range(plan.octaves):
            ck = cks[o]
            if ck == 0:
                exts.append(ops_ext.compact_extrema(
                    *(jnp.zeros((1,), t) for t in
                      (jnp.float32, jnp.float32, jnp.int32,
                       jnp.float32, jnp.int32)),
                    jnp.zeros((1,), bool), plan.ext_caps[o]))
                continue
            xn, yn, lpos, sigma, cell, ok = refined[o]
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

    def _stage2_body(self, grads, stacks, exts, ks,
                     classed: bool = False):
        """``classed=True`` (the optimistic fused path only) processes
        sigma-sorted slots at class-sized windows and accumulates a
        violation count the fused program's validation readback checks;
        the exact path always runs the max window (always correct)."""
        plan = self.plan
        outs = []
        ori_counts = []
        viol = jnp.int32(0)
        for o, k in enumerate(ks):
            if k == 0:
                outs.append((jnp.zeros((0,), jnp.int32),
                             jnp.zeros((0, 4), jnp.float32),
                             jnp.zeros((0,), jnp.int32)))
                ori_counts.append(jnp.int32(0))
                continue
            w, h = plan.dims[o]
            from .extract import field_pads, window_classes
            pad_y, pad_x = field_pads(plan, plan.dims[o])
            e = exts[o]
            classes = window_classes(
                plan.ori_win, k, (1 / 8, 3 / 8, 1 / 2),
                chunk=256, min_cap=self.CLASS_MIN_CAP) if classed else None
            if classes is not None:
                num_ori, oris, v = ops_ori.assign_orientations_classed(
                    grads[o], pad_y, pad_x, e.xpos[:k], e.ypos[:k],
                    e.lpos[:k], e.sigma[:k], e.valid[:k], w, h, classes,
                    stack=stacks[o])
                viol = viol + v
            else:
                num_ori, oris = ops_ori.assign_orientations(
                    grads[o], pad_y, pad_x, e.xpos[:k], e.ypos[:k],
                    e.lpos[:k], e.sigma[:k], e.valid[:k], w, h,
                    plan.ori_win, stack=stacks[o])
            nums = jnp.where(e.valid[:k], num_ori, 0)
            incl = jnp.cumsum(nums)
            outs.append((nums, oris, incl))
            ori_counts.append(incl[-1])
        return outs, jnp.stack(ori_counts), viol

    # minimum slot capacity for the sigma-classed window split (below
    # this the per-region chunk padding dominates); tests lower it
    CLASS_MIN_CAP = 512

    def _note_frame_classes(self, win_viol: int, key: tuple) -> None:
        """Sigma-classed-window state machine, one call per frame.

        Violations (heavy-tail sigma content, e.g. heavily blurred
        streams) in a 3-frame streak disable the classed windows for this
        extractor so frames stop paying classed-run-then-exact-redo
        twice.  After ``_class_probation`` clean frames the classed
        program is re-tried once — only when it is still in the jit
        cache at the current key, so probation never costs a compile; a
        violation during probation re-disables immediately (streak seeds
        at 2) and backs the probation interval off 4x (cap 4096)."""
        with self._stats_lock:
            self._note_frame_classes_locked(win_viol, key)

    def _note_frame_classes_locked(self, win_viol: int, key: tuple) -> None:
        if win_viol > 0:
            self._class_viol_streak += 1
            if self._class_viol_streak >= 3 and self._classes_enabled:
                self._classes_enabled = False
                self._frames_since_disable = 0
                if self._class_probation_active:
                    self._class_probation = min(
                        self._class_probation * 4, 4096)
                self._class_probation_active = False
        else:
            self._class_viol_streak = 0
            if self._classes_enabled:
                self._class_probation_active = False
            else:
                self._frames_since_disable += 1
                if (self._frames_since_disable >= self._class_probation
                        and ((key, True) in self._fused_packed_batch
                             or (key, True) in self._fused_packed)):
                    self._classes_enabled = True
                    self._class_viol_streak = 2
                    self._class_probation_active = True

    def _stage3_body(self, grads, stacks, exts, oris, ks, bs,
                     classed: bool = False):
        """Returns (descs, angds, viol): per-octave descriptors, the
        per-descriptor-row angles (the wire carries ONE angle per
        descriptor row instead of 4 per feature slot — at mean
        num_ori~1.05 the (FT, 4) orientation section was ~97% padding),
        and the classed-window violation count."""
        plan = self.plan
        descs = []
        angds = []
        viol = jnp.int32(0)
        for o in range(plan.octaves):
            k, b = ks[o], bs[o]
            if b == 0 or k == 0:
                descs.append(jnp.zeros((0, 128), jnp.float32))
                angds.append(jnp.zeros((0,), jnp.float32))
                continue
            w, h = plan.dims[o]
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
            angds.append(jnp.where(ovalid, ang, 0.0))
            ex, ey = e.xpos[:k][ei], e.ypos[:k][ei]
            el, es = e.lpos[:k][ei], e.sigma[:k][ei]

            from .extract import (_dispatch_descriptors, field_pads,
                                  window_classes)
            pad_y, pad_x = field_pads(plan, plan.dims[o])
            classes = window_classes(
                plan.desc_win, b, (1 / 8, 1 / 2, 3 / 8),
                chunk=64, min_cap=self.CLASS_MIN_CAP) \
                if classed and plan.desc_mode == DescMode.LOOP else None
            if classes is not None:
                d, v = ops_desc.loop_descriptors_classed(
                    grads[o], pad_y, pad_x, ex, ey, el, es, ang, ovalid,
                    w, h, classes, stack=stacks[o])
                viol = viol + v
            else:
                d = _dispatch_descriptors(
                    plan, self.consts, stacks[o], grads[o], pad_y, pad_x,
                    ex, ey, el, es, ang, ovalid, w, h)
            if plan.norm_mode == NormMode.ROOT_SIFT:
                d = ops_desc.normalize_rootsift(d, plan.norm_multi, ovalid)
            else:
                d = ops_desc.normalize_l2(d, plan.norm_multi, ovalid)
            descs.append(self._quantize_descs(d))
        return descs, angds, viol

    # ------------------------------------------------------------------
    # Descriptor transfer precision (Config.desc_transfer): normalised
    # descriptors are bounded by 2^norm_multi, so 16-bit fixed point keeps
    # absolute error <= 2^norm_multi/131070 while quartering the D2H
    # payload — which on a remotely-attached TPU is the throughput ceiling
    # (the reference's PCIe D2H, sift_pyramid.cu:304-318, has no such
    # bottleneck).
    # "u8" halves that again (absolute error <= 2^norm_multi/510 — the
    # precision of the reference's own uchar descriptor output,
    # features.cu:319-323).
    def _quantize_descs(self, d):
        if self.config.desc_transfer == "u16":
            bound = 2.0 ** self.plan.norm_multi
            q = jnp.round(jnp.clip(d, 0.0, bound) * (65535.0 / bound))
            return q.astype(jnp.uint16)
        if self.config.desc_transfer in ("u8", "u8p"):
            bound = 2.0 ** self.plan.norm_multi
            q = jnp.round(jnp.clip(d, 0.0, bound) * (255.0 / bound))
            return q.astype(jnp.uint8)
        return d

    def _dequantize_descs(self, arr):
        bound = 2.0 ** self.plan.norm_multi
        if arr.dtype == np.uint16:
            return arr.astype(np.float32) * (bound / 65535.0)
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) * (bound / 255.0)
        return arr

    def _finalize_body(self, exts, oris, descs, angds, ks, bs,
                       ft: int, bt: int):
        """Device-side feature finalisation: the analog of prep_features
        (sift_pyramid.cu:250-280) plus global compaction.

        Packs the per-octave bucketed buffers into global SoA arrays sized
        by total-count buckets (ft features, bt descriptors): coordinates
        scaled by 2^(octave - upscale) and per-feature descriptor indices.
        Packing on device shrinks the D2H payload to ~the true feature
        count — on a remotely-attached TPU the download wire is the
        throughput ceiling.

        Each octave's bucket has its VALID entries in the leading
        ``count`` slots, so global packing writes every octave's full
        bucket at its running base offset with ``dynamic_update_slice`` in
        ascending octave order: each write's trailing padding garbage is
        overwritten by the next octave's leading valid rows.  (An earlier
        formulation used a searchsorted + row-gather, which lowers to a
        serial per-row gather loop on TPU — ~7 ms of the fused program.)

        The descriptor->feature reverse map (feat_to_ext_map analog) is
        NOT packed: it is derivable on the host as repeat(arange(ft),
        num_ori), which the decode does for free."""
        plan = self.plan
        up = plan.upscale_factor

        # placeholder descriptor dtype must follow the configured transfer
        # precision so the flat buffer's length always equals
        # _flat_layout()['_total'], even when a bucket is 0
        desc_dtype = {"u16": jnp.uint16, "u8": jnp.uint8,
                      "u8p": jnp.uint8}.get(
            self.config.desc_transfer, jnp.float32)

        parts = [o for o in range(plan.octaves) if ks[o] > 0]
        if not parts or ft == 0:
            z = jnp.zeros((max(ft, 1),), jnp.float32)
            zi = jnp.zeros((max(ft, 1),), jnp.int32)
            return dict(
                x=z, y=z, sigma=z, num_ori=zi, idx_ori=zi, octave=zi,
                ori_d=jnp.zeros((max(bt, 1),), jnp.float32),
                desc=jnp.zeros((max(bt, 1), 128), desc_dtype),
                ext_total=jnp.int32(0), ori_total=jnp.int32(0))

        dus = jax.lax.dynamic_update_slice
        ke = [ks[o] for o in parts]
        be = [bs[o] for o in parts]
        # overhang padding: a full bucket written at base <= ft stays in
        # bounds, so dynamic_update_slice never clamps (which would shift
        # the write window and corrupt the packing)
        FT = ft + max(ke)
        BT = (bt + max(be)) if bt > 0 else 1

        fbuf = {name: jnp.zeros((FT,), jnp.float32)
                for name in ("x", "y", "sigma")}
        ibuf = {name: jnp.zeros((FT,), jnp.int32)
                for name in ("num_ori", "idx_ori", "octave")}
        obuf = jnp.zeros((BT,), jnp.float32)
        dbuf = jnp.zeros((BT, 128), desc_dtype)

        base_e = jnp.int32(0)
        base_d = jnp.int32(0)
        for o in parts:
            k, b = ks[o], bs[o]
            e = exts[o]
            nums, angs, incl = oris[o]
            scale = jnp.float32(2.0 ** (o - up))
            ecnt = jnp.minimum(e.count, k).astype(jnp.int32)
            dcnt = (jnp.minimum(incl[-1], b).astype(jnp.int32)
                    if b > 0 else jnp.int32(0))
            be_o = jnp.minimum(base_e, ft)
            bd_o = jnp.minimum(base_d, max(bt, 1))
            fbuf["x"] = dus(fbuf["x"], e.xpos[:k] * scale, (be_o,))
            fbuf["y"] = dus(fbuf["y"], e.ypos[:k] * scale, (be_o,))
            fbuf["sigma"] = dus(fbuf["sigma"], e.sigma[:k] * scale,
                                (be_o,))
            idx_l = incl - nums
            # orientations beyond this octave's descriptor budget get no
            # descriptor rows: clamp num_ori accordingly (same clamp the
            # gather formulation applied via dcnt)
            num_eff = jnp.maximum(jnp.minimum(nums, dcnt - idx_l), 0)
            ibuf["num_ori"] = dus(ibuf["num_ori"], num_eff, (be_o,))
            ibuf["idx_ori"] = dus(ibuf["idx_ori"], idx_l + base_d,
                                  (be_o,))
            ibuf["octave"] = dus(ibuf["octave"],
                                 jnp.full((k,), o, jnp.int32), (be_o,))
            if b > 0 and bt > 0:
                dbuf = dus(dbuf, descs[o], (bd_o, jnp.int32(0)))
                obuf = dus(obuf, angds[o], (bd_o,))
            base_e = base_e + ecnt
            base_d = base_d + dcnt

        ext_total = base_e
        ori_total = base_d
        i = jnp.arange(ft, dtype=jnp.int32)
        valid_f = i < ext_total
        jd = jnp.arange(max(bt, 1), dtype=jnp.int32)
        feat = dict(
            x=jnp.where(valid_f, fbuf["x"][:ft], 0.0),
            y=jnp.where(valid_f, fbuf["y"][:ft], 0.0),
            sigma=jnp.where(valid_f, fbuf["sigma"][:ft], 0.0),
            num_ori=jnp.where(valid_f, ibuf["num_ori"][:ft], 0),
            idx_ori=jnp.where(valid_f, ibuf["idx_ori"][:ft], 0),
            octave=jnp.where(valid_f, ibuf["octave"][:ft], 0),
            ori_d=jnp.where(jd < ori_total, obuf[:max(bt, 1)], 0.0),
            desc=dbuf[:max(bt, 1)],
            ext_total=ext_total, ori_total=ori_total)
        return feat

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
            # exact path: max windows, always correct (no sigma classes)
            fn = jax.jit(lambda grads, stacks, exts:
                         self._stage2_body(grads, stacks, exts, ks)[:2])
            self._stage2[ks] = fn
        return fn

    def _get_stage3(self, key: tuple):
        fn = self._stage3.get(key)
        if fn is None:
            ks, bs = key
            fn = jax.jit(lambda grads, stacks, exts, oris:
                         self._stage3_body(grads, stacks, exts, oris,
                                           ks, bs)[0])  # descs only
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
                oris, ori_counts, _ = self._stage2_body(
                    s1["grads"], s1["stacks"], exts, ks)
                descs, _, _ = self._stage3_body(
                    s1["grads"], s1["stacks"], exts, oris, ks, bs)
                return dict(
                    cand_counts=s1["cand_counts"],
                    exts=[tuple(e) for e in exts],
                    counts=counts, overflows=overflows,
                    oris=oris, ori_counts=ori_counts, descs=descs)

            fn = jax.jit(fused)
            self._fused[key] = fn
        return fn

    def _flat_layout(self, key: tuple) -> dict:
        """Static word-offset layout of the single flat u32 transfer
        buffer for a bucket 5-tuple.  Everything the host needs per image
        is packed into ONE 1-D device array so the steady-state download
        is exactly one fetch — on a remotely-attached TPU every
        per-array fetch pays a full network round trip, which dwarfs the
        payload cost (measured: ~90 ms for a 1.2 MB many-leaf pytree vs
        ~RTT+size/bw for one array)."""
        cks, ks, bs, ft, bt = key
        O = self.plan.octaves
        FT, BT = max(ft, 1), max(bt, 1)
        desc_words = BT * {"u16": 64, "u8": 32, "u8p": 32}.get(
            self.config.desc_transfer, 128)
        # num_ori (3 bits) and octave (5 bits, MAX_OCTAVES=20) share one
        # byte per feature slot; idx_ori is NOT transferred — it is the
        # exclusive cumsum of num_ori, reconstructed host-side in
        # _decode_flat (equal to the device value for every row with
        # num_ori > 0; zero-ori rows' idx is never dereferenced)
        # ori_d: ONE f32 angle per descriptor row (orientation[4] per
        # feature is reconstructed host-side from num_ori/idx_ori); desc
        # is deliberately LAST so the downloader can fetch a
        # count-adaptive prefix of the buffer (see wire_prefix_words)
        sizes = [("cand_counts", O), ("counts", O), ("ori_counts", O),
                 ("overflows", O), ("totals", 3)]
        if self._wire_lean:
            # 16-bit fixed-point keypoint sections (see __init__): x and
            # y packed into one u32 per feature slot; sigma (log2-coded)
            # and the per-descriptor angle as u16 pairs
            sizes += [("xy", FT), ("sg", -(-FT // 2)),
                      ("ori_d", -(-BT // 2))]
        else:
            sizes += [("x", FT), ("y", FT), ("sigma", FT), ("ori_d", BT)]
        sizes += [("no_oct", -(-FT // 4))]
        if self.config.desc_transfer == "u8p":
            # zero-compacted u8: a per-entry zero bitmap (decoded
            # host-side — the DOWNLOAD direction has no XLA-decode
            # constraint, unlike the upload codec) followed by the
            # packed nonzero bytes; the desc section stays LAST so the
            # count-adaptive prefix fetch still applies (now sized by
            # the recent nonzero-count maximum instead of row count)
            sizes += [("desc_bitmap", BT * 4), ("desc", desc_words)]
        else:
            sizes += [("desc", desc_words)]
        off, layout = 0, {}
        for name, n in sizes:
            layout[name] = (off, off + n)
            off += n
        layout["_total"] = off
        layout["_FT"], layout["_BT"] = FT, BT
        return layout

    def _note_ori_total(self, ori_total: int) -> None:
        """Record an observed descriptor total (downloader pool; the
        dispatch thread reads the precomputed _recent_ori_max int)."""
        with self._stats_lock:
            self._recent_ori_totals.append(int(ori_total))
            self._recent_ori_max = max(self._recent_ori_totals)

    def _note_nz(self, nz: int) -> None:
        """Record an observed packed-descriptor byte count (downloader
        pool; the dispatch thread reads _recent_nz_max)."""
        with self._stats_lock:
            self._recent_nz.append(int(nz))
            self._recent_nz_max = max(self._recent_nz)

    # ------------------------------------------------------------------
    # Bucket-key persistence: the settled key per (config, size) is saved
    # next to the XLA persistent cache, so a NEW PROCESS adopts it
    # directly — its batch program is then a persistent-cache hit and the
    # cold-start path (stage1a + seed program compile) is skipped
    # entirely.  The analog of the reference shipping compiled fatbins:
    # the expensive part of startup becomes a deserialisation.
    def _saved_key_id(self) -> str:
        return repr((self.config.static_key(), self._wh))

    @staticmethod
    def _keys_cache_path():
        import os
        try:
            d = jax.config.jax_compilation_cache_dir
        except Exception:
            return None
        if not d:
            return None
        return os.path.join(d, "popsift_bucket_keys.json")

    def _load_saved_key(self):
        import json
        path = self._keys_cache_path()
        if path is None:
            return None
        try:
            with open(path) as f:
                entry = json.load(f).get(self._saved_key_id())
        except (OSError, ValueError):
            return None
        if not entry:
            return None
        try:
            cks, ks, bs, ft, bt = entry
            O = self.plan.octaves
            if not (len(cks) == len(ks) == len(bs) == O):
                return None
            key = (tuple(int(v) for v in cks), tuple(int(v) for v in ks),
                   tuple(int(v) for v in bs), int(ft), int(bt))
            for o in range(O):
                if not (0 <= key[0][o] <= self.plan.cand_caps[o]
                        and 0 <= key[1][o] <= self.plan.ext_caps[o]
                        and 0 <= key[2][o] <= self.plan.ori_caps[o]):
                    return None
            if not (0 < key[3] <= sum(key[1]) and 0 < key[4]
                    <= max(sum(key[2]), 1)):
                return None
            return key
        except (TypeError, ValueError):
            return None

    def _save_key(self) -> None:
        import json
        import os
        path = self._keys_cache_path()
        if path is None or self._last_key5 is None:
            return
        try:
            try:
                with open(path) as f:
                    data = json.load(f)
            except (OSError, ValueError):
                data = {}
            data[self._saved_key_id()] = self._last_key5
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(data, f)
            os.replace(tmp, path)
        except OSError:
            pass

    # prefix-fetch quantum (u32 words; 8 KiB).  Round 4 used 64 KiB "so
    # the tiny device-side slice programs stay few and cached", but the
    # slice-program count is bounded by the PREFIX value churn, not the
    # quantum (the sticky window below), and 64 KiB rounding alone was
    # up to ~10% of the whole per-image payload (round-4 VERDICT 1b)
    WIRE_GRAN = 2048
    # sticky prefix: reuse the last prefix length while the fresh
    # estimate stays within this many words below it.  Measured on the
    # remote TPU: every DISTINCT prefix length compiles a new tiny
    # slice program at ~600 ms (round-trip compile), so value churn —
    # not quantum size — is what must be bounded.  8192 words = 32 KiB
    # of worst-case over-fetch, ~8% of a 1080p image's payload.
    WIRE_STICKY = 8192

    def wire_prefix_words(self, key: tuple) -> int | None:
        """Count-adaptive transfer length for the flat buffer.

        The desc section is last and bucket-padded; frames only need
        ``ori_total`` rows of it.  Returns the 64 KiB-quantised word
        count covering every header section plus 1.125x the recent-max
        descriptor total, or None when the full buffer should be fetched
        (no history yet, or the estimate reaches the bucket anyway).
        A frame whose actual counts exceed the prefix is refetched in
        full by :meth:`extract_collect` — the same optimistic-validation
        pattern as the bucket system."""
        lay = self._flat_layout(key)
        a, b = lay["desc"]
        bt_rows = lay["_BT"]
        if self.config.desc_transfer == "u8p":
            # packed desc: prefix sized by the recent nonzero-BYTE max
            # (the bitmap section sits before ``a`` and is always fully
            # inside the prefix)
            nz_max = self._recent_nz_max
            if nz_max is None:
                return None
            est_words = (int(nz_max * 1.25) + 256) // 4
            need = a + est_words
        else:
            recent_max = self._recent_ori_max
            if recent_max is None:
                return None
            est_rows = int(recent_max * 1.125) + 8
            if est_rows >= bt_rows:
                return None
            wpr = (b - a) // bt_rows  # words per descriptor row
            need = a + est_rows * wpr
        need = -(-need // self.WIRE_GRAN) * self.WIRE_GRAN
        if need >= lay["_total"]:
            return None
        # sticky window: reuse the previous prefix while the fresh need
        # stays within WIRE_STICKY below it (see WIRE_STICKY).  Locked:
        # matching mode dispatches from N worker threads, and a racy
        # read-modify-write here would ping-pong the prefix value —
        # each distinct value costs a ~600 ms slice-program compile.
        with self._stats_lock:
            last = self._last_prefix
            if (last is not None and last[0] == key
                    and need <= last[1] <= need + self.WIRE_STICKY
                    and last[1] < lay["_total"]):
                return last[1]
            self._last_prefix = (key, need)
        return need

    # log2-sigma quantisation range of the wire-lean sigma section:
    # covers sigma in [2^-6, 2^14] with relative error <= 1.1e-4
    SIG_LO, SIG_HI = -6.0, 14.0

    @staticmethod
    def _u16_words(a):
        """Bitcast a (n,) u16 array to ceil(n/2) u32 words (LE pairs)."""
        if a.shape[0] % 2:
            a = jnp.pad(a, (0, 1))
        return jax.lax.bitcast_convert_type(
            a.reshape(-1, 2), jnp.uint32)

    def _encode_lean_sections(self, p):
        """Wire-lean 16-bit fixed-point encode of x/y/sigma/ori_d (the
        dequantising decode lives in _decode_flat)."""
        import math
        xm, ym = float(self._wh[0]), float(self._wh[1])
        xq = jnp.round(jnp.clip(p["x"], 0.0, xm) * (65535.0 / xm)) \
            .astype(jnp.uint32)
        yq = jnp.round(jnp.clip(p["y"], 0.0, ym) * (65535.0 / ym)) \
            .astype(jnp.uint32)
        lo, hi = self.SIG_LO, self.SIG_HI
        lg = jnp.log2(jnp.maximum(p["sigma"], 2.0 ** lo))
        sq = jnp.round(jnp.clip(lg - lo, 0.0, hi - lo)
                       * (65535.0 / (hi - lo))).astype(jnp.uint16)
        oq = jnp.round((jnp.clip(p["ori_d"], -math.pi, math.pi)
                        + math.pi) * (65535.0 / (2.0 * math.pi))) \
            .astype(jnp.uint16)
        return [xq | (yq << 16), self._u16_words(sq),
                self._u16_words(oq)]

    @staticmethod
    def _as_u32(a):
        if a.dtype == jnp.uint8:
            return jax.lax.bitcast_convert_type(
                a.reshape(a.size // 4, 4), jnp.uint32)
        if a.dtype == jnp.uint16:
            return jax.lax.bitcast_convert_type(
                a.reshape(a.size // 2, 2), jnp.uint32)
        if a.dtype == jnp.uint32:
            return a.reshape(-1)
        return jax.lax.bitcast_convert_type(
            a.reshape(-1).astype(
                jnp.float32 if a.dtype == jnp.float32 else jnp.int32),
            jnp.uint32)

    def _packed_soa_image(self, image, key: tuple, classed: bool = False):
        """Per-image stage1a..finalize body returning the device-side
        packed SoA dict (finalize fields + per-octave counts).  Shared by
        the wire-format encoder below and by the multi-chip batched
        extractor (parallel/batch.py), which keeps the SoA on device
        instead of flattening it for the host wire."""
        cks, ks, bs, ft, bt = key
        s1 = self._stage1a_fn(image)
        exts, counts, overflows = self._stage1b_body(
            s1["dogs"], s1["cands"], cks)
        # the optimistic program runs sigma-classed windows; the window
        # violation count rides the flat buffer and is validated with
        # the bucket counts (violation -> exact max-window redo)
        oris, ori_counts, viol2 = self._stage2_body(
            s1["grads"], s1["stacks"], exts, ks, classed=classed)
        descs, angds, viol3 = self._stage3_body(
            s1["grads"], s1["stacks"], exts, oris, ks, bs, classed=classed)
        p = self._finalize_body(exts, oris, descs, angds, ks, bs, ft, bt)
        return dict(p, counts=counts, overflows=overflows,
                    ori_counts=ori_counts, cand_counts=s1["cand_counts"],
                    win_viol=viol2 + viol3)

    def _fused_packed_image(self, image, key: tuple, classed: bool = True):
        """Per-image stage1a..finalize body producing (flat u32, dev_desc)."""
        p = self._packed_soa_image(image, key, classed=classed)
        counts, overflows = p["counts"], p["overflows"]
        ori_counts = p["ori_counts"]
        dev_desc = self._dequantize_descs_dev(p["desc"])
        u = self._as_u32
        no_oct = (p["num_ori"] | (p["octave"] << 3)).astype(jnp.uint8)
        pad4 = -(-no_oct.shape[0] // 4) * 4 - no_oct.shape[0]
        if pad4:
            no_oct = jnp.pad(no_oct, (0, pad4))
        if self.config.desc_transfer == "u8p":
            desc_sections = self._pack_desc_u8p(p["desc"])
        else:
            desc_sections = [u(p["desc"])]
        if self._wire_lean:
            kp_sections = self._encode_lean_sections(p)
        else:
            kp_sections = [u(p["x"]), u(p["y"]), u(p["sigma"]),
                           u(p["ori_d"])]
        flat = jnp.concatenate([
            u(p["cand_counts"]), u(counts), u(ori_counts),
            u(overflows),
            u(jnp.stack([p["ext_total"], p["ori_total"],
                         p["win_viol"]]))]
            + kp_sections + [u(no_oct)] + desc_sections)
        return flat, dev_desc

    def _pack_desc_u8p(self, desc):
        """Device-side zero-compaction of the (BT, 128) u8 descriptor
        section: a 1-bit-per-entry zero bitmap plus the nonzero bytes
        scattered to the front of the section.  ~35% of normalised u8
        descriptor entries are zero on natural content, and the download
        direction is host-decoded, so the encode only has to be
        XLA-cheap (one cumsum + one scatter) — the decode
        (_decode_flat) restores exact u8 values, so 'u8p' is bit-lossless
        vs 'u8'."""
        flags = (desc != 0).reshape(-1)
        f32v = flags.reshape(-1, 32).astype(jnp.uint32)
        bits = jnp.sum(
            f32v << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1,
            dtype=jnp.uint32)
        idx = jnp.cumsum(flags.astype(jnp.int32)) - 1
        n = flags.shape[0]
        packed = jnp.zeros((n + 4,), jnp.uint8).at[
            jnp.where(flags, idx, n)].set(desc.reshape(-1))
        return [bits, self._as_u32(packed[:n])]

    @staticmethod
    def _timed_first(fn, label: str):
        """Wrap a jitted callable so its first invocation (= the compile,
        jit compiles synchronously at first dispatch) is recorded as a
        ``compile`` span in the host trace (POPSIFT_TPU_HOSTTRACE=1)."""
        from .tracing import HOSTTRACE, host_trace
        if not HOSTTRACE:
            return fn
        state = {"first": True}

        def wrapper(*a, **k):
            if state["first"]:
                state["first"] = False
                host_trace("compile.start", label)
                out = fn(*a, **k)
                host_trace("compile.end", label)
                # numeric kwarg only: host_trace_summary aggregates kwarg
                # series as float64 (round-3 postmortem: a string kwarg
                # here crashed PopSift.uninit and killed the bench)
                host_trace("compile_program", label, n=1)
                return out
            return fn(*a, **k)

        return wrapper

    def _get_fused_packed(self, key: tuple, classed: bool | None = None):
        """Stage1a..finalize in ONE jitted program for a known bucket
        5-tuple (cks, ks, bs, ft, bt): one dispatch, one single-array
        readback (see _flat_layout)."""
        if classed is None:
            classed = self._classes_enabled
        # locked get-or-create: two downloader threads regrowing
        # concurrently must share ONE jit callable, or each would
        # trigger its own ~90 s XLA compile at first call (jit
        # construction itself is cheap; the compile happens at dispatch)
        with self._stats_lock:
            fn = self._fused_packed.get((key, classed))
            if fn is None:
                def fused(image):
                    flat, dev_desc = self._fused_packed_image(
                        image, key, classed=classed)
                    return dict(flat=flat, dev_desc=dev_desc)

                fn = self._timed_first(jax.jit(fused),
                                       f"fused1[{classed}]{key}")
                self._fused_packed[(key, classed)] = fn
        return fn

    # batch size of the multi-image fused program (one dispatch + one
    # flat-buffer fetch per BATCH images: the dominant steady-state cost on
    # a remotely-attached TPU is the ~25 ms per-RPC round trip, so RTT is
    # paid once per batch).  One size only, to bound compile count.
    BATCH = 4

    def _get_fused_packed_batch(self, key: tuple,
                                classed: bool | None = None):
        if classed is None:
            classed = self._classes_enabled
        # locked get-or-create (see _get_fused_packed)
        with self._stats_lock:
            fn = self._fused_packed_batch.get((key, classed))
            if fn is not None:
                return fn

            def fused(*images):
                # lax.scan over the batch: the per-image body is traced
                # and compiled ONCE (an unrolled 4-image body compiled in
                # 197 s vs 67 s for the single-image program on the
                # 1-core bench host; the scan form compiles like the
                # single program).  Execution is serialised across the
                # batch — which it effectively was anyway on one chip.
                def body(_, img):
                    flat, dev_desc = self._fused_packed_image(
                        img, key, classed=classed)
                    return None, (flat, dev_desc)

                _, (flats, descs) = jax.lax.scan(
                    body, None, jnp.stack(images))
                return dict(flat=flats, dev_desc=descs)

            fn = self._timed_first(jax.jit(fused),
                                   f"fusedB[{classed}]{key}")
            self._fused_packed_batch[(key, classed)] = fn
        return fn

    def _prewarm_nonclassed(self, key: tuple) -> None:
        """Background-compile the non-classed batch program for ``key``.

        The non-classed program is the sigma-class violation insurance:
        without it, the FIRST frame whose content violates the classed
        windows stalls its whole pass on a synchronous batch-program
        compile (~140 s through the remote-compile service, observed as
        the recurring "pass 2 cliff" — the persistent XLA cache is
        largely ineffective through that service).  Compiling it in a
        daemon thread right after a key settles hides the cost behind
        steady-state frames.  TPU backend only: CPU test runs create
        many throwaway extractors and must not spawn background
        compiles."""
        if not self._classes_enabled:
            return
        try:
            if jax.default_backend() != "tpu":
                return
        except Exception:
            return
        with self._stats_lock:
            if (key in self._prewarmed
                    or (key, False) in self._fused_packed_batch):
                return
            self._prewarmed.add(key)

        def work():
            try:
                w, h = self._wh
                img = jnp.zeros((h, w), jnp.float32)
                fn = self._get_fused_packed_batch(key, classed=False)
                jax.block_until_ready(fn(*([img] * self.BATCH))["flat"])
            except Exception:
                pass  # insurance only; the synchronous path still works

        import threading
        threading.Thread(target=work, daemon=True).start()

    def has_key(self) -> bool:
        """True once a steady-state bucket key exists (the fused batch
        program can be dispatched).  Deliberately racy-but-safe: the
        dispatch thread polls this while the collect thread writes the
        key (single writer); a stale False costs one extra
        single-dispatch, a stale True one regrow round — never a wrong
        result."""
        return self._last_key5 is not None

    def extract_dispatch_batch(self, images):
        """Dispatch one fused program over up to BATCH images (async).
        Short batches are padded by repeating the last image (decode
        ignores the padding rows) — one program shape means one compile;
        a dedicated straggler program would be a whole extra XLA compile
        for at most (BATCH-1)/BATCH of one batch's device time.  Returns
        a pending handle for :meth:`extract_collect_batch`, or None when
        no bucket key exists yet or the batch is empty/oversized."""
        key = self._last_key5
        if key is None or not images or len(images) > self.BATCH:
            return None
        padded = list(images) + [images[-1]] * (self.BATCH - len(images))
        out = self._get_fused_packed_batch(key)(*padded)
        n = self.wire_prefix_words(key)
        flat = (out["flat"] if len(images) == self.BATCH
                else out["flat"][:len(images)])
        return (key, dict(
            flat=flat[:, :n] if n else flat,
            flat_full=flat if n else None,
            dev_desc=out["dev_desc"]))

    def pending_for_image(self, pending, i: int):
        """Per-image view of a batch pending handle (for per-image
        concurrent fetches by the downloader pool).  dev_desc stays as a
        lazy (batch_array, i) pair so extracting-mode collects never
        dispatch the per-image slice."""
        key, out = pending
        ff = out.get("flat_full")
        return (key, dict(flat=None,
                          flat_full=(None if ff is None else (ff, i)),
                          dev_desc=(out["dev_desc"], i)))

    def extract_collect_batch(self, images, pending, flats: np.ndarray,
                              want_dev: bool = False):
        """Decode a fetched (len(images), words) buffer into one Features
        per image (per-image validation; fused-regrow fallback per
        image)."""
        return [self.extract_collect(
            images[i], self.pending_for_image(pending, i),
            flats[i], want_dev)
            for i in range(len(images))]

    def _decode_flat(self, flat: np.ndarray, key: tuple) -> dict:
        """Numpy views into the fetched flat buffer (zero-copy)."""
        lay = self._flat_layout(key)
        FT, BT = lay["_FT"], lay["_BT"]

        def sl(name, dt):
            a, b = lay[name]
            return flat[a:b].view(dt)

        totals = sl("totals", np.int32)
        desc_dt = {"u16": np.uint16, "u8": np.uint8,
                   "u8p": np.uint8}.get(
            self.config.desc_transfer, np.float32)
        # desc is the last section and may be prefix-fetched: decode the
        # rows that arrived (the collect path validates sufficiency
        # against the actual ori_total and refetches when short)
        a, b = lay["desc"]
        nz_prefix = None
        if self.config.desc_transfer == "u8p":
            # zero-bitmap + packed nonzeros: rebuild exact u8 rows for
            # as many FULL rows as the fetched packed bytes cover
            bm = sl("desc_bitmap", np.uint8)
            flags = np.unpackbits(bm, bitorder="little")[:BT * 128]
            nzpr = flags.reshape(BT, 128).sum(axis=1).cumsum()
            packed = flat[a:min(b, flat.size)].view(np.uint8)
            rows_avail = int(np.searchsorted(nzpr, packed.size,
                                             side="right"))
            out = np.zeros(rows_avail * 128, np.uint8)
            flr = flags[:rows_avail * 128].astype(bool)
            need = int(nzpr[rows_avail - 1]) if rows_avail else 0
            out[flr] = packed[:need]
            desc = out.reshape(rows_avail, 128)
            nz_prefix = nzpr
        else:
            avail = flat[a:min(b, flat.size)].view(desc_dt)
            rows_avail = avail.size // 128
            desc = avail[:rows_avail * 128].reshape(rows_avail, 128)
        no_oct = sl("no_oct", np.uint8)[:FT]
        num_ori = (no_oct & 7).astype(np.int32)
        idx_ori = np.zeros(FT, np.int32)
        np.cumsum(num_ori[:-1], out=idx_ori[1:])
        if self._wire_lean:
            import math
            xm, ym = float(self._wh[0]), float(self._wh[1])
            xy = sl("xy", np.uint32)
            x = (xy & 0xFFFF).astype(np.float32) * (xm / 65535.0)
            y = (xy >> 16).astype(np.float32) * (ym / 65535.0)
            lo, hi = self.SIG_LO, self.SIG_HI
            sg = sl("sg", np.uint16)[:FT].astype(np.float32)
            sigma = np.exp2(lo + sg * ((hi - lo) / 65535.0)) \
                .astype(np.float32)
            oq = sl("ori_d", np.uint16)[:BT].astype(np.float32)
            ori_d = (oq * (2.0 * math.pi / 65535.0)
                     - math.pi).astype(np.float32)
        else:
            x = sl("x", np.float32)
            y = sl("y", np.float32)
            sigma = sl("sigma", np.float32)
            ori_d = sl("ori_d", np.float32)
        return dict(
            cand_counts=sl("cand_counts", np.int32),
            counts=sl("counts", np.int32),
            ori_counts=sl("ori_counts", np.int32),
            overflows=sl("overflows", np.int32),
            ext_total=totals[0], ori_total=totals[1],
            win_viol=totals[2],
            x=x, y=y, sigma=sigma, ori_d=ori_d,
            num_ori=num_ori,
            idx_ori=idx_ori,
            octave=(no_oct >> 3).astype(np.int32),
            desc=desc, nz_prefix=nz_prefix)

    def _dequantize_descs_dev(self, d):
        bound = 2.0 ** self.plan.norm_multi
        if d.dtype == jnp.uint16:
            return d.astype(jnp.float32) * (bound / 65535.0)
        if d.dtype == jnp.uint8:
            return d.astype(jnp.float32) * (bound / 255.0)
        return d

    # ------------------------------------------------------------------
    def extract_dispatch(self, image):
        """Dispatch one image without waiting (async); rides the batch
        program padded to BATCH (ONE fused program family = one compile;
        see :meth:`extract_dispatch_batch`).  Returns a pending handle for
        ``extract_collect_batch([image], pending, flats)``, or None when
        no bucket key is established yet (first image) — then the caller
        must run :meth:`extract_features` synchronously."""
        return self.extract_dispatch_batch([image])

    def extract_collect(self, image, pending, flat: np.ndarray,
                        want_dev: bool = False):
        """Validate + decode a fetched flat buffer; fused-regrow fallback
        on bucket overflow (needs ``image`` again)."""
        key, out = pending
        cks, ks, bs, ft, bt = key
        t = self._decode_flat(flat, key)
        cand_counts = t["cand_counts"]
        counts = t["counts"]
        ori_counts = t["ori_counts"]
        self._note_frame_classes(int(t["win_viol"]), key)
        ok = (all(int(c) <= cks[o] for o, c in enumerate(cand_counts))
              and all(int(c) <= ks[o] for o, c in enumerate(counts))
              and all(int(c) <= bs[o] for o, c in enumerate(ori_counts))
              and int(t["ext_total"]) <= ft
              and int(t["ori_total"]) <= bt
              and int(t["win_viol"]) == 0)
        if ok:
            need_rows = min(int(t["ori_total"]),
                            self._flat_layout(key)["_BT"])
            # want_dev never reads t['desc'] (descriptors come from
            # dev_desc), so an under-fetched desc prefix needs no
            # blocking refetch round trip in that mode
            if not want_dev and t["desc"].shape[0] < need_rows:
                # the count-adaptive prefix under-fetched the desc
                # section (count jump): one full refetch, rare by
                # construction (estimate = 1.125x recent max)
                ff = out.get("flat_full")
                if ff is None:
                    return self._extract_exact(image, want_dev)
                full = ff[0][ff[1]] if isinstance(ff, tuple) else ff
                t = self._decode_flat(np.asarray(full), key)
            self._update_buckets(cand_counts, counts, ori_counts)
            if t.get("nz_prefix") is not None and need_rows:
                self._note_nz(int(t["nz_prefix"][need_rows - 1]))
            return self._features_from_packed(t, out["dev_desc"], want_dev)
        return self._extract_regrow(image, t, key, want_dev)

    def _extract_regrow(self, image, t, failed_key, want_dev: bool,
                        depth: int = 0):
        """Bucket-overflow / window-violation recovery: rebuild the bucket
        key from the failed frame's observed counts (grown) and re-run the
        frame through the fused program at the NEW key.

        Unlike the per-stage exact path this compiles exactly ONE program
        — and it is the program the stream's steady state will keep using
        (the key is installed as _last_key5 on success).  The per-stage
        exact path compiled fresh _stage1b/_stage2/_stage3 programs for
        every new bucket tuple — minutes of XLA on a 1-core host, the
        round-2 bench's "pass-2 cliff" (BENCH_r02: 5787 ms/image).

        Counts observed downstream of an overflowed stage are lower
        bounds (the stage ran on truncated slots), so estimates are
        scaled by each upstream stage's truncation ratio; if the grown
        key still overflows, the next round doubles the headroom.  After
        ``_REGROW_MAX`` rounds the per-stage exact path remains as the
        always-correct backstop."""
        from .tracing import host_trace
        if depth >= self._REGROW_MAX:
            host_trace("exact_fallback", id(self), depth=depth)
            return self._extract_exact(image, want_dev)
        plan = self.plan
        cks0, ks0, bs0, ft0, bt0 = failed_key
        # 1.5x headroom (was 1.3): a regrow costs a full batch-program
        # compile (~85 s on a 1-core host), so one regrow should cover
        # moderately richer future regimes too — the padded slots are
        # cheap (invalid slots skip their kernel DMAs) next to a second
        # compile a few frames later
        g = 1.5 * (2.0 ** depth)

        viol_only = (int(t["win_viol"]) > 0
                     and all(int(c) <= cks0[o]
                             for o, c in enumerate(t["cand_counts"]))
                     and all(int(c) <= ks0[o]
                             for o, c in enumerate(t["counts"]))
                     and all(int(c) <= bs0[o]
                             for o, c in enumerate(t["ori_counts"])))
        if viol_only:
            # counts fit; only the sigma-classed windows were too small.
            # Re-run the SAME key with the exact (max-window, non-classed)
            # program — which is also the program the extractor switches
            # to permanently after a violation streak.
            host_trace("viol_redo", id(self))
            key, classed = failed_key, False
        else:
            host_trace("regrow", id(self), depth=depth)
            cks, ks, bs = [], [], []
            for o in range(plan.octaves):
                cand = int(t["cand_counts"][o])     # exact (stage1a runs
                ext = int(t["counts"][o])           # at full capacity)
                ori = int(t["ori_counts"][o])
                fac1 = max(1.0, cand / max(cks0[o], 1))
                ext_est = ext * fac1
                fac2 = max(1.0, ext_est / max(ks0[o], 1))
                ori_est = ori * fac1 * fac2

                def grown(est, cur, cap):
                    if est <= cur:
                        return cur
                    return min(max(bucket(int(est * g) + 1), cur), cap)

                nck = grown(cand, cks0[o], plan.cand_caps[o])
                nk = grown(ext_est, ks0[o],
                           min(plan.ext_caps[o], max(nck, 128)))
                nb = grown(ori_est, bs0[o], plan.ori_caps[o])
                cks.append(nck)
                ks.append(nk)
                bs.append(nb)
            cks, ks, bs = tuple(cks), tuple(ks), tuple(bs)
            ft = min(max(ft0, bucket(int(int(t["ext_total"]) * g) + 1)),
                     sum(ks))
            bt = min(max(bt0, bucket(int(int(t["ori_total"]) * g) + 1)),
                     sum(bs))
            key, classed = (cks, ks, bs, ft, bt), self._classes_enabled

        # the regrown key is run through the BATCH program (padded): it is
        # the program the stream's steady state needs at this key, so the
        # recovery compile is never wasted
        out = self._get_fused_packed_batch(key, classed)(
            *([image] * self.BATCH))
        flat = np.asarray(out["flat"][0])
        t2 = self._decode_flat(flat, key)
        cks, ks, bs, ft, bt = key
        ok = (all(int(c) <= cks[o]
                  for o, c in enumerate(t2["cand_counts"]))
              and all(int(c) <= ks[o] for o, c in enumerate(t2["counts"]))
              and all(int(c) <= bs[o]
                      for o, c in enumerate(t2["ori_counts"]))
              and int(t2["ext_total"]) <= ft
              and int(t2["ori_total"]) <= bt
              and (not classed or int(t2["win_viol"]) == 0))
        if not ok:
            return self._extract_regrow(image, t2, key, want_dev,
                                        depth=depth + 1)
        if not viol_only:
            # install the regrown key as the stream's steady state
            # (locked: the downloader pool can regrow concurrently, and
            # a torn buckets/key5 pair from two keys would force
            # another regrow round), and record the grown sizes as
            # shrink FLOORS — the regrow is proof the stream needs them
            with self._stats_lock:
                self._last_buckets = (cks, ks, bs)
                self._last_key5 = key
                f = self._bucket_floors
                for kind, vals in (("c", cks), ("k", ks), ("b", bs)):
                    for o, v in enumerate(vals):
                        f[(kind, o)] = max(f.get((kind, o), 0), v)
                f[("ft",)] = max(f.get(("ft",), 0), ft)
                f[("bt",)] = max(f.get(("bt",), 0), bt)
                # persist NOW: _update_buckets only saves on a key
                # CHANGE, and after this direct install it computes the
                # same key ("no change"), so without this call the
                # regrown key never reached the saved-key store and
                # every new process re-paid this frame's regrow compile
                # (the recurring "pass 2 cliff" of rounds 4-5)
                self._save_key()
            self._update_buckets(t2["cand_counts"], t2["counts"],
                                 t2["ori_counts"])
        return self._features_from_packed(t2, out["dev_desc"][0],
                                          want_dev)

    _REGROW_MAX = 3

    def _establish_and_extract(self, image, want_dev: bool = False):
        """First-frame bootstrap WITHOUT the per-stage exact path.

        One stage1a run yields the true per-octave candidate counts; a
        SEED bucket key is built from them (extrema <= candidates always;
        orientations ~1.05x extrema in practice, so candidates bound them
        in all but pathological content) and the frame runs through the
        fused program at the seed key.  Its collect installs the TIGHT
        steady-state key from the frame's true counts via _update_buckets
        — so the first frame costs exactly two compiles (stage1a + one
        seed fused program) instead of the old exact staged flow's 4
        one-off per-stage compiles whose bucket tuples the steady state
        never reused.  A wrong seed (orientation-heavy content) is caught
        by the normal count validation and fixed by one regrow round."""
        with self._init_lock:
            if self._last_key5 is None:
                saved = self._load_saved_key()
                if saved is not None:
                    # a previous process settled on a key for this
                    # (config, size): adopt it — the XLA persistent cache
                    # then serves the batch program without recompiling,
                    # and a wrong key (new content regime) is caught by
                    # count validation + fixed by one regrow round
                    self._last_buckets = saved[:3]
                    self._last_key5 = saved
                else:
                    plan = self.plan
                    s1 = self._stage1a(image)
                    cand = np.asarray(s1["cand_counts"])
                    cks = tuple(min(bucket(int(c * 1.5) + 1),
                                    plan.cand_caps[o])
                                for o, c in enumerate(cand))
                    ks = tuple(min(cks[o], plan.ext_caps[o])
                               for o in range(plan.octaves))
                    bs = tuple(min(ks[o], plan.ori_caps[o])
                               for o in range(plan.octaves))
                    seed = (cks, ks, bs, sum(ks), sum(bs))
                    out = self._get_fused_packed_batch(seed)(
                        *([image] * self.BATCH))
                    flat = np.asarray(out["flat"][0])
                    pending = (seed, dict(flat=flat, flat_full=flat,
                                          dev_desc=out["dev_desc"][0]))
                    return self.extract_collect(image, pending, flat,
                                                want_dev)
        # key established (saved key, or by another thread while we
        # waited): run through the normal fast path
        return self.extract_features(image, want_dev)

    def extract_features(self, image, want_dev: bool = False):
        """Extract and return a FeaturesHost (or FeaturesDev) directly.

        Fast path: the packed fused program — one dispatch, one compact
        single-array readback of globally-packed SoA feature arrays
        (finalisation that the reference does in prep_features + the host
        pin/download, sift_pyramid.cu:250-322, all happens on device).
        The first image bootstraps the bucket key via
        :meth:`_establish_and_extract`; bucket overflow recovers via the
        fused-regrow path."""
        pending = self.extract_dispatch_batch([image])
        if pending is not None:
            flats = np.asarray(pending[1]["flat"])
            return self.extract_collect_batch([image], pending, flats,
                                              want_dev)[0]
        return self._establish_and_extract(image, want_dev)

    def _extract_exact(self, image, want_dev: bool = False):
        from .features import assemble_features, assemble_features_dev
        # regrow already proved the optimistic buckets wrong: go straight
        # to the per-stage exact path (the optimistic fused program would
        # overflow again and waste its compile)
        result = self.extract(image, optimistic=False)
        if want_dev:
            return assemble_features_dev(result, self.plan.upscale_factor)
        return assemble_features(result, self.plan.upscale_factor)

    def _features_from_packed(self, t, dev_desc, want_dev: bool):
        from .constants import ORIENTATION_MAX_COUNT
        from .features import FeaturesDev, FeaturesHost

        n = int(t["ext_total"])
        m = int(t["ori_total"])
        num = np.asarray(t["num_ori"][:n], np.int32)
        if want_dev:
            if isinstance(dev_desc, tuple):  # lazy per-image batch slice
                dev_desc = dev_desc[0][dev_desc[1]]
            # reverse map (feat_to_ext_map analog) is derived on the host:
            # descriptor j belongs to the feature whose [idx_ori,
            # idx_ori+num) range contains it — i.e. repeat by num_ori
            rev = np.repeat(np.arange(n, dtype=np.int64), num)[:m]
            features = dict(
                xpos=np.asarray(t["x"][:n]), ypos=np.asarray(t["y"][:n]),
                sigma=np.asarray(t["sigma"][:n]), num_ori=num)
            return FeaturesDev(features, dev_desc[:m], rev)
        idx0 = np.asarray(t["idx_ori"][:n], np.int64)
        kk = np.arange(ORIENTATION_MAX_COUNT, dtype=np.int64)[None, :]
        didx = np.where(kk < num[:, None], idx0[:, None] + kk, -1)
        # orientation[4] per feature reconstructed from the per-descriptor
        # angle section (wire carries one angle per descriptor row)
        ori_d = t["ori_d"]
        orientation = np.where(
            didx >= 0,
            ori_d[np.clip(didx, 0, max(ori_d.size - 1, 0))],
            np.float32(0.0)).astype(np.float32)
        soa = dict(
            xpos=t["x"][:n], ypos=t["y"][:n], sigma=t["sigma"][:n],
            num_ori=num, orientation=orientation,
            desc_idx=didx, debug_octave=t["octave"][:n])
        return FeaturesHost(soa=soa,
                            descriptors=self._dequantize_descs(
                                t["desc"][:m]))

    # ------------------------------------------------------------------
    def extract(self, image, optimistic: bool = True) -> dict[str, Any]:
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

        guess = self._last_buckets if optimistic else None
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

        oris, ori_counts_dev = self._get_stage2(ks)(
            s1["grads"], s1["stacks"], s1["exts"])
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
        with self._stats_lock:
            self._update_buckets_locked(cand_counts, counts, ori_counts)

    # consecutive comfortably-low frames before a bucket shrinks (see
    # step below); one shrink = one batch-program recompile, so the
    # streak keeps oscillating scenes from churning compiles.  96
    # frames + the 1.6x shrink margin + the regrow floors: a shrink
    # must be backed by LONG sustained evidence and still leave room
    # for a moderately richer regime, because a wrong shrink costs a
    # full batch-program recompile when that regime returns (16-frame
    # streaks re-shrank between a bench's content regimes and regrew a
    # few dozen frames later, every run)
    _SHRINK_STREAK = 96

    def _update_buckets_locked(self, cand_counts, counts,
                               ori_counts) -> None:
        plan = self.plan
        last = self._last_buckets or ((0,) * plan.octaves,) * 3
        streaks = self._shrink_streaks

        def step(cur: int, count: int, cap: int, skey) -> int:
            count = int(count)
            # 1.5x growth headroom (was 1.3): with quarter-pow-2 bucket
            # quantisation the EFFECTIVE margin of 1.3 could collapse to
            # ~1.30 exactly (count 590 -> bucket 768), and a later frame
            # at 1.36x the settling count regrew + recompiled (~85 s);
            # padded slots are cheap, recompiles are not
            grown = int(count * 1.5) + 1
            if cur < min(128, cap):
                # raise legacy 0-sized buckets (saved keys from before
                # the 128-slot floor) to the floor once
                streaks.pop(skey, None)
                return min(max(bucket(grown), 128), cap)
            if count > cur:
                streaks.pop(skey, None)
                return min(bucket(grown), cap)
            if cur > 128 and count * 8 < cur:
                streaks.pop(skey, None)
                # keep a 128-slot floor even for currently-empty
                # octaves: a 0-sized bucket regrows (= recompiles the
                # whole batch program) the moment ONE stray candidate
                # appears there, and 128 padded slots cost ~nothing
                # (invalid slots skip their kernel DMAs)
                return min(bucket(grown) if count else 128, cap)
            # sustained-low shrink: the old rule (shrink only below
            # cur/8) let a one-off regrow spike pin a bucket at 3-4x
            # the stream's real count FOREVER — and the saved-key store
            # then perpetuated it across processes (observed in round
            # 5: a stale bt=10240 key against ori_total~2600 doubled
            # every frame's wire bytes).  If the tight bucket has been
            # <= cur/2 for _SHRINK_STREAK consecutive frames, adopt it
            # — sized by the STREAK'S MAX count, not the current frame,
            # so the shrunk bucket still fits the stream's recent
            # high-water mark (shrinking to one low frame's count made
            # the very next above-average frame regrow + recompile).
            tight = bucket(grown)
            floor = self._bucket_floors.get(skey, 0)
            if cur > max(128, floor) and tight * 2 <= cur:
                smax, s = streaks.get(skey, (0, 0))
                smax, s = max(smax, count), s + 1
                if s >= self._SHRINK_STREAK:
                    streaks.pop(skey, None)
                    return min(max(bucket(int(smax * 1.6) + 1), 128,
                                   floor), cap)
                streaks[skey] = (smax, s)
            else:
                streaks.pop(skey, None)
            return cur

        cks = tuple(step(last[0][o], c, plan.cand_caps[o], ("c", o))
                    for o, c in enumerate(cand_counts))

        def ext_buf(o):
            if cks[o] == 0:
                return plan.ext_caps[o]
            return min(plan.ext_caps[o], max(cks[o], 128))

        ks = tuple(min(step(last[1][o], c, plan.ext_caps[o], ("k", o)),
                       ext_buf(o))
                   for o, c in enumerate(counts))
        bs = tuple(step(last[2][o], c, plan.ori_caps[o], ("b", o))
                   for o, c in enumerate(ori_counts))
        self._last_buckets = (cks, ks, bs)

        # total-count buckets for the packed finalize stage
        ext_total = sum(min(int(c), ks[o]) for o, c in enumerate(counts))
        ori_total = sum(min(int(c), bs[o])
                        for o, c in enumerate(ori_counts))
        self._note_ori_total(ori_total)
        lf, lb = ((self._last_key5[3], self._last_key5[4])
                  if self._last_key5 else (0, 0))
        ft = min(step(lf, ext_total, sum(plan.ext_caps), ("ft",)),
                 sum(ks))
        bt = min(step(lb, ori_total, sum(plan.ori_caps), ("bt",)),
                 sum(bs))
        prev = self._last_key5
        self._last_key5 = (cks, ks, bs, ft, bt)
        if self._last_key5 != prev:
            self._save_key()
        self._prewarm_nonclassed(self._last_key5)

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
                desc=self._dequantize_descs(host["descs"][o]),
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
