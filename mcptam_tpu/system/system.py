"""Standalone System: tracker + map maker in one process.

The `mcptam` binary analogue (src/System.cc:169-303): owns the camera
models, MapState, Tracker and MapMaker, and runs the per-frame loop
grab -> track -> (maybe add MKF) -> map-maker tick -> publish.  The ROS
surface (topics/services) becomes plain Python: `process_frame` returns a
FrameInfo; timing matches the reference's TrackerTiming/SystemInfo
messages (system/timing.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.config import (
    TrackerConfig, MapMakerConfig, DEFAULT_TRACKER, DEFAULT_MAPMAKER,
    MAX_POINTS, MAX_MKFS, MAX_MEAS,
)
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel
from mcptam_tpu.map.state import create_map_state, count_points, count_mkfs
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.map.mapmaker_core import need_new_mkf
from mcptam_tpu.tracker.tracker import (
    track_frame, create_tracker_state, apply_tracker_point_stats,
    QUALITY_GOOD,
)
from mcptam_tpu.tracker.reloc import attempt_recovery
from mcptam_tpu.system.mapmaker import MapMaker, MM_INITIALIZING, MM_RUNNING
from mcptam_tpu.system.timing import TrackerTiming, SystemInfo, Stopwatch


def publish_pose_cov(pose34: np.ndarray, cov: np.ndarray,
                     quality: int) -> np.ndarray:
    """The published pose covariance (ref PublishPose,
    src/SystemFrontendBase.cc:160-197): cross-correlation cleared, both
    3x3 blocks rotated from the base frame into the world frame, then
    inflated by tracking grade — x1e2 GOOD, x1e5 DODGY, x1e8 BAD."""
    R = np.asarray(pose34[:, :3]).T       # world_from_base rotation
    c = np.array(cov, dtype=np.float64)
    c[:3, 3:] = 0.0
    c[3:, :3] = 0.0
    c[:3, :3] = R @ c[:3, :3] @ R.T
    c[3:, 3:] = R @ c[3:, 3:] @ R.T
    scale = (1e2, 1e5, 1e8)[int(quality)]  # GOOD, DODGY, BAD
    return c * scale


@dataclass
class FrameInfo:
    pose: np.ndarray          # (3,4) base_from_world
    cov: np.ndarray           # (6,6) world-frame, quality-inflated (see
                              # publish_pose_cov); raw H^-1 in cov_raw
    cov_raw: np.ndarray       # (6,6) tracker H^-1 in the base frame
    quality: int
    lost: bool
    relocalized: bool
    n_points: int
    n_mkfs: int
    n_found: int
    mm_state: int
    timing: TrackerTiming
    added_mkf: bool
    frame_id: int = -1        # which frame this info describes (lags the
                              # latest dispatched frame by pipeline_depth)
    provisional: bool = False  # pipeline still priming: this frame will be
                               # published again when its slot drains
    # when a process_frame call drains a batch queued by process_frames,
    # the batch's OLDER frames ride here on the returned (newest) info so
    # no FrameInfo is ever parked indefinitely or delivered out of order
    siblings: list = None


class System:
    """Standalone multi-camera SLAM pipeline."""

    def __init__(self, cams: CameraModel, cam_from_base: SE3,
                 cams_sbi: CameraModel, H: int, W: int,
                 tcfg: TrackerConfig = DEFAULT_TRACKER,
                 mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                 max_points: int = MAX_POINTS, max_mkfs: int = MAX_MKFS,
                 max_meas: int = MAX_MEAS, mapmaker=None, masks=None,
                 pipeline_depth: int = 0):
        self.cams = cams
        self.cam_from_base = cam_from_base
        self.cams_sbi = cams_sbi
        self.H, self.W = H, W
        self.n_cams = int(cam_from_base.t.shape[0])
        self.tcfg = tcfg
        self.mcfg = mcfg

        self.ms = create_map_state(
            H, W, self.n_cams, cam_from_base, max_points, max_mkfs, max_meas
        )
        self.ts = create_tracker_state(self.n_cams)
        self.mapmaker = mapmaker or MapMaker(cams=cams, mcfg=mcfg)
        self.initialized = False
        self.frame_count = 0
        self._t_last = None
        self.done = False            # "quit"/"exit" command latch
        self._force_add_next = False  # ManualAddMKF request
        self._kf_view = 0            # KeyFrameViewer index

        # runtime-mutable variables (the reference's GVars3 GUI variables,
        # src/System.cc:114-131); set_var re-jits where the flag is baked in
        self.vars = {
            "DrawLevel": 0,
            "GlareMasking": False,
            "AddingMKFs": True,
            "CrossCamera": mcfg.cross_camera,
            "LevelZeroPoints": mcfg.level_zero_points,
        }

        # jit the per-frame kernels once; static feature-exclusion masks
        # (ref SystemBase mask loading, src/SystemBase.cc:218-248) are
        # baked into the features kernel
        self._static_masks = None if masks is None else jnp.asarray(masks, bool)
        self._build_feats_fn()
        # one fused device step per frame: track + point stats + add-MKF
        # heuristic — a single dispatch and a single host sync per frame
        # instead of one per stage (the tunnel round-trip is the cost).
        # ts/ms are DONATED: the step's carried state aliases in place, so
        # the untouched bulk of MapState (keyframe image atlases, ~100 MB
        # at capacity) is neither copied on device nor re-registered with
        # the runtime every frame.  (On CPU donation is ignored — tests
        # keep value semantics.)
        self._step_fn = jax.jit(self._device_step, donate_argnums=(0, 1))
        # static-capacity queued-MKF pose slots for the add heuristic;
        # the all-empty constant is cached so the common (empty-queue)
        # frame uploads nothing
        self._qcap = 2
        self._empty_queue_poses = (
            jnp.broadcast_to(jnp.eye(3), (self._qcap, 3, 3)),
            jnp.zeros((self._qcap, 3)),
            jnp.ones((self._qcap,)),
            jnp.zeros((self._qcap,), bool),
        )
        self._last_result = None
        from mcptam_tpu.ops.minipatch import filter_frame_candidates
        self._cand_filter_fn = jax.jit(filter_frame_candidates)
        self._prev_feats = None
        # pipelined publish: keep up to pipeline_depth frames in flight so
        # the per-frame scalar fetch (one tunnel round-trip on a remote
        # TPU, ~25 ms) overlaps later frames' dispatch instead of blocking
        # each frame.  Control actions (reloc, add-MKF, resets) run when a
        # frame DRAINS, i.e. pipeline_depth frames late — the same kind of
        # bounded lag the reference tolerates from its asynchronous
        # map-maker thread.  Depth 0 = fully synchronous (default).
        self.pipeline_depth = int(pipeline_depth)
        from collections import deque
        self._inflight = deque()
        self._extra_drained = []   # batch infos drained via process_frame
        # frames dispatched BEFORE the last successful relocalization:
        # their lost flags predate the fix, so draining them must not
        # re-fire reloc (stale-lost suppression; one reloc per loss)
        self._reloc_done_fid = -1
        # batched-throughput mode (process_frames): jitted scan-over-frames
        # programs keyed by (batch size, glare flag)
        self._batch_fns = {}
        self._reloc_fn = jax.jit(
            lambda ms, feats, cam_active: attempt_recovery(
                ms, self.cams_sbi, feats, cam_active=cam_active
            )
        )

    # ------------------------------------------------------------------
    def _device_step(self, ts, ms, feats, cam_active, queue_poses):
        """Fused per-frame device program: track, fold point stats (gated
        on not-lost), evaluate the add-MKF heuristic.  Also emits every
        scalar the host consumes this frame (control flow + FrameInfo +
        map counters) so process_frame needs exactly ONE device_get.

        queue_poses: (qR (Q,3,3), qt (Q,3), qdepth (Q,), qvalid (Q,)) —
        MKFs still in the map-maker queue; the add heuristic measures
        distance to them too (MapMakerClientBase::NeedNewMultiKeyFrame,
        src/MapMakerClientBase.cc:111-152)."""
        from mcptam_tpu.map.state import pose_depth_distance
        ts2, res = track_frame(
            ts, ms, self.cams, self.cams_sbi, feats, self.tcfg,
            cam_active=cam_active,
        )
        ms2 = apply_tracker_point_stats(
            ms, res, self.mcfg.min_outliers, self.mcfg.outlier_multiplier,
            enable=~res.lost,
        )
        mean_depth = jnp.mean(res.mean_depth)
        qR, qt, qdepth, qvalid = queue_poses
        dq = pose_depth_distance(res.pose, mean_depth, SE3(R=qR, t=qt), qdepth)
        queue_dist = jnp.min(jnp.where(qvalid, dq, jnp.inf))
        add, _ = need_new_mkf(ms2, res.pose, mean_depth, self.mcfg,
                              queue_dist=queue_dist)
        add = add & (res.quality == QUALITY_GOOD) & ~res.lost
        # ONE packed f32 vector: fetching a tuple of small arrays costs one
        # tunnel round-trip PER ARRAY on a remote TPU (measured ~0.5 s each
        # on the axon tunnel); one 54-float array is a single transfer
        f32 = jnp.float32
        scalars = jnp.concatenate([
            jnp.stack([
                res.lost.astype(f32), res.quality.astype(f32),
                add.astype(f32), res.tot_found.astype(f32),
                count_points(ms2).astype(f32), count_mkfs(ms2).astype(f32),
            ]),
            res.pose.R.reshape(-1), res.pose.t, res.cov.reshape(-1),
        ])
        return ts2, ms2, res, scalars

    def _build_feats_fn(self):
        masks = self._static_masks
        glare = bool(self.vars["GlareMasking"])
        self._feats_fn = jax.jit(
            lambda images: make_frame_features(
                images, static_masks=masks, glare_masking=glare
            )
        )

    def set_var(self, name: str, value):
        """Runtime-mutable variable (GVars3 analogue, src/System.cc:114-131).

        DrawLevel: small-image pyramid level; GlareMasking: re-jits the
        feature kernel; AddingMKFs: gates keyframe creation; CrossCamera /
        LevelZeroPoints: epipolar point-creation policy for future MKFs."""
        if name not in self.vars:
            raise KeyError(f"unknown var {name!r}; have {sorted(self.vars)}")
        self.vars[name] = value
        if name == "GlareMasking":
            self._build_feats_fn()
        elif name in ("CrossCamera", "LevelZeroPoints"):
            import dataclasses
            self.mcfg = dataclasses.replace(
                self.mcfg,
                cross_camera=bool(self.vars["CrossCamera"]),
                level_zero_points=bool(self.vars["LevelZeroPoints"]),
            )
            self.mapmaker.mcfg = self.mcfg

    def get_var(self, name: str):
        return self.vars[name]

    def small_image(self, level: int | None = None):
        """Tiled monitor image of the last processed frame with found
        measurements (ref PublishSmallImage, SystemFrontendBase.cc:280-346).
        Returns (H,W,3) uint8 or None before the first frame."""
        if self._prev_feats is None:
            return None
        from mcptam_tpu.system.viewer import frame_small_image
        return frame_small_image(
            self._prev_feats, self._last_result,
            self.vars["DrawLevel"] if level is None else level,
        )

    def reset(self, keep_pose: bool = False):
        """Full system reset (ref Reset service, srv/Reset.srv).

        In-flight pipelined frames are DROPPED, not drained: their
        tracking state refers to the map being destroyed, so acting on
        them (reloc, adds) would mutate the fresh map with stale data.
        The drop is counted and reported via ``last_reset_dropped``."""
        dropped = self._inflight_frames() + len(self._extra_drained)
        if dropped:
            import sys as _sys
            print(f"[mcptam] reset: dropping {dropped} in-flight "
                  f"frame(s)", file=_sys.stderr)
        self.last_reset_dropped = dropped
        pose = self.ts.pose if keep_pose else SE3.identity()
        self.ms = create_map_state(
            self.H, self.W, self.n_cams, self.cam_from_base,
            self.ms.points.capacity, self.ms.mkfs.capacity,
            self.ms.meas.capacity,
        )
        self.ts = create_tracker_state(self.n_cams)
        self.ts = self.ts.replace(pose=pose)
        self.mapmaker.reset(self.ms)
        self.initialized = False
        self._inflight.clear()
        self._extra_drained = []
        self._reloc_done_fid = -1

    def process_frame(self, images, cam_active=None) -> FrameInfo:
        """images: (C,H,W) array-like uint8/float.

        cam_active: optional (C,) bool — which cameras delivered this frame
        (sensor dropout is tolerated structurally, as in the reference:
        frames may contain any camera subset, src/Tracker.cc:286-316)."""
        sw = Stopwatch()
        timing = TrackerTiming()
        images = jnp.asarray(images, jnp.float32)
        cam_active = (
            jnp.ones((self.n_cams,), bool) if cam_active is None
            else jnp.asarray(cam_active, bool)
        )
        feats = self._feats_fn(images)
        timing.kf_downsample = sw.lap()

        if not self.initialized:
            # request-init semantics: first frame bootstraps the map; init
            # FAILS when too few points triangulate (< mm_min_map_points,
            # ref src/MapMakerServerBase.cc:146-261) and retries next frame
            self.ms, ok = self.mapmaker.init(self.ms, feats, self.ts.pose)
            if ok:
                self.initialized = True
                self.mapmaker.on_map_changed()

        qposes = self._queue_poses()
        self.ts, self.ms, res, scalars = self._step_fn(
            self.ts, self.ms, feats, cam_active, qposes
        )
        # start the device->host transfer now; it overlaps everything the
        # host and device do until this frame drains from the pipeline
        scalars.copy_to_host_async()
        self._inflight.append(("f", self.frame_count, scalars, feats, res,
                               cam_active))
        self.frame_count += 1

        added_any = False
        if self._inflight_frames() > self.pipeline_depth:
            entry = self._inflight.popleft()
            if entry[0] == "f":
                _, fid, sc, pfeats, pres, pcam = entry
                info = self._drain_frame(fid, sc, pfeats, pres, pcam,
                                         timing, sw, do_actions=True)
            else:
                # a batch queued by process_frames drains here: act on all
                # its frames, return the newest with the older ones
                # attached as .siblings (in order) so the caller's info
                # stream stays complete
                infos = self._drain_batch(entry, do_actions=True)
                info = infos[-1]
                info.siblings = infos[:-1]
                added_any = any(i.added_mkf for i in infos)
        else:
            # pipeline priming: publish the newest frame without running
            # control actions (it runs them when it drains)
            _, fid, sc, pfeats, pres, pcam = self._inflight[-1]
            info = self._drain_frame(fid, sc, pfeats, pres, pcam,
                                     timing, sw, do_actions=False)
            info.provisional = True

        # map-maker tick(s) — the background thread's slice of this frame
        # (duty_budget_ms > 0 lets BA free-run within the budget, like the
        # reference's dedicated map-maker thread)
        budget = self.mcfg.duty_budget_ms
        self.ms = self.mapmaker.step(
            self.ms, budget_s=budget * 1e-3 if budget > 0 else None
        )
        if info.added_mkf or added_any:
            self.mapmaker.on_map_changed()
        # repeated BA failure -> full reset with pose carry-over
        # (ref RequestResetInternal -> reset service, srv/Reset.srv); dump
        # the failed map first (ref fail_map.dat, src/MapMakerBase.cc:143-148)
        if self.mapmaker.reset_requested:
            if self.mcfg.fail_dump_path:
                from mcptam_tpu.system.mapio import dump_map_ascii
                dump_map_ascii(self.mcfg.fail_dump_path, self.ms)
            self.reset(keep_pose=True)
        timing.depth = sw.lap()
        timing.total = (
            timing.kf_downsample + timing.fine + timing.add + timing.depth
        )
        info.timing = timing
        info.mm_state = self.mapmaker.state
        return info

    def _queue_poses(self):
        """Stage queued-MKF poses/depths into the static distance slots
        (device-side tree ops, no host sync); the cached all-empty
        constant uploads nothing on the common empty-queue frame."""
        qposes = self._empty_queue_poses
        if self.mapmaker.queue_size() > 0:
            qR, qt, qd, qv = (list(x) for x in qposes)
            for i, (_, qpose, qres, _) in enumerate(
                self.mapmaker.queue[: self._qcap]
            ):
                qR[i], qt[i] = qpose.R, qpose.t
                qd[i] = (jnp.mean(qres.mean_depth)
                         if qres is not None else jnp.asarray(1.0))
                qv[i] = jnp.ones((), bool)
            qposes = (jnp.stack(qR), jnp.stack(qt),
                      jnp.stack(qd), jnp.stack(qv))
        return qposes

    def _newer_frame_recovered(self) -> bool:
        """True when any newer in-flight frame whose packed scalars have
        ALREADY landed reports not-lost.  A draining frame's lost flag is
        pipeline_depth frames stale; relocalizing on it would overwrite a
        pose the tracker has since recovered on its own (lost_count
        decrements on good frames, ref src/Tracker.cc:509-515).  Only
        landed transfers are inspected — this never blocks the pipeline."""
        for e in self._inflight:
            sc = e[2]
            ready = sc.is_ready() if hasattr(sc, "is_ready") else True
            if ready:
                lost = np.asarray(sc)[..., 0]
                if bool(np.any(lost < 0.5)):
                    return True
        return False

    def _drain_frame(self, fid, scalars, feats, res, cam_active,
                     timing, sw, do_actions: bool) -> FrameInfo:
        """Unpack one frame's packed scalars (a single device->host
        transfer, usually already complete) and, when the frame drains for
        real, run the host-side control actions it implies: relocalization,
        the add-MKF decision, bookkeeping."""
        v = np.asarray(scalars)
        lost = bool(v[0]); quality = int(v[1]); add_flag = bool(v[2])
        tot_found = int(v[3]); n_pts = int(v[4]); n_mkfs = int(v[5])
        pose_R = v[6:15].reshape(3, 3)
        pose_t = v[15:18]
        cov = v[18:54].reshape(6, 6)
        timing.fine = sw.lap()

        relocalized = False
        added = False
        if do_actions:
            if (lost and fid >= self._reloc_done_fid
                    and not self._newer_frame_recovered()):
                pose, ok, score = self._reloc_fn(self.ms, feats, cam_active)
                if bool(ok):
                    self.ts = self.ts.replace(
                        pose=pose, vel=jnp.zeros(6),
                        lost_count=jnp.zeros((), jnp.int32),
                    )
                    relocalized = True
                    # every frame still in flight predates this fix —
                    # draining their stale lost flags must not reloc again
                    self._reloc_done_fid = self.frame_count

            # MKF-add heuristics (ref src/Tracker.cc:468-488): good
            # quality, far enough from the nearest keyframe — quality /
            # lost / distance already folded into add_flag on device.  A
            # ManualAddMKF request persists until an MKF is actually added
            # (ref mbAddNext, src/Tracker.cc:470-487).  The reference
            # rejects adds only when the map-maker queue holds MORE than 2
            # MKFs (MapMakerClientBase::NeedNewMultiKeyFrame,
            # src/MapMakerClientBase.cc:113); with 1-2 queued, the add
            # decision stands but the heuristic has measured distance to
            # the queued poses too (queue_dist in _device_step).
            force_add = self._force_add_next and not lost
            if (
                (self.vars["AddingMKFs"] and add_flag or force_add)
                and self.mapmaker.queue_size() <= 2
            ):
                self._force_add_next = False
                # temporal candidate stability pruning before the frame
                # becomes a keyframe (ref MakeKeyFrame_Rest's MiniPatch
                # round-trip test, src/KeyFrame.cc:456-529)
                mk_feats = feats
                if self._prev_feats is not None:
                    mk_feats = self._cand_filter_fn(self._prev_feats, feats)
                self.mapmaker.add_mkf(
                    mk_feats, res.pose, res, cam_active=cam_active
                )
                added = True
            self._prev_feats = feats
            self._last_result = res
        timing.add = sw.lap()
        timing.map_num_points = n_pts
        timing.map_num_mkfs = n_mkfs

        pose34 = np.concatenate([pose_R, pose_t[:, None]], axis=1)
        return FrameInfo(
            pose=pose34,
            cov=publish_pose_cov(pose34, cov, quality),
            cov_raw=cov,
            quality=quality,
            lost=lost,
            relocalized=relocalized,
            n_points=n_pts,
            n_mkfs=n_mkfs,
            n_found=tot_found,
            mm_state=self.mapmaker.state,
            timing=timing,
            added_mkf=added,
            frame_id=fid,
        )

    def flush_pipeline(self):
        """Drain every in-flight frame (end of stream / before reset),
        returning their FrameInfos in order.  Keyframes added by the
        flushed frames are integrated before returning — the synchronous
        path integrates adds via the per-frame map-maker tick, and a map
        saved right after the flush must not be missing its last MKF."""
        out = list(self._extra_drained)
        self._extra_drained = []
        while self._inflight:
            entry = self._inflight.popleft()
            if entry[0] == "f":
                _, fid, sc, pfeats, pres, pcam = entry
                out.append(self._drain_frame(
                    fid, sc, pfeats, pres, pcam, TrackerTiming(),
                    Stopwatch(), do_actions=True))
            else:
                out.extend(self._drain_batch(entry, do_actions=True))
        if any(i.added_mkf for i in out):
            self.mapmaker.on_map_changed()
        while self.mapmaker.queue:
            self.ms = self.mapmaker.step(self.ms)
        return out

    def _inflight_frames(self) -> int:
        return sum(e[3].shape[0] if e[0] == "b" else 1
                   for e in self._inflight)

    # -- batched throughput mode -------------------------------------------
    def _get_batch_fn(self, B: int):
        from mcptam_tpu.map.keyframe import make_frame_features
        key = (B, bool(self.vars["GlareMasking"]))
        fn = self._batch_fns.get(key)
        if fn is None:
            masks = self._static_masks
            glare = bool(self.vars["GlareMasking"])

            def batch_step(ts, ms, images_b, cam_active, queue_poses):
                def body(carry, images):
                    ts, ms = carry
                    feats = make_frame_features(
                        images.astype(jnp.float32), static_masks=masks,
                        glare_masking=glare,
                    )
                    ts2, ms2, res, scalars = self._device_step(
                        ts, ms, feats, cam_active, queue_poses
                    )
                    return (ts2, ms2), (scalars, res)

                (ts2, ms2), (scal, res_b) = jax.lax.scan(
                    body, (ts, ms), images_b)
                # res_b: per-frame TrackResult stacked on a leading B axis
                # (small: K-row selection tables), kept on device so a
                # batched keyframe add carries the SAME tracker
                # measurements and exact pose as the synchronous path
                return ts2, ms2, scal, res_b

            fn = jax.jit(batch_step, donate_argnums=(0, 1))
            self._batch_fns[key] = fn
        return fn

    def process_frames(self, images_batch, cam_active=None) -> list:
        """Throughput mode: track B consecutive frames in ONE device
        dispatch (``lax.scan`` over the frame axis inside jit), with the
        same per-frame tracking semantics as :meth:`process_frame`.

        Host dispatch overhead — two jitted calls with a ~150-leaf pytree
        per frame, the throughput floor once transfers are pipelined — is
        amortized /B, which is what lets a tunneled single-host deployment
        approach the device-bound frame rate.  The cost is control-action
        granularity: relocalization and keyframe adds are evaluated when a
        batch drains (features recomputed for the acting frame; adds carry
        no per-point tracker measurements — the refind sweep recovers
        them, like the reference's ReFindNewlyMade).  Latency rises by
        pipeline_depth + B frames; FrameInfos report their frame_id.

        Returns a list of drained FrameInfos (possibly empty while the
        pipeline primes)."""
        images_batch = jnp.asarray(images_batch)
        B = int(images_batch.shape[0])
        if not self.initialized:
            return [self.process_frame(images_batch[i], cam_active)
                    for i in range(B)]
        cam_active = (
            jnp.ones((self.n_cams,), bool) if cam_active is None
            else jnp.asarray(cam_active, bool)
        )
        qposes = self._queue_poses()
        fn = self._get_batch_fn(B)
        self.ts, self.ms, scal, res_b = fn(
            self.ts, self.ms, images_batch, cam_active, qposes
        )
        scal.copy_to_host_async()
        self._inflight.append(("b", self.frame_count, scal, images_batch,
                               cam_active, res_b))
        self.frame_count += B

        # frames a process_frame call drained from a batch entry surface
        # here, keeping the caller's FrameInfo stream ordered
        out = list(self._extra_drained)
        self._extra_drained = []
        while self._inflight and self._inflight_frames() > self.pipeline_depth:
            entry = self._inflight.popleft()
            if entry[0] == "f":
                _, fid, sc, pfeats, pres, pcam = entry
                out.append(self._drain_frame(
                    fid, sc, pfeats, pres, pcam, TrackerTiming(),
                    Stopwatch(), do_actions=True))
            else:
                out.extend(self._drain_batch(entry, do_actions=True))

        # map-maker tick — one slice per batch (or every tick_every-th
        # batch: on a single chip BA chunks serialize with tracking, so
        # the tick rate is the throughput/convergence-latency dial; the
        # reference's dedicated map-maker thread has no such coupling)
        self._batch_count = getattr(self, "_batch_count", 0) + 1
        if self._batch_count % max(int(getattr(self, "tick_every", 1)), 1) \
                == 0:
            budget = self.mcfg.duty_budget_ms
            self.ms = self.mapmaker.step(
                self.ms, budget_s=budget * 1e-3 if budget > 0 else None
            )
        if any(i.added_mkf for i in out):
            self.mapmaker.on_map_changed()
        if self.mapmaker.reset_requested:
            if self.mcfg.fail_dump_path:
                from mcptam_tpu.system.mapio import dump_map_ascii
                dump_map_ascii(self.mcfg.fail_dump_path, self.ms)
            self.reset(keep_pose=True)
        return out

    def _drain_batch(self, entry, do_actions: bool) -> list:
        """Unpack one drained batch into FrameInfos and run control
        actions for it: relocalization if the newest frame is lost, at
        most one keyframe add (features recomputed on demand; pose and
        tracker measurements come from the acting frame's on-device
        TrackResult, same as the synchronous path)."""
        _, fid0, scal, images_b, pcam, res_b = entry
        v = np.asarray(scal)                      # (B, 54)
        infos = []
        for j in range(v.shape[0]):
            r = v[j]
            pose34 = np.concatenate(
                [r[6:15].reshape(3, 3), r[15:18][:, None]], axis=1
            )
            cov = r[18:54].reshape(6, 6)
            infos.append(FrameInfo(
                pose=pose34,
                cov=publish_pose_cov(pose34, cov, int(r[1])),
                cov_raw=cov,
                quality=int(r[1]),
                lost=bool(r[0]),
                relocalized=False,
                n_points=int(r[4]),
                n_mkfs=int(r[5]),
                n_found=int(r[3]),
                mm_state=self.mapmaker.state,
                timing=TrackerTiming(map_num_points=int(r[4]),
                                     map_num_mkfs=int(r[5])),
                added_mkf=False,
                frame_id=fid0 + j,
            ))
        if not do_actions:
            return infos

        last = infos[-1]
        if (last.lost and last.frame_id >= self._reloc_done_fid
                and not self._newer_frame_recovered()):
            feats = self._feats_fn(jnp.asarray(images_b[-1], jnp.float32))
            pose, ok, _ = self._reloc_fn(self.ms, feats, pcam)
            if bool(ok):
                self.ts = self.ts.replace(
                    pose=pose, vel=jnp.zeros(6),
                    lost_count=jnp.zeros((), jnp.int32),
                )
                last.relocalized = True
                self._reloc_done_fid = self.frame_count

        # at most one add per batch: the newest qualifying frame
        force_add = self._force_add_next and not last.lost
        want = [j for j, i in enumerate(infos)
                if bool(v[j][2]) and not i.lost]
        if (
            (self.vars["AddingMKFs"] and want or force_add)
            and self.mapmaker.queue_size() <= 2
        ):
            j = want[-1] if want else len(infos) - 1
            self._force_add_next = False
            feats = self._feats_fn(
                jnp.asarray(images_b[j], jnp.float32)
            )
            info = infos[j]
            res_j = self._slice_res(res_b, j)
            self.mapmaker.add_mkf(feats, res_j.pose, res_j,
                                  cam_active=pcam)
            info.added_mkf = True
        return infos

    def _slice_res(self, res_b, j: int):
        """Frame j's TrackResult from the batch's stacked results — one
        jitted gather (eager per-leaf slicing costs a tunnel dispatch per
        leaf on a remote TPU)."""
        if not hasattr(self, "_slice_res_fn"):
            self._slice_res_fn = jax.jit(
                lambda r, j: jax.tree_util.tree_map(lambda a: a[j], r))
        return self._slice_res_fn(res_b, jnp.asarray(j, jnp.int32))

    @property
    def pose(self) -> SE3:
        return self.ts.pose

    # -- staged profiling (TrackerTiming taxonomy) --------------------------
    def profile_frame(self, images, cam_active=None) -> TrackerTiming:
        """Process one frame with one device dispatch PER TRACKER STAGE,
        filling the full TrackerTiming taxonomy the reference publishes
        every frame (msg/TrackerTiming.msg, src/Tracker.cc:293-332):
        sbi, motion, pvs, coarse, fine, pose, depth (scene depth + quality
        + state update), add.  The fused production step cannot attribute
        time to stages (it is one program); this mode trades throughput
        for attribution.  Mutates tracker/map state exactly like
        process_frame's device step (same stage functions, same order) but
        skips the map-maker tick — pair with process_frame for end-to-end
        numbers."""
        from mcptam_tpu.tracker import tracker as T
        if not hasattr(self, "_staged_fns"):
            tcfg, cams, cams_sbi = self.tcfg, self.cams, self.cams_sbi
            self._staged_fns = {
                "sbi": jax.jit(lambda ts, feats, cfb, ca: T._stage_sbi(
                    ts, feats, cams_sbi, cfb, tcfg, ca)),
                "motion": jax.jit(T._stage_motion),
                "pvs": jax.jit(lambda ms, pp, ca: T._stage_pvs(
                    ms, cams, pp, ca)),
                "coarse": jax.jit(lambda ms, feats, pvs, pp: T._stage_coarse(
                    None, ms, cams, feats, pvs, pp, tcfg)),
                "fine": jax.jit(lambda ms, feats, pvs, pac, dc: T._stage_fine(
                    ms, cams, feats, pvs, pac, dc, tcfg)),
                "pose": jax.jit(lambda ms, pac, fine: T._stage_pose(
                    ms, cams, pac, fine, tcfg)),
                "depth": jax.jit(
                    lambda ts, ms, feats, pn, cov, fine, outl, rot, ca:
                    T._stage_finalize(ts, ms, feats, pn, cov, fine, outl,
                                      rot, tcfg, ca)),
                "add": jax.jit(
                    lambda ms, res: (
                        apply_tracker_point_stats(
                            ms, res, self.mcfg.min_outliers,
                            self.mcfg.outlier_multiplier, enable=~res.lost,
                        ),
                        need_new_mkf(ms, res.pose,
                                     jnp.mean(res.mean_depth), self.mcfg)[0],
                    )),
            }
        fns = self._staged_fns
        timing = TrackerTiming()
        sw = Stopwatch()
        images = jnp.asarray(images, jnp.float32)
        cam_active = (
            jnp.ones((self.n_cams,), bool) if cam_active is None
            else jnp.asarray(cam_active, bool)
        )
        feats = jax.block_until_ready(self._feats_fn(images))
        timing.kf_downsample = sw.lap()
        sbi_rot, have_rot = jax.block_until_ready(
            fns["sbi"](self.ts, feats, self.ms.cam_from_base, cam_active)
        )
        timing.sbi = sw.lap()
        pose_pred = jax.block_until_ready(
            fns["motion"](self.ts, sbi_rot, have_rot)
        )
        timing.motion = sw.lap()
        pvs = jax.block_until_ready(
            fns["pvs"](self.ms, pose_pred, cam_active)
        )
        timing.pvs = sw.lap()
        pac, do_coarse = jax.block_until_ready(
            fns["coarse"](self.ms, feats, pvs, pose_pred)
        )
        timing.coarse = sw.lap()
        fine = jax.block_until_ready(
            fns["fine"](self.ms, feats, pvs, pac, do_coarse)
        )
        timing.fine = sw.lap()
        pose_new, cov, outlier = jax.block_until_ready(
            fns["pose"](self.ms, pac, fine)
        )
        timing.pose = sw.lap()
        self.ts, res = jax.block_until_ready(
            fns["depth"](self.ts, self.ms, feats, pose_new, cov, fine,
                         outlier, sbi_rot, cam_active)
        )
        timing.depth = sw.lap()
        self.ms, _add = jax.block_until_ready(fns["add"](self.ms, res))
        timing.add = sw.lap()
        timing.total = (
            timing.kf_downsample + timing.sbi + timing.motion + timing.pvs
            + timing.coarse + timing.fine + timing.pose + timing.depth
            + timing.add
        )
        self._prev_feats = feats
        self._last_result = res
        self.frame_count += 1
        return timing

    # -- checkpoint / resume (the loader the reference lacks; SURVEY §5) ----
    def save(self, path: str):
        """Checkpoint the full session: map + tracker pose + scheduler
        state.  The reference only write-dumps maps (map.dat,
        src/MapMakerBase.cc:475-579) and cannot reload them."""
        from mcptam_tpu.system.mapio import save_map
        save_map(path, self.ms, extras={
            "pose_R": np.asarray(self.ts.pose.R),
            "pose_t": np.asarray(self.ts.pose.t),
            "mm_state": np.int32(self.mapmaker.state),
            "initialized": np.bool_(self.initialized),
        })

    def load(self, path: str):
        """Resume a checkpointed session: restores the map, re-seats the
        tracker at the saved pose, and resumes the map-maker schedule.
        Capacities must match the running System."""
        from mcptam_tpu.system.mapio import load_map
        ms, extras = load_map(path, self.ms, with_extras=True)
        self.ms = ms
        self.ts = create_tracker_state(self.n_cams).replace(
            pose=SE3(R=jnp.asarray(extras["pose_R"]),
                     t=jnp.asarray(extras["pose_t"]))
        )
        self.initialized = bool(extras["initialized"])
        self.mapmaker.reset(self.ms)
        self.mapmaker.state = int(extras["mm_state"])
        self.mapmaker.on_map_changed()
        # clear per-session latches so a restore on a used System starts
        # clean: stale features/results from the pre-load session must not
        # feed the candidate filter or the monitor image
        self._prev_feats = None
        self._last_result = None
        self._force_add_next = False
        self.done = False
        self._kf_view = 0
        self._inflight.clear()
        self._extra_drained = []

    # -- GUI-command analogues (ref src/System.cc:305-405) -----------------
    def parse_line(self, line: str):
        """GVars3 `GUI.ParseLine` analogue: one command string.

        Vocabulary matches the reference's registered GUI commands
        (src/System.cc:64-77, handled at :305-405): quit/exit, Reset,
        InitTracker, ShowNextKeyFrame, ShowPrevKeyFrame, ScaleMapUp,
        ScaleMapDown, ExportMapToFile [map.dat [cameras.dat]],
        ManualAddMKF, KeyPress <k>; plus GVars-style `Name=Value`
        assignments routed to :meth:`set_var`."""
        line = line.strip()
        if not line:
            return
        if "=" in line and " " not in line.split("=", 1)[0]:
            name, value = (s.strip() for s in line.split("=", 1))
            if name not in self.vars:
                raise KeyError(
                    f"unknown var {name!r}; have {sorted(self.vars)}"
                )
            cur = self.vars[name]
            if isinstance(cur, bool):
                value = value.lower() in ("1", "true", "yes", "on")
            elif isinstance(cur, int):
                value = int(value)
            elif isinstance(cur, float):
                value = float(value)
            self.set_var(name, value)
            return
        parts = line.split()
        cmd, params = parts[0], parts[1:]
        if cmd in ("quit", "exit"):
            self.done = True
        elif cmd == "Reset":
            self.reset()
        elif cmd == "InitTracker":
            # RequestInit only sets a flag consumed by TrackForInitialMap,
            # which runs only when no good map exists (ref
            # src/Tracker.cc:625-631) — on a running, initialized system
            # this is a harmless no-op, never a map wipe.  Here the map
            # bootstraps automatically on the first frame, so there is
            # nothing to request when uninitialized either.
            pass
        elif cmd == "ShowNextKeyFrame":
            self._kf_view += 1
        elif cmd == "ShowPrevKeyFrame":
            self._kf_view -= 1
        elif cmd == "ScaleMapUp":
            self.rescale_map(2.0)
        elif cmd == "ScaleMapDown":
            self.rescale_map(0.5)
        elif cmd == "ExportMapToFile":
            from mcptam_tpu.system.mapio import (
                dump_map_ascii, dump_cameras_ascii,
            )
            map_path = params[0] if params else "map.dat"
            cam_path = params[1] if len(params) > 1 else "cameras.dat"
            dump_map_ascii(map_path, self.ms)
            dump_cameras_ascii(
                cam_path, self.cams, self.cam_from_base, self.H, self.W
            )
        elif cmd == "ManualAddMKF":
            if self.mapmaker.state == MM_INITIALIZING:
                self.mapmaker.stop_init()
            else:
                self._force_add_next = True
        elif cmd == "KeyPress":
            key = params[0] if params else ""
            if key == "r":
                self.reset()
            elif key in ("q", "Escape"):
                self.done = True
            elif key == "o":
                self.mapmaker.on_map_changed()  # SetNotConverged analogue
            elif key == "a":
                self.parse_line("ManualAddMKF")
            elif key == "Space":
                self.parse_line("InitTracker")
        else:
            raise ValueError(f"unhandled GUI command: {cmd!r}")

    def keyframe_view(self, cam_idx: int = 0):
        """Current KeyFrameViewer image (measurement overlay of the MKF the
        viewer cursor points at; ref KeyFrameViewer.h:57-89).  Returns
        (H,W,3) uint8 or None if the map has no keyframes."""
        from mcptam_tpu.system.viewer import keyframe_overlay
        valid = np.nonzero(np.asarray(self.ms.mkfs.valid))[0]
        if valid.size == 0:
            return None
        m = int(valid[self._kf_view % valid.size])
        return keyframe_overlay(self.ms, m, cam_idx)

    def rescale_map(self, scale: float):
        """Uniform global map rescale (the 'Rescale' menu command)."""
        from mcptam_tpu.map.align import apply_global_scale
        self.ms = apply_global_scale(self.ms, scale)
        self.ts = self.ts.replace(
            pose=SE3(R=self.ts.pose.R, t=self.ts.pose.t * scale)
        )
        self.mapmaker.on_map_changed()

    def align_to_dominant_plane(self, seed: int = 0):
        """RANSAC dominant plane -> re-express the world with the plane at
        z=0 (CalcPlaneAligner + ApplyGlobalTransformationToMap)."""
        from mcptam_tpu.map.align import (
            plane_align_transform, apply_global_transform,
        )
        key = jax.random.PRNGKey(seed)
        T, ok = plane_align_transform(
            self.ms.points.pos_w, self.ms.points.valid & ~self.ms.points.bad,
            key,
        )
        if bool(ok):
            self.ms = apply_global_transform(self.ms, T)
            # tracker pose lives in world coords: cam_from_world' =
            # cam_from_world @ T^-1
            Tinv = T.inv()
            p = self.ts.pose
            self.ts = self.ts.replace(pose=SE3(
                R=p.R @ Tinv.R, t=p.R @ Tinv.t + p.t
            ))
            self.mapmaker.on_map_changed()
        return bool(ok)
