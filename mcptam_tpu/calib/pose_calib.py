"""Pose-calibrator tracking phase: TrackerCalib + MapMakerCalib, TPU-style.

The reference calibrates rig extrinsics WITHOUT requiring simultaneous
board views: each camera bootstraps its own metric pose from the
checkerboard whenever it happens to see it, then tracks a shared
board-anchored map; keyframes dropped while tracking are optimized as
INDEPENDENT poses in the background, and the relative-pose observable
comes from cameras tracking the map at the same instant
(src/PoseCalibrator.cc:221-411, src/TrackerCalib.cc:248-420,
src/MapMakerCalib.cc:72-226,248-528, src/BundleAdjusterSingle.cc:55-120).

TPU-native mapping:

  * the shared map is a standard :class:`MapState` whose extrinsics are
    ALL identity — one MKF per dropped keyframe with ``kf_valid`` masking
    the single owning camera.  Each MKF base pose then IS an independent
    camera-from-world, so the stock bundle over this map (``problem_single``)
    reproduces BundleAdjusterSingle's chain layout with zero new solver
    code;
  * per-camera tracking reuses the rig tracker with ``cam_active`` a
    one-hot mask (TrackerCalib runs one Tracker per camera,
    src/TrackerCalib.cc:248-420);
  * cameras GOOD at the same frame form a *sync group* — the analogue of
    the reference assembling simultaneously-dropped keyframes into one
    MultiKeyFrame (TransferKeyFrame, src/PoseCalibrator.cc:474-500);
  * CalibInit = final global BA -> geodesic-L2 rotation averaging of
    per-group relative poses (FindAverageRelativePoses,
    src/MapMakerCalib.cc:248-345) -> per-group base-shift Gauss-Newton
    (src/MapMakerCalib.cc:398-488) -> Calib-layout bundle with shared
    movable extrinsics (BundleAdjusterCalib).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.config import (
    TrackerConfig, MapMakerConfig, BundleConfig,
)
from mcptam_tpu.core.se3 import SE3, so3_exp, so3_ln
from mcptam_tpu.core.camera import CameraModel
from mcptam_tpu.map.state import (
    MapState, create_map_state, refresh_scene_depths, kf_distance_table,
    SRC_ROOT as SRC_ROOT_CONST,
)
from mcptam_tpu.map.builder import commit_mkf, add_points
from mcptam_tpu.map.mapmaker_core import integrate_mkf_device
from mcptam_tpu.map.keyframe import FrameFeatures, make_frame_features
from mcptam_tpu.tracker.tracker import (
    TrackerState, create_tracker_state, track_frame, QUALITY_GOOD,
)
from mcptam_tpu.ba.bundle import (
    BundleProblem, create_lm_state, lm_run, tukey_outlier_pass,
    attach_obs_table,
)
from mcptam_tpu.ba.adjusters import problem_single, writeback, apply_outliers
from mcptam_tpu.calib.extrinsic import board_pose_pnp


# ---------------------------------------------------------------------------
# Map init from a calibration image
# ---------------------------------------------------------------------------

# effective "level" of direct grid-corner detections in the FINAL calib
# bundle: residual sigma = 2^level px, so -2 = 0.25 px detector sigma
# (conservative for sub-pixel X-corner refinement).  Applied only when the
# calib problem is extracted — inside the live map the adaptive-Huber
# sigma is a median over mixed sources and a 16x chi2 rescale of the
# detections poisons it.
DETECTION_LEVEL = -2

def init_from_calib_image(ms: MapState, cams: CameraModel,
                          feats: FrameFeatures, cam: int,
                          corner_uv, board_xy, pose_c: SE3,
                          return_slots: bool = False):
    """Bootstrap the calibration map from one camera's board view
    (InitFromCalibImage, src/MapMakerCalib.cc:72-226): one single-camera
    MKF at the board-PnP pose, FIXED points at the metric grid corners
    (z=0 board plane), ROOT measurements at the detected corner positions.

    corner_uv (K,2): detected corner image positions; board_xy (K,2):
    matching metric board coordinates.  Returns (ms, mkf_idx)."""
    C = ms.cam_from_base.t.shape[0]
    kf_valid = jnp.zeros((C,), bool).at[cam].set(True)
    ms, mkf_idx, ok = commit_mkf(ms, feats, pose_c, kf_valid=kf_valid)
    K = corner_uv.shape[0]
    pos_w = jnp.concatenate(
        [jnp.asarray(board_xy, jnp.float32), jnp.zeros((K, 1))], axis=1
    )
    ms, slots, _ = add_points(
        ms, cams,
        mkf_idx=mkf_idx,
        cam_idx=jnp.full((K,), cam, jnp.int32),
        level=jnp.zeros((K,), jnp.int32),
        xy_level=jnp.asarray(corner_uv, jnp.float32),
        pos_w=pos_w,
        want=jnp.ones((K,), bool),
        fixed=jnp.ones((K,), bool),
    )
    ms = refresh_scene_depths(ms)
    if return_slots:
        return ms, mkf_idx, slots
    return ms, mkf_idx


def need_new_kf(ms: MapState, cam: int, pose_c: SE3, mean_depth,
                max_scaled_dist: float):
    """Per-camera add heuristic: depth-scaled distance from the tracked
    camera pose to the closest keyframe OWNED BY THE SAME CAMERA
    (NeedNewKeyFrame with bSameCamName=true,
    src/MapMakerClientBase.cc:181-211 via TrackerCalib,
    src/TrackerCalib.cc:315-325)."""
    # distance table from a virtual KF at pose_c: reuse kf_distance_table
    # by probing against every slot directly
    frac = 0.5
    from mcptam_tpu.map.state import kf_cam_from_world
    kcw = kf_cam_from_world(ms)
    inv = kcw.inv()
    pos = inv.t                               # (M,C,3)
    depth = ms.mkfs.scene_depth_mean
    z = jnp.zeros_like(depth)
    dpt = inv.apply(jnp.stack([z, z, depth], -1))
    my_inv = pose_c.inv()
    my_pos = my_inv.t
    my_dpt = my_inv.apply(
        jnp.stack([jnp.zeros(()), jnp.zeros(()), mean_depth])
    )
    d = (
        jnp.linalg.norm(pos - my_pos, axis=-1)
        + frac * jnp.linalg.norm(dpt - my_dpt, axis=-1)
    )
    ok = ms.mkfs.valid[:, None] & ms.mkfs.kf_valid
    ok = ok & (jnp.arange(ms.cam_from_base.t.shape[0])[None, :] == cam)
    d = jnp.where(ok, d, jnp.inf)
    scaled = jnp.min(d) / jnp.maximum(mean_depth, 1e-6)
    return scaled > max_scaled_dist


# ---------------------------------------------------------------------------
# The session
# ---------------------------------------------------------------------------

@dataclass
class PoseCalibSession:
    """Drives per-camera board bootstrap + shared-map tracking + background
    single-pose BA, then the final extrinsic solve.

    Feed :meth:`process_frame` synchronized (C,H,W) frames; per-camera
    board detections (uv, board_idx into board_pts2) may be supplied by the
    caller (app: from calib.corners detection) — a camera joins tracking as
    soon as it has one accepted board PnP."""

    cams: CameraModel
    cams_sbi: CameraModel
    params9: list                      # per-camera 9-vector (PnP bootstrap)
    board_pts2: np.ndarray             # (K,2) metric board corner coords
    H: int
    W: int
    max_points: int = 2048
    max_mkfs: int = 24
    max_meas: int = 8192
    tcfg: TrackerConfig = field(default_factory=TrackerConfig)
    mcfg: MapMakerConfig = field(default_factory=MapMakerConfig)
    bcfg: BundleConfig = field(default_factory=BundleConfig)
    max_scaled_kf_dist: float = 0.1
    ba_chunk: int = 10

    def __post_init__(self):
        C = int(self.cams.theta_mean.shape[0])
        self.C = C
        identity = SE3.identity((C,))
        self.ms = create_map_state(
            self.H, self.W, C, identity,
            self.max_points, self.max_mkfs, self.max_meas,
        )
        self.trackers = [create_tracker_state(C) for _ in range(C)]
        self.running = [False] * C
        self._bad_streak = [0] * C
        self.map_good = False
        self.sync_groups: list = []    # list[dict cam -> mkf slot]
        self.frame_count = 0
        self._ba_prob = None
        self._ba_state = None
        self._ba_steps = 0
        self._lm = jax.jit(
            lambda prob, st: lm_run(prob, st, self.cams, self.ba_chunk,
                                    self.bcfg)
        )
        self._track = jax.jit(
            lambda ts, ms, feats, ca: track_frame(
                ts, ms, self.cams, self.cams_sbi, feats, self.tcfg,
                cam_active=ca,
            )
        )
        self._integrate = jax.jit(
            lambda ms, feats, pose, res, ca: integrate_mkf_device(
                ms, self.cams, feats, pose, res, self.mcfg, cam_active=ca,
            )
        )
        # final-phase results
        self.cam_from_base = None      # SE3 (C,) after calib_init/calib_step
        self.group_bases = None

    # -- per-frame ---------------------------------------------------------
    @staticmethod
    def _as_candidates(det):
        """A detection entry is one (uv, board_idx) labeling or a list of
        candidate labelings (symmetric checkerboards have an unresolvable
        180-degree twin at the detector level)."""
        if isinstance(det, list):
            return det
        return [det]

    def _pnp_candidates(self, c: int, det):
        """Board PnP for every candidate labeling of camera c's detection.
        Returns list of (pose_c SE3, uv, bidx)."""
        out = []
        for uv, bidx in self._as_candidates(det):
            if len(uv) < 8:
                continue
            res = board_pose_pnp(
                self.params9[c], self.board_pts2[bidx], np.asarray(uv),
                (self.W, self.H),
            )
            if res is None:
                continue
            R, t = res
            out.append((
                SE3(R=jnp.asarray(R, jnp.float32),
                    t=jnp.asarray(t, jnp.float32)),
                np.asarray(uv), np.asarray(bidx),
            ))
        return out

    def _arbitrate_twin(self, c: int, feats, cands_c):
        """The shared map arbitrates a symmetric board's 180-degree twin:
        one tracking pass against the map from each candidate PnP pose —
        only the labeling consistent with the map's board frame finds
        measurements.  (The app's cross-view consensus needs simultaneous
        views of the board, which zero-overlap rigs never have; tracking
        against the map is the reference's implicit arbiter — a TrackerCalib
        bootstrapped on the wrong twin immediately loses tracking and
        re-bootstraps, src/TrackerCalib.cc:248-420.)  Returns the winning
        candidate or None when ambiguous (caller waits for a later view)."""
        if len(cands_c) == 1:
            return cands_c[0]
        ca = jnp.zeros((self.C,), bool).at[c].set(True)
        # score ONLY non-fixed (scene) points: the fixed grid corners are
        # themselves 180-degree symmetric, so they match equally well from
        # both twin poses and carry no information
        fixed = np.asarray(jax.device_get(self.ms.points.fixed))
        scores = []
        for pose_c, _uv, _bidx in cands_c:
            probe = create_tracker_state(self.C).replace(pose=pose_c)
            _, res = self._track(probe, self.ms, feats, ca)
            sel = np.asarray(jax.device_get(res.sel_point))
            fnd = np.asarray(jax.device_get(res.sel_found))
            scores.append(int(np.sum(fnd & ~fixed[sel])))
        order = sorted(range(len(scores)), key=lambda i: -scores[i])
        best, second = order[0], order[1]
        if scores[best] >= 8 and scores[best] >= 2 * max(scores[second], 1):
            return cands_c[best]
        return None

    def _consistent_labeling(self, c: int, pose_tracked: SE3, cands_c,
                             max_rot: float = 0.5):
        """Among candidate labelings, the one whose PnP pose agrees with
        the tracked pose (same rule keeps one camera's twin choice
        consistent across its own frames).  None if nothing is close."""
        best, best_d = None, np.inf
        for cand in cands_c:
            d = float(np.linalg.norm(np.asarray(
                (cand[0] @ pose_tracked.inv()).ln(), np.float64)[3:]))
            if d < best_d:
                best, best_d = cand, d
        if best is not None and best_d < max_rot:
            return best
        return None

    def process_frame(self, images, detections=None):
        """One synchronized frame.  detections: optional dict
        cam -> (uv (N,2), board_idx (N,)) — or a LIST of such candidate
        labelings when the detector could not resolve the board's
        180-degree twin — of board corners found in this frame's image of
        that camera."""
        detections = detections or {}
        feats = make_frame_features(jnp.asarray(images, jnp.float32))
        self.frame_count += 1

        # 1. board bootstrap for cameras not yet running
        #    (TrackerCalib CHECKERBOARD stages, src/TrackerCalib.cc:345-390)
        for c in range(self.C):
            if self.running[c] or c not in detections:
                continue
            cands_c = self._pnp_candidates(c, detections[c])
            if not cands_c:
                continue
            if self.map_good:
                cand = self._arbitrate_twin(c, feats, cands_c)
                if cand is None:
                    continue
                pose_c, uv, bidx = cand
            else:
                # first camera: either twin is a valid gauge choice
                pose_c, uv, bidx = cands_c[0]
                self.ms, init_idx, slots = init_from_calib_image(
                    self.ms, self.cams, feats, c,
                    np.asarray(uv), self.board_pts2[bidx], pose_c,
                    return_slots=True,
                )
                self._board_slot = np.full(len(self.board_pts2), -1,
                                           np.int32)
                self._board_slot[np.asarray(bidx)] = \
                    np.asarray(jax.device_get(slots))
                self.map_good = True
                # the init MKF is a keyframe of camera c like any other —
                # its FIXED board measurements pin the gauge of the final
                # Calib bundle (the reference keeps every MKF containing
                # the first camera, RemoveMultiKeyFrames(firstCam, true),
                # src/MapMakerCalib.cc:229-245,372-376)
                self.sync_groups.append({c: int(jax.device_get(init_idx))})
            self.trackers[c] = self.trackers[c].replace(
                pose=pose_c, vel=jnp.zeros(6),
                lost_count=jnp.zeros((), jnp.int32),
            )
            self.running[c] = True

        if not self.map_good:
            return

        # 2. per-camera tracking against the shared map
        results = {}
        for c in range(self.C):
            if not self.running[c]:
                continue
            ca = jnp.zeros((self.C,), bool).at[c].set(True)
            self.trackers[c], res = self._track(
                self.trackers[c], self.ms, feats, ca
            )
            results[c] = res
            # persistent loss -> back to the checkerboard stage (the
            # reference TrackerCalib re-bootstraps from the board when
            # tracking is lost, src/TrackerCalib.cc:289-343); this also
            # self-corrects a bootstrap on the wrong twin of a symmetric
            # board when only one labeling was detectable
            if int(res.quality) != QUALITY_GOOD or bool(res.lost):
                self._bad_streak[c] += 1
                if self._bad_streak[c] >= 5:
                    self.running[c] = False
                    self._bad_streak[c] = 0
            else:
                self._bad_streak[c] = 0

        # 3. drop keyframes: if ANY running camera signals a drop (its
        #    per-camera distance heuristic fires, or it has no keyframe
        #    yet), EVERY currently-GOOD running camera contributes a
        #    single-camera MKF — the reference gathers all calibrated GOOD
        #    trackers into one MultiKeyFrame whenever any tracker signals
        #    mbNeedToDrop (src/PoseCalibrator.cc:285-345).  Simultaneous
        #    contributions form a sync group: the relative-pose observable.
        need_drop = False
        for c, res in results.items():
            if int(res.quality) != QUALITY_GOOD or bool(res.lost):
                continue
            # board-detection frames always drop: a detected grid is the
            # highest-precision observation the session will ever get for
            # this camera, so never let one pass unanchored (the reference
            # consumes every detection in CHECKERBOARD_SECOND_STAGE,
            # src/TrackerCalib.cc:263-283)
            if c in detections:
                need_drop = True
                continue
            depth_c = jnp.maximum(res.mean_depth[c], 1e-3)
            has_kf = bool(jax.device_get(
                jnp.any(self.ms.mkfs.valid & self.ms.mkfs.kf_valid[:, c])
            ))
            if (not has_kf) or bool(jax.device_get(need_new_kf(
                self.ms, c, res.pose, depth_c, self.max_scaled_kf_dist
            ))):
                need_drop = True
        group = {}
        if need_drop:
            for c, res in results.items():
                if int(res.quality) != QUALITY_GOOD or bool(res.lost):
                    continue
                ca = jnp.zeros((self.C,), bool).at[c].set(True)
                ms2, mkf_idx, n_large, slot_ok = self._integrate(
                    self.ms, feats, res.pose, res, ca
                )
                accepted = bool(jax.device_get(slot_ok)) and (
                    not self.mcfg.large_point_test
                    or int(jax.device_get(n_large)) > 0
                )
                if accepted:
                    self.ms = ms2
                    slot = int(jax.device_get(mkf_idx))
                    group[c] = slot
                    if c in detections:
                        # the board was detected in this very frame: record
                        # the detected corners as direct measurements of
                        # the FIXED grid points — the analogue of the
                        # reference's CHECKERBOARD_SECOND_STAGE, which
                        # keeps consuming checkerboard detections while
                        # tracking (src/TrackerCalib.cc:263-283); detector
                        # precision beats patch-search precision and
                        # anchors the KF to the board frame.  Pick the
                        # labeling consistent with the tracked pose (a
                        # symmetric board's twin would poison the FIXED
                        # grid points with flipped correspondences).
                        cand = self._consistent_labeling(
                            c, res.pose,
                            self._pnp_candidates(c, detections[c]),
                        )
                        if cand is not None:
                            self._record_board_measurements(
                                slot, c, cand[1], cand[2]
                            )
            if group:
                # every drop group is an MKF analogue — singletons still
                # carry measurements into the final Calib bundle; only
                # groups with >= 2 cameras yield relative-pose samples
                self.sync_groups.append(group)
                self._abort_ba(apply_partial=True)

        # 4. background single-pose BA, one preemptible chunk per frame
        #    (MapMaker::run with BundleAdjusterSingle, SURVEY §2.11(2))
        self._ba_tick()

    def _record_board_measurements(self, mkf_idx: int, cam: int, uv, bidx):
        """Detected grid corners -> measurements of the FIXED board points
        in a freshly dropped KF (skipping pairs the tracker already
        recorded)."""
        from mcptam_tpu.map.builder import add_measurements
        from mcptam_tpu.map.state import SRC_ROOT

        slots = self._board_slot[np.asarray(bidx)]
        keep = slots >= 0
        if not keep.any():
            return
        slots_j = jnp.asarray(np.maximum(slots, 0), jnp.int32)
        K = slots_j.shape[0]
        meas = self.ms.meas
        dup = meas.valid & (meas.mkf == mkf_idx) & (meas.cam == cam)
        exists = jnp.zeros(self.ms.points.capacity, bool) \
            .at[meas.point].max(dup)
        want = jnp.asarray(keep) & ~exists[slots_j]
        self.ms = add_measurements(
            self.ms,
            mkf=jnp.full((K,), mkf_idx, jnp.int32),
            cam=jnp.full((K,), cam, jnp.int32),
            point=slots_j,
            level=jnp.zeros((K,), jnp.int32),
            uv_l0=jnp.asarray(np.asarray(uv), jnp.float32),
            want=want,
            source=jnp.full((K,), SRC_ROOT, jnp.int32),
            subpix=jnp.ones((K,), bool),
        )

    # -- background BA -----------------------------------------------------
    def _abort_ba(self, apply_partial: bool):
        if self._ba_state is not None and apply_partial \
                and int(jax.device_get(self._ba_state.accepted)) > 0:
            self.ms = writeback(self.ms, self._ba_prob, self._ba_state)
        self._ba_prob = None
        self._ba_state = None
        self._ba_steps = 0

    def _ba_tick(self):
        if self._ba_state is None:
            self._ba_prob = attach_obs_table(
                problem_single(self.ms), self.bcfg.obs_cap
            )
            self._ba_state = create_lm_state(self._ba_prob, self.bcfg)
            self._ba_steps = 0
        self._ba_state = self._lm(self._ba_prob, self._ba_state)
        self._ba_steps += self.ba_chunk
        if bool(jax.device_get(self._ba_state.converged)) \
                or self._ba_steps >= self.bcfg.max_iterations:
            if int(jax.device_get(self._ba_state.accepted)) > 0:
                self.ms = writeback(self.ms, self._ba_prob, self._ba_state)
            self._ba_prob = None
            self._ba_state = None

    # -- final optimization --------------------------------------------------
    def calib_init(self, final_ba_steps: int = 60):
        """Final global BA, relative-pose averaging, base-shift GN
        (MapMakerCalib::CalibInit, src/MapMakerCalib.cc:348-493).  Returns
        the initialized cam_from_base (C,) SE3."""
        self._abort_ba(apply_partial=True)
        prob = attach_obs_table(problem_single(self.ms), self.bcfg.obs_cap)
        st = lm_run(prob, create_lm_state(prob, self.bcfg), self.cams,
                    final_ba_steps, self.bcfg)
        self.ms = writeback(self.ms, prob, st)
        self.ms = apply_outliers(
            self.ms, tukey_outlier_pass(prob, st, self.cams)
        )

        # groups that contain camera 0 (RemoveMultiKeyFrames(firstCam, true),
        # src/MapMakerCalib.cc:372-380)
        groups = [g for g in self.sync_groups if 0 in g]
        if not any(len(g) == self.C for g in groups):
            raise ValueError(
                "no sync group contains every camera — cameras never "
                "tracked simultaneously; record more frames"
            )
        base = np.asarray(jax.device_get(self.ms.mkfs.base_from_world.R)), \
            np.asarray(jax.device_get(self.ms.mkfs.base_from_world.t))

        def pose_of(slot):
            return base[0][slot], base[1][slot]

        # per-camera relative pose samples T_c @ T_0^-1 across groups
        # (FindAverageRelativePoses, src/MapMakerCalib.cc:248-345)
        from mcptam_tpu.calib.extrinsic import average_relative_poses
        rel = [(np.eye(3), np.zeros(3))]
        for c in range(1, self.C):
            samples = []
            for g in groups:
                if c not in g:
                    continue
                R0, t0 = pose_of(g[0])
                Rc, tc = pose_of(g[c])
                Rr = Rc @ R0.T
                tr = tc - Rr @ t0
                samples.append((Rr, tr))
            if not samples:
                raise ValueError(
                    f"camera {c} never tracked simultaneously with camera 0"
                )
            rel.append(average_relative_poses(samples))

        # per-group base-shift GN redistributing the pose error
        # (src/MapMakerCalib.cc:398-488)
        group_bases = []
        for g in groups:
            R0, t0 = pose_of(g[0])
            cfb = {}
            for c, slot in g.items():
                Rc, tc = pose_of(slot)
                Rr = Rc @ R0.T
                cfb[c] = (Rr, tc - Rr @ t0)   # KF cam-from-base, base=cam0
            s = _base_shift_gn(cfb, rel)
            # new base pose: shift^-1 @ T_0
            Rs, ts = s
            Rsi, tsi = Rs.T, -Rs.T @ ts
            group_bases.append((Rsi @ R0, Rsi @ t0 + tsi))

        self.groups = groups
        self.group_bases = SE3(
            R=jnp.asarray(np.stack([b[0] for b in group_bases]), jnp.float32),
            t=jnp.asarray(np.stack([b[1] for b in group_bases]), jnp.float32),
        )
        self.cam_from_base = SE3(
            R=jnp.asarray(np.stack([r[0] for r in rel]), jnp.float32),
            t=jnp.asarray(np.stack([r[1] for r in rel]), jnp.float32),
        )
        return self.cam_from_base

    def calib_problem(self) -> BundleProblem:
        """Calib-layout bundle over the grouped map: pose_a = per-group
        base poses (movable — the fixed board points pin the gauge),
        pose_b = shared cam-from-base extrinsics (camera 0 fixed =
        identity), measurements re-chained through their MKF's group
        (BundleAdjusterCalib, src/BundleAdjusterCalib.cc:88-308)."""
        ms = self.ms
        M = ms.mkfs.capacity
        G = len(self.groups)
        # mkf slot -> group index lut (-1 = not in a kept group)
        lut = np.full(M, -1, np.int32)
        cam_of = np.zeros(M, np.int32)
        for gi, g in enumerate(self.groups):
            for c, slot in g.items():
                lut[slot] = gi
                cam_of[slot] = c
        lut_j = jnp.asarray(lut)
        grp = lut_j[ms.meas.mkf]
        m_valid = (
            ms.meas.valid
            & (grp >= 0)
            & ms.points.valid[ms.meas.point]
            & ~ms.points.bad[ms.meas.point]
        )
        counts = jnp.zeros(ms.points.capacity, jnp.int32).at[
            ms.meas.point
        ].add(m_valid.astype(jnp.int32))
        movable_pt = (
            ms.points.valid & ~ms.points.bad & ~ms.points.fixed
            & (counts >= 2)
        )
        pt_grp = jnp.maximum(lut_j[ms.points.src_mkf], 0)
        return BundleProblem(
            pose_a=self.group_bases,
            pose_b=self.cam_from_base,
            movable_a=jnp.ones((G,), bool),
            movable_b=jnp.ones((self.C,), bool).at[0].set(False),
            points=ms.points.pos_w,
            movable_pt=movable_pt,
            m_pose_a=jnp.maximum(grp, 0),
            m_pose_b=ms.meas.cam,
            m_point=ms.meas.point,
            m_cam=ms.meas.cam,
            m_uv=ms.meas.uv_l0,
            # direct grid detections (ROOT measurements of FIXED points)
            # carry detector precision, not patch-search precision
            m_level=jnp.where(
                (ms.meas.source == SRC_ROOT_CONST)
                & ms.points.fixed[ms.meas.point],
                DETECTION_LEVEL, ms.meas.level,
            ),
            m_valid=m_valid,
            pt_src_a=pt_grp,
            pt_src_b=ms.points.src_cam,
        )

    def calib_step(self, n_steps: int = 10):
        """LM steps of the Calib bundle (CalibOneStep,
        src/MapMakerCalib.cc:495-528).  Updates cam_from_base/group_bases;
        returns the LM state."""
        prob = attach_obs_table(self.calib_problem(), self.bcfg.obs_cap)
        st = lm_run(prob, create_lm_state(prob, self.bcfg), self.cams,
                    n_steps, self.bcfg)
        self.cam_from_base = SE3(R=st.pose_b.R, t=st.pose_b.t)
        self.group_bases = SE3(R=st.pose_a.R, t=st.pose_a.t)
        return st


def _base_shift_gn(cfb: dict, rel: list, iters: int = 10):
    """Reference base-shift Gauss-Newton (src/MapMakerCalib.cc:398-488):
    find shift s minimizing sum_c ||ln(cfb_c @ s @ rel_c^-1)||^2 with a
    unit prior, where cfb_c is the group's observed cam-from-base and
    rel_c the averaged extrinsic.  Host numpy (tiny problem)."""
    def se3_mul(a, b):
        return a[0] @ b[0], a[0] @ b[1] + a[1]

    def se3_inv(a):
        return a[0].T, -a[0].T @ a[1]

    def se3_ln(a):
        w = np.asarray(so3_ln(jnp.asarray(a[0], jnp.float32)), np.float64)
        th = np.linalg.norm(w)
        if th < 1e-8:
            Vinv = np.eye(3)
        else:
            wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]])
            Vinv = (
                np.eye(3) - 0.5 * wx
                + (1 / th**2 - (1 + np.cos(th)) / (2 * th * np.sin(th)))
                * (wx @ wx)
            )
        return np.concatenate([Vinv @ a[1], w])

    def se3_exp(v):
        R = np.asarray(so3_exp(jnp.asarray(v[3:], jnp.float32)), np.float64)
        w = v[3:]
        th = np.linalg.norm(w)
        if th < 1e-8:
            V = np.eye(3)
        else:
            wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]])
            V = (
                np.eye(3) + (1 - np.cos(th)) / th**2 * wx
                + (th - np.sin(th)) / th**3 * (wx @ wx)
            )
        return R, V @ v[:3]

    def gen_field(m, p4):
        """SE3 generator field on a homogeneous point (TooN convention)."""
        out = np.zeros(4)
        if m < 3:
            out[m] = p4[3]
        else:
            a = m - 3
            w = np.zeros(3)
            w[a] = 1.0
            out[:3] = np.cross(w, p4[:3])
        return out

    s = (np.eye(3), np.zeros(3))
    for _ in range(iters):
        H = np.eye(6)          # WLS prior 1.0
        g = np.zeros(6)
        for c, cfb_c in cfb.items():
            rel_c = rel[c]
            err = se3_mul(cfb_c, se3_mul(s, se3_inv(rel_c)))
            err_in_base = se3_mul(s, se3_inv(rel_c))
            v6 = se3_ln(err)
            J = np.zeros((6, 6))
            p4 = np.concatenate([err_in_base[1], [1.0]])
            R_cfb = cfb_c[0]
            for m in range(6):
                motion_base = gen_field(m, p4)
                motion_cam = R_cfb @ motion_base[:3]
                J[0:3, m] = motion_cam
            J[3:6, 3:6] = rel_c[0]
            H += J.T @ J
            g += J.T @ v6
        mu = np.linalg.solve(H, g)
        s = se3_mul(se3_inv(se3_exp(mu)), s)
    return s
