"""Map-maker device kernels: map init + keyframe integration.

The jittable pieces of the reference's MapMakerServerBase
(src/MapMakerServerBase.cc):

  * :func:`init_from_mkf` — bootstrap a map from one MultiKeyFrame:
    cross-camera epipolar stereo points where the rig overlaps, fixed-depth
    points otherwise (InitFromMultiKeyFrame, :146-261);
  * :func:`integrate_mkf` — add a tracker-handed MKF: commit imagery,
    record the tracker's measurements, refind existing points in the new
    keyframes, then create new points from its candidates, coarse levels
    first (AddMultiKeyFrameAndCreatePoints, :346-404).

Host-side scheduling (local/global BA alternation, queue, preemption)
lives in system/mapmaker.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import LEVELS, MapMakerConfig, DEFAULT_MAPMAKER
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel, unproject
from mcptam_tpu.core.levels import level_zero_pos
from mcptam_tpu.map.state import MapState, kf_cam_from_world, SRC_TRACKER
from mcptam_tpu.map.builder import commit_mkf, add_points, add_measurements
from mcptam_tpu.map.keyframe import FrameFeatures
from mcptam_tpu.map.epipolar import create_epipolar_points
from mcptam_tpu.map.refind import refind_in_keyframes, measurement_table


def _level_candidates(feats: FrameFeatures, cam: int, level: int, cap: int):
    """Best `cap` candidates (by FAST score) of a camera/level as
    (xy (cap,2), want).

    Candidate lists arrive raster-order compacted (sort-free tracker
    front-end); the map maker wants the strongest corners, so rank the
    small (<=512) list here — this runs only at MKF integration, off the
    frame-rate path, where a tiny top_k is free."""
    score = jnp.where(
        feats.cand_valid[level][cam], feats.cand_score[level][cam], -1.0
    )
    vals, pos = jax.lax.top_k(score, cap)
    xy = feats.cand_xy[level][cam][pos].astype(jnp.float32)
    return xy, vals > 0.0


def init_from_mkf(ms: MapState, cams: CameraModel, feats: FrameFeatures,
                  base_pose: SE3, mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                  cap_per_level: int = 64):
    """Bootstrap the map from the first MultiKeyFrame.

    For rigs (C>1): candidates of camera c try an epipolar match in camera
    (c+1)%C of the same MKF (stereo init).  For C==1 candidates become
    fixed-depth points at mcfg.init_depth (monocular init) — the same
    stereo/fixed-depth split as InitFromMultiKeyFrame
    (src/MapMakerServerBase.cc:146-261); single-view fixed-depth points are
    not mixed into multi-camera maps, where their depth error would bias
    tracking until BA catches up.  The first MKF is the gauge anchor
    (fixed)."""
    C = ms.cam_from_base.t.shape[0]
    ms, mkf_idx, ok = commit_mkf(ms, feats, base_pose, fixed=True)

    kcw = kf_cam_from_world(ms)
    for level in range(LEVELS - 1, -1, -1):
        for c in range(C):
            xy, want = _level_candidates(feats, c, level, cap_per_level)
            Q = xy.shape[0]
            cam_arr = jnp.full((Q,), c, jnp.int32)
            lvl_arr = jnp.full((Q,), level, jnp.int32)
            if C > 1:
                tgt = (c + 1) % C
                ms, made = create_epipolar_points(
                    ms, cams,
                    src_mkf=jnp.broadcast_to(mkf_idx, (Q,)),
                    src_cam=cam_arr,
                    tgt_mkf=jnp.broadcast_to(mkf_idx, (Q,)),
                    tgt_cam=jnp.full((Q,), tgt, jnp.int32),
                    level=lvl_arr,
                    xy_level=xy,
                    want=want,
                )
            else:
                cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
                pose_c = jax.tree_util.tree_map(
                    lambda a: a[mkf_idx, c], SE3(R=kcw.R, t=kcw.t)
                )
                root = level_zero_pos(xy, float(level))
                rays = unproject(cam_c, root)
                p_cam = rays * mcfg.init_depth
                pos_w = pose_c.inv().apply(p_cam)
                ms, _, _ = add_points(
                    ms, cams, mkf_idx=mkf_idx, cam_idx=cam_arr, level=lvl_arr,
                    xy_level=xy, pos_w=pos_w, want=want,
                )
    from mcptam_tpu.map.state import refresh_scene_depths
    ms = refresh_scene_depths(ms)
    return ms, mkf_idx


def record_tracker_measurements(ms: MapState, mkf_idx, result):
    """Record the tracker's found positions as SRC_TRACKER measurements of
    the new MKF (ref Tracker::RecordMeasurements, src/Tracker.cc:1237-1274)."""
    want = result.sel_found & ~result.sel_outlier
    K = want.shape[0]
    return add_measurements(
        ms,
        mkf=jnp.broadcast_to(mkf_idx, (K,)).astype(jnp.int32),
        cam=result.sel_cam,
        point=result.sel_point,
        level=result.sel_level.astype(jnp.int32),
        uv_l0=result.sel_pos_l0,
        want=want,
        source=jnp.full((K,), SRC_TRACKER, jnp.int32),
        subpix=result.sel_subpix,
    )


def integrate_mkf(ms: MapState, cams: CameraModel, feats: FrameFeatures,
                  base_pose: SE3, tracker_result=None,
                  mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                  cap_per_level: int = 32, cam_active=None):
    """Integrate a new tracker MKF: commit imagery + tracker measurements,
    refind existing points in it, then create new stereo points from its
    candidates, coarse levels first (AddMultiKeyFrameAndCreatePoints,
    src/MapMakerServerBase.cc:346-404).

    cam_active: optional (C,) bool — dropped cameras become invalid KFs of
    this MKF (the reference prunes inactive KFs from incoming MKFs,
    src/MapMakerClientBase.cc:229-247)."""
    C = ms.cam_from_base.t.shape[0]
    ms, mkf_idx, ok = commit_mkf(ms, feats, base_pose, kf_valid=cam_active)

    if tracker_result is not None:
        ms = record_tracker_measurements(ms, mkf_idx, tracker_result)

    # refind existing points in the new keyframes only
    M = ms.mkfs.capacity
    target = jnp.zeros(M, bool).at[mkf_idx].set(True)
    ms, n_refound = refind_in_keyframes(ms, cams, target_mkf_mask=target)

    # new points: candidates not already near an existing measurement
    # (reference thins candidates near existing measurements, :411-447 —
    # approximated here by the refind pass already claiming those corners)
    min_level = 0 if getattr(mcfg, "level_zero_points", True) else 1
    cross_cam = getattr(mcfg, "cross_camera", True)
    for level in range(LEVELS - 1, min_level - 1, -1):
        for c in range(C):
            xy, want = _level_candidates(feats, c, level, cap_per_level)
            Q = xy.shape[0]
            cam_arr = jnp.full((Q,), c, jnp.int32)
            lvl_arr = jnp.full((Q,), level, jnp.int32)
            if cam_active is not None:
                want = want & cam_active[c]
            if C > 1 and cross_cam:
                tgt_cam = jnp.full((Q,), (c + 1) % C, jnp.int32)
                tgt_mkf = jnp.broadcast_to(mkf_idx, (Q,))
                if cam_active is not None:
                    want = want & cam_active[(c + 1) % C]
            else:
                # temporal stereo against the previous MKF, same camera
                prev = jnp.argmax(
                    jnp.where(
                        ms.mkfs.valid
                        & (ms.mkfs.seq < ms.mkfs.seq[mkf_idx]),
                        ms.mkfs.seq,
                        -1,
                    )
                )
                tgt_cam = cam_arr
                tgt_mkf = jnp.broadcast_to(prev, (Q,))
            ms, made = create_epipolar_points(
                ms, cams,
                src_mkf=jnp.broadcast_to(mkf_idx, (Q,)),
                src_cam=cam_arr,
                tgt_mkf=tgt_mkf,
                tgt_cam=tgt_cam,
                level=lvl_arr,
                xy_level=xy,
                want=want,
            )
    from mcptam_tpu.map.state import refresh_scene_depths
    ms = refresh_scene_depths(ms)
    return ms, mkf_idx


def need_new_mkf(ms: MapState, pose: SE3, mean_depth,
                 mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                 queue_dist=None):
    """Tracker's add-MKF heuristic (MapMakerClientBase::NeedNewMultiKeyFrame,
    src/MapMakerClientBase.cc:111-152): depth-scaled distance to the
    closest MKF — in the map AND, if `queue_dist` is given, in the
    map-maker queue — against sdMaxScaledMKFDist shrunk by a map-size
    factor 1 - 1/(0.5 + n_mkfs) (n=2 counts as 1, per the reference)."""
    from mcptam_tpu.map.state import closest_mkf_distance, count_mkfs
    d, idx = closest_mkf_distance(ms, pose, mean_depth)
    if queue_dist is not None:
        d = jnp.minimum(d, queue_dist)
    scaled = d / jnp.maximum(mean_depth, 1e-6)
    n = count_mkfs(ms)
    n_eff = jnp.where(n == 2, 1, n).astype(jnp.float32)
    thresh = mcfg.max_scaled_mkf_dist * (1.0 - 1.0 / (0.5 + n_eff))
    return scaled > thresh, scaled
