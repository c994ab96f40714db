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
from mcptam_tpu.map.state import (
    MapState, kf_cam_from_world, SRC_TRACKER, closest_kf,
)
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


def thin_candidates(ms: MapState, mkf_idx, cam, level, xy_level, want,
                    radius: float = 10.0):
    """Drop candidates within `radius` level-px of a busy position — an
    existing measurement of this KF at the same level or one level higher
    (ThinCandidates, src/MapMakerServerBase.cc:411-447).

    `cam`/`level` may be scalars or per-candidate (Q,) arrays — the
    batched form lets one call thin a whole multi-level multi-camera
    candidate block (one program instead of levels x cams copies)."""
    meas = ms.meas
    cam = jnp.broadcast_to(jnp.asarray(cam), want.shape)
    level = jnp.broadcast_to(jnp.asarray(level), want.shape)
    busy = (
        (meas.valid & (meas.mkf == mkf_idx))[None, :]
        & (meas.cam[None, :] == cam[:, None])
        & ((meas.level[None, :] == level[:, None])
           | (meas.level[None, :] == level[:, None] + 1))
    )                                                 # (Q,K)
    busy_xy = (
        meas.uv_l0[None, :, :]
        / (2.0 ** level.astype(jnp.float32))[:, None, None]
    )                                                 # (Q,K,2)
    d2 = jnp.sum((xy_level[:, None, :] - busy_xy) ** 2, axis=-1)
    near = jnp.any(busy & (d2 < radius * radius), axis=-1)
    return want & ~near


def _epi_pass(ms, cams, mkf_idx, feats, levels, region: str, cam_active,
              mcfg: MapMakerConfig, cap_per_level: int):
    """One region pass of AddStereoMapPoints over the given levels: thin
    candidates, pick the closest target KF in `region`, epipolar-create.
    Returns (ms, n_created_total).

    For region="other", all CAMERA blocks of a level are STACKED into one
    thin + one create_epipolar_points call with per-row cam/target
    parameters: a per-(level, cam) loop instantiated the full epipolar
    machinery levels x cams times inside one jitted program, which alone
    cost ~4 minutes of XLA compile for a 4-camera rig.  Levels stay
    SEQUENTIAL, and thinning consults only same-camera measurements of
    the source KF at the candidate's level or one above (ThinCandidates,
    ref :411-447) — "other" creations touch only (new KF, same cam) and a
    different MKF's KFs, so camera blocks never interact within a level
    and the batching preserves the reference's creation order.

    For region="self" the TARGET is a sibling camera of the same MKF:
    camera c's match lands a measurement in camera c' of this very MKF,
    and the reference's sequential loop thins c''s candidates against it.
    Cameras therefore run as a lax.scan (ONE trace per level, carried
    MapState, reference creation order) instead of one stacked call —
    same instantiation count, sequential execution only here."""
    C = ms.cam_from_base.t.shape[0]
    made_total = jnp.zeros((), jnp.int32)
    tgts = [closest_kf(ms, mkf_idx, c, region) for c in range(C)]
    nh = mcfg.epi_max_hypotheses
    corner = mcfg.epi_corner_ambiguity
    for level in levels:
        xs, wants, camv, tmv, tcv = [], [], [], [], []
        for c in range(C):
            xy, want = _level_candidates(feats, c, level, cap_per_level)
            Q = xy.shape[0]
            if cam_active is not None:
                want = want & cam_active[c]
            tgt_m, tgt_c, tgt_ok = tgts[c]
            if cam_active is not None and region == "self":
                tgt_ok = tgt_ok & cam_active[tgt_c]
            xs.append(xy)
            wants.append(want & tgt_ok)
            camv.append(jnp.full((Q,), c, jnp.int32))
            tmv.append(jnp.broadcast_to(tgt_m, (Q,)))
            tcv.append(jnp.broadcast_to(tgt_c, (Q,)))
        if region == "self":
            def _cam_body(ms, blk, level=level):
                xy, want, camr, tm, tc = blk
                lvlv = jnp.full(xy.shape[:1], level, jnp.int32)
                want = thin_candidates(ms, mkf_idx, camr, lvlv, xy, want,
                                       mcfg.thin_radius)
                ms, made = create_epipolar_points(
                    ms, cams,
                    src_mkf=jnp.broadcast_to(mkf_idx, xy.shape[:1]),
                    src_cam=camr, tgt_mkf=tm, tgt_cam=tc,
                    level=lvlv, xy_level=xy, want=want, n_hypotheses=nh,
                    corner_ambiguity=corner,
                )
                return ms, jnp.sum(made)
            ms, mades = jax.lax.scan(
                _cam_body, ms,
                (jnp.stack(xs), jnp.stack(wants), jnp.stack(camv),
                 jnp.stack(tmv), jnp.stack(tcv)),
            )
            made_total = made_total + jnp.sum(mades)
            continue
        xy = jnp.concatenate(xs)
        want = jnp.concatenate(wants)
        camv = jnp.concatenate(camv)
        QT = xy.shape[0]
        lvlv = jnp.full((QT,), level, jnp.int32)
        want = thin_candidates(ms, mkf_idx, camv, lvlv, xy, want,
                               mcfg.thin_radius)
        ms, made = create_epipolar_points(
            ms, cams,
            src_mkf=jnp.broadcast_to(mkf_idx, (QT,)),
            src_cam=camv,
            tgt_mkf=jnp.concatenate(tmv),
            tgt_cam=jnp.concatenate(tcv),
            level=lvlv,
            xy_level=xy,
            want=want,
            n_hypotheses=nh,
            corner_ambiguity=corner,
        )
        made_total = made_total + jnp.sum(made)
    return ms, made_total


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
                # sequential loop: thinning sees measurements created
                # into camera c by earlier cameras of this same init
                # (ThinCandidates inside AddPointEpipolar, ref :411-447)
                want = thin_candidates(ms, mkf_idx, cam_arr, lvl_arr, xy,
                                       want, mcfg.thin_radius)
                ms, made = create_epipolar_points(
                    ms, cams,
                    src_mkf=jnp.broadcast_to(mkf_idx, (Q,)),
                    src_cam=cam_arr,
                    tgt_mkf=jnp.broadcast_to(mkf_idx, (Q,)),
                    tgt_cam=jnp.full((Q,), tgt, jnp.int32),
                    level=lvl_arr,
                    xy_level=xy,
                    want=want,
                    n_hypotheses=mcfg.epi_max_hypotheses,
                    corner_ambiguity=mcfg.epi_corner_ambiguity,
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


def record_tracker_measurements(ms: MapState, mkf_idx, result, enable=True):
    """Record the tracker's found positions as SRC_TRACKER measurements of
    the new MKF (ref Tracker::RecordMeasurements, src/Tracker.cc:1237-1274)."""
    want = result.sel_found & ~result.sel_outlier & enable
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
    """Integrate a new tracker MKF (AddMultiKeyFrameAndCreatePoints,
    src/MapMakerServerBase.cc:346-404): commit imagery + tracker
    measurements, refind existing points in it, then create new stereo
    points from its (thinned) candidates — coarse levels first against the
    closest OTHER-MKF keyframes, with a sanity test (no coarse point could
    be made => the MKF's pose is probably bad => reject it), then the
    remaining levels, then sibling-KF (KF_ONLY_SELF) passes.

    cam_active: optional (C,) bool — dropped cameras become invalid KFs of
    this MKF (the reference prunes inactive KFs from incoming MKFs,
    src/MapMakerClientBase.cc:229-247).

    Returns (ms, mkf_idx, accepted) — accepted=False means the MKF failed
    the large-point sanity test (or the MKF store is full) and `ms` is the
    ORIGINAL map, untouched."""
    import jax as _jax

    ms_new, mkf_idx, n_large, slot_ok = integrate_mkf_device(
        ms, cams, feats, base_pose, tracker_result, mcfg, cap_per_level,
        cam_active,
    )
    reject = not bool(_jax.device_get(slot_ok)) or (
        mcfg.large_point_test and int(_jax.device_get(n_large)) == 0
    )
    if reject:
        return ms, mkf_idx, False
    return ms_new, mkf_idx, True


def integrate_mkf_device(ms: MapState, cams: CameraModel,
                         feats: FrameFeatures, base_pose: SE3,
                         tracker_result=None,
                         mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                         cap_per_level: int = 32, cam_active=None):
    """The jittable body of :func:`integrate_mkf`: runs every pass
    unconditionally and returns (ms_new, mkf_idx, n_large_points, slot_ok);
    the host wrapper decides acceptance.  The reference aborts a bad MKF
    early to save work (:397-401); here the post-sanity passes are computed
    speculatively — rejections are rare and one fused device program per
    integration beats host round-trips per pass."""
    C = ms.cam_from_base.t.shape[0]
    ms, mkf_idx, ok = commit_mkf(ms, feats, base_pose, kf_valid=cam_active)
    if cam_active is not None:
        cam_active = cam_active & ok
    else:
        cam_active = jnp.broadcast_to(ok, (C,))

    if tracker_result is not None:
        ms = record_tracker_measurements(
            ms, mkf_idx, tracker_result, enable=ok
        )

    # refind existing points in the new keyframes only
    M = ms.mkfs.capacity
    target = jnp.zeros(M, bool).at[mkf_idx].set(ok)
    ms, n_refound = refind_in_keyframes(ms, cams, target_mkf_mask=target)

    min_level = 0 if getattr(mcfg, "level_zero_points", True) else 1

    # KF_ONLY_OTHER, coarse levels first (ref :368-378); the sanity
    # quantity is the number of large (level>=2) points this created
    ms, n_large = _epi_pass(
        ms, cams, mkf_idx, feats, [3, 2], "other", cam_active, mcfg,
        cap_per_level,
    )
    ms, _ = _epi_pass(
        ms, cams, mkf_idx, feats, list(range(1, min_level - 1, -1)),
        "other", cam_active, mcfg, cap_per_level,
    )
    # KF_ONLY_SELF: cross-camera stereo inside this MKF (ref :383-391)
    if C > 1 and getattr(mcfg, "cross_camera", True):
        ms, _ = _epi_pass(
            ms, cams, mkf_idx, feats,
            list(range(LEVELS - 1, min_level - 1, -1)),
            "self", cam_active, mcfg, cap_per_level,
        )
    from mcptam_tpu.map.state import refresh_scene_depths
    ms = refresh_scene_depths(ms)
    return ms, mkf_idx, n_large, ok


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
