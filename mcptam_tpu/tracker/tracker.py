"""Multi-camera tracking front-end: per-frame pose estimation.

Re-implements the reference Tracker (src/Tracker.cc) as one jitted,
functional pipeline.  The reference's per-camera std::map loops become a
leading camera axis; its PVS lists, random shuffle and patch budget become
masked top-k selection over the (camera x point) pair grid; its WLS<6>
accumulation loop becomes a batched normal-equation reduction (the psum
axis when the rig is sharded over devices).

Per-frame pipeline (ref TrackFrame, src/Tracker.cc:409-518):
  1. motion model: decayed constant velocity with the rotation part
     replaced by the SBI ESM estimate averaged over cameras
     (ApplyMotionModel/CalcSBIRotation, src/Tracker.cc:1516-1536,1687-1749)
  2. PVS: project every point into every camera, warp + search level
     (FindPVS, src/Tracker.cc:663-723 — with sbCollectAllPoints=true the
     reference also projects everything)
  3. coarse stage: up to 60 high-level points searched at 30 px
     (TestForCoarse, src/Tracker.cc:726-772), then 10 GN pose iterations
  4. fine stage: up to 1000 points searched at 10/5 px + subpixel
     refinement, then 10 more pose iterations (src/Tracker.cc:841-905)
  5. pose solve: Tukey-reweighted 6-DOF normal equations with prior 100
     (CalcPoseUpdate, src/Tracker.cc:1386-1511), covariance = H^-1
  6. quality assessment per camera + overall (src/Tracker.cc:1576-1658)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mcptam_tpu.config import TrackerConfig, DEFAULT_TRACKER, LEVELS
from mcptam_tpu.core.se3 import SE3, so3_ln, geodesic_rotation_mean
from mcptam_tpu.core.camera import (
    CameraModel, project, projection_derivs_sphere, cam_sphere_deriv,
)
from mcptam_tpu.core import mest
from mcptam_tpu.core.linalg import solve_spd
from mcptam_tpu.map.state import MapState
from mcptam_tpu.map.keyframe import FrameFeatures
from mcptam_tpu.ops.patch import (
    warp_and_search_level, make_warped_template_w, find_patch_w,
    subpix_refine_w, make_window_fn3, make_window_fn4, pack_corner_atlas,
)
from mcptam_tpu.ops.sbi import esm_align, se3_from_se2

QUALITY_GOOD = 0
QUALITY_DODGY = 1
QUALITY_BAD = 2


@struct.dataclass
class TrackerState:
    pose: SE3                  # base_from_world
    vel: jnp.ndarray           # (6,) motion-model velocity
    sbi_prev: jnp.ndarray      # (C,ROWS,COLS) previous-frame SBI templates
    sbi_prev_gx: jnp.ndarray
    sbi_prev_gy: jnp.ndarray
    have_prev: jnp.ndarray     # scalar bool
    lost_count: jnp.ndarray    # scalar int32
    quality: jnp.ndarray       # scalar int32 (QUALITY_*)


def create_tracker_state(n_cams: int) -> TrackerState:
    from mcptam_tpu.config import SBI_SIZE
    R, C = SBI_SIZE
    return TrackerState(
        pose=SE3.identity(),
        vel=jnp.zeros(6),
        sbi_prev=jnp.zeros((n_cams, R, C)),
        sbi_prev_gx=jnp.zeros((n_cams, R, C)),
        sbi_prev_gy=jnp.zeros((n_cams, R, C)),
        have_prev=jnp.zeros((), bool),
        lost_count=jnp.zeros((), jnp.int32),
        quality=jnp.asarray(QUALITY_BAD, jnp.int32),
    )


@struct.dataclass
class TrackResult:
    pose: SE3
    cov: jnp.ndarray            # (6,6)
    # selected fine-stage pairs, for measurement recording on MKF add
    sel_point: jnp.ndarray      # (K,) int32
    sel_cam: jnp.ndarray        # (K,) int32
    sel_level: jnp.ndarray      # (K,)
    sel_pos_l0: jnp.ndarray     # (K,2) found positions
    sel_found: jnp.ndarray      # (K,) bool
    sel_outlier: jnp.ndarray    # (K,) bool — Tukey-zero in final solve
    sel_subpix: jnp.ndarray     # (K,) bool
    num_found: jnp.ndarray      # (C,)
    num_attempted: jnp.ndarray  # (C,)
    mean_depth: jnp.ndarray     # (C,) robust scene depth per camera
    depth_sigma: jnp.ndarray    # (C,)
    quality: jnp.ndarray        # scalar int32
    quality_per_cam: jnp.ndarray  # (C,)
    lost: jnp.ndarray           # scalar bool
    sbi_rot: jnp.ndarray        # (3,) tangent used in motion model
    tot_found: jnp.ndarray      # scalar


# ---------------------------------------------------------------------------
# SBI rotation estimation
# ---------------------------------------------------------------------------

def calc_sbi_rotation(ts: TrackerState, feats: FrameFeatures,
                      cams_sbi: CameraModel, cam_from_base: SE3,
                      use_pallas: bool = False, cam_active=None):
    """Per-camera ESM prev->cur rotation, averaged in the base frame
    (ref CalcSBIRotation, src/Tracker.cc:1687-1749).  Returns (w (3,),
    valid)."""
    C = feats.sbi.shape[0]

    if use_pallas:
        from mcptam_tpu.ops.sbi_pallas import esm_align_all
        se2_all, _ = esm_align_all(
            ts.sbi_prev, feats.sbi, feats.sbi_gx, feats.sbi_gy
        )
    else:
        se2_all = None

    def per_cam(c):
        if use_pallas:
            se2 = tuple(se2_all[c, i] for i in range(4))
        else:
            se2, score = esm_align(
                ts.sbi_prev[c], feats.sbi[c], feats.sbi_gx[c], feats.sbi_gy[c],
            )
        cam_c = jax.tree_util.tree_map(lambda a: a[c], cams_sbi)
        R = se3_from_se2(se2, cam_c, cam_c)
        # se3_from_se2: v_src = R @ v_target with src=prev, target=cur
        # => rotation prev_from_cur; we want cur_from_prev
        R_cur_from_prev = R.T
        # to base frame: B_new = Rcb^T Rc Rcb B_old
        Rcb = cam_from_base.R[c]
        return Rcb.T @ R_cur_from_prev @ Rcb

    Rs = jax.vmap(per_cam)(jnp.arange(C))
    # dropped cameras contribute no rotation vote (frames may contain any
    # camera subset, ref src/Tracker.cc:286-316)
    mask = (
        jnp.ones((C,)) if cam_active is None
        else cam_active.astype(jnp.float32)
    )
    R_mean = geodesic_rotation_mean(Rs, mask)
    have = ts.have_prev & (jnp.sum(mask) > 0)
    return so3_ln(R_mean), have


# ---------------------------------------------------------------------------
# PVS
# ---------------------------------------------------------------------------

def compute_pvs(ms: MapState, cams: CameraModel, pose_base: SE3):
    """Project all points into all cameras; per-pair warp + search level
    (ref FindPVS, src/Tracker.cc:663-723).  Returns dict of (C,N) arrays."""
    pts = ms.points
    cfb = ms.cam_from_base
    p_base = pose_base.apply(pts.pos_w)                       # (N,3)
    p_cam = (
        jnp.einsum("cij,nj->cni", cfb.R, p_base) + cfb.t[:, None, :]
    )                                                          # (C,N,3)
    uv, proj_ok = jax.vmap(project)(cams, p_cam)
    duv = jax.vmap(projection_derivs_sphere)(cams, p_cam)      # (C,N,2,2)
    d_th, d_ph = cam_sphere_deriv(p_cam)                       # (C,N,3)
    R_cw = jnp.einsum("cij,jk->cik", cfb.R, pose_base.R)       # (C,3,3)

    warp_f = jax.vmap(
        jax.vmap(
            warp_and_search_level, in_axes=(0, 0, 0, None, 0, 0)
        ),
        in_axes=(0, 0, 0, 0, None, None),
    )
    warp, level, warp_ok = warp_f(
        duv, d_th, d_ph, R_cw, pts.pixel_right_w, pts.pixel_down_w
    )
    live = pts.valid & ~pts.bad
    valid = proj_ok & warp_ok & live[None, :]
    return dict(
        uv=uv, p_cam=p_cam, p_base=p_base, duv=duv, d_th=d_th, d_ph=d_ph,
        warp=warp, level=level, valid=valid,
    )


def _pair_priority(C: int, N: int) -> jnp.ndarray:
    """Deterministic hash priority standing in for the reference's random
    shuffle of the PVS (src/Tracker.cc TrackMap shuffle)."""
    n = jnp.arange(N, dtype=jnp.uint32)
    c = jnp.arange(C, dtype=jnp.uint32)[:, None]
    h = (n * jnp.uint32(2654435761) + c * jnp.uint32(40503)) & jnp.uint32(0xFFFF)
    return h.astype(jnp.float32)


def _pair_perm(C: int, N: int) -> jnp.ndarray:
    """Static permutation of the (C*N) pair grid in hash-priority order —
    computed on the host once so runtime selection needs no sort."""
    import numpy as np
    n = np.arange(N, dtype=np.uint64)
    c = np.arange(C, dtype=np.uint64)[:, None]
    h = (n * 2654435761 + c * 40503) & 0xFFFF
    # descending priority, index as tiebreak (stable) — matches selecting
    # the top-k of _pair_priority exactly
    return jnp.asarray(
        np.argsort(-h.reshape(-1), kind="stable").astype(np.int32)
    )


def _select_pairs(valid_cn, perm, k):
    """First k valid pairs in the (static) hash-permutation order — the
    exact top-k of the hash priority, with a cumsum compaction instead of
    a runtime sort (a TPU top_k instantiates ~3 MB of code and is one of
    the slowest ops on the chip)."""
    v = valid_cn.reshape(-1)[perm]
    rank = jnp.cumsum(v.astype(jnp.int32)) - 1
    tgt = jnp.where(v & (rank < k), rank, k)
    idx = jnp.zeros((k + 1,), jnp.int32).at[tgt].set(perm, mode="drop")[:k]
    n_sel = jnp.minimum(jnp.sum(v.astype(jnp.int32)), k)
    return idx, jnp.arange(k) < n_sel


# ---------------------------------------------------------------------------
# Search over selected pairs
# ---------------------------------------------------------------------------

def search_pairs(ms: MapState, feats: FrameFeatures, cam_idx, pt_idx,
                 uv_pred, warp, level, sel_ok, range_l0: int, max_range,
                 subpix_its: int, max_ssd: float):
    """Template + ZMSSD search + subpixel for K selected (cam, point)
    pairs — the batched K-last engine (ops/batch_patch.py).  All static
    shapes; invalid pairs produce found=False."""
    from mcptam_tpu.ops import batch_patch as bp
    from mcptam_tpu.ops.atlas import level_size_arrays, _level0_width_from_atlas

    pts = ms.points
    packed = pack_corner_atlas(feats.atlas, feats.corner_atlas)
    H = feats.atlas.shape[1]
    W0 = _level0_width_from_atlas(feats.atlas.shape[2])
    level_hw = level_size_arrays(H, W0)

    tmpl, t_ok = bp.make_warped_templates(
        pts.src_window[pt_idx], pts.src_window_ok[pt_idx], level_hw,
        pts.src_level[pt_idx], pts.center_xy[pt_idx], warp, level,
    )
    # FIXED points (calibration grid) are searched exhaustively, not just
    # at FAST corners — perfect X-corners fire no FAST response and these
    # points anchor a calibration ("for fixed points, we want to try
    # REALLY hard to find them", ref src/Tracker.cc:1323-1334)
    found, pos, ssd, aux = bp.find_patches(
        packed, level_hw, cam_idx, level, tmpl, uv_pred, range_l0,
        max_range, exhaustive=pts.fixed[pt_idx], max_ssd=max_ssd,
    )
    found = found & t_ok & sel_ok
    pos_ref, conv = bp.subpix_refine_region(
        aux, level_hw, level, tmpl, pos, subpix_its
    )
    pos = jnp.where((conv & found)[:, None], pos_ref, pos)
    return found, pos, conv & found


# ---------------------------------------------------------------------------
# Pose solve
# ---------------------------------------------------------------------------

def _pair_project(cams, cfb: SE3, pose: SE3, pos_w, cam_idx):
    """Projection only (no Jacobian) for K (point, camera) pairs."""
    p_base = pose.apply(pos_w)
    p_cam = jnp.einsum("kij,kj->ki", cfb.R[cam_idx], p_base) + cfb.t[cam_idx]
    cams_k = jax.tree_util.tree_map(lambda a: a[cam_idx], cams)
    return project(cams_k, p_cam)


def _pair_jacobian(cams, cfb: SE3, pose: SE3, pos_w, cam_idx):
    """Projection + 2x6 base-pose Jacobian for K pairs under `pose`.

    Returns (uv (K,2), proj_ok (K,), J (K,2,6), p_cam (K,3)).  The Jacobian
    chain is the reference's TrackerData::CalcJacobian
    (include/mcptam/TrackerData.h:152-178): SE3 generator fields on the
    base-frame point, rotated into the camera, through the sphere + camera
    derivatives."""
    p_base = pose.apply(pos_w)                                # (K,3)
    Rcb = cfb.R[cam_idx]                                      # (K,3,3)
    tcb = cfb.t[cam_idx]
    p_cam = jnp.einsum("kij,kj->ki", Rcb, p_base) + tcb
    cams_k = jax.tree_util.tree_map(lambda a: a[cam_idx], cams)
    uv, proj_ok = project(cams_k, p_cam)
    duv = projection_derivs_sphere(cams_k, p_cam)             # (K,2,2)
    d_th, d_ph = cam_sphere_deriv(p_cam)                      # (K,3)

    # generator fields: translation e_j then rotation e_j x p_base
    K = p_base.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
    zeros = jnp.zeros((K, 3))
    px, py, pz = p_base[:, 0], p_base[:, 1], p_base[:, 2]
    rot_gens = jnp.stack(
        [
            jnp.stack([zeros[:, 0], -pz, py], -1),
            jnp.stack([pz, zeros[:, 0], -px], -1),
            jnp.stack([-py, px, zeros[:, 0]], -1),
        ],
        axis=1,
    )                                                          # (K,3,3)
    gens = jnp.concatenate([eye, rot_gens], axis=1)            # (K,6,3)
    dcam = jnp.einsum("kij,kgj->kgi", Rcb, gens)               # (K,6,3)
    sph = jnp.stack(
        [
            jnp.einsum("kd,kgd->kg", d_th, dcam),
            jnp.einsum("kd,kgd->kg", d_ph, dcam),
        ],
        axis=1,
    )                                                          # (K,2,6)
    J = jnp.einsum("kij,kjg->kig", duv, sph)                   # (K,2,6)
    return uv, proj_ok, J, p_cam


def pose_solve(pose: SE3, ms: MapState, cams, cam_idx, pt_idx, found,
               found_pos, level, iterations: int, prior: float,
               sigma_floor: float):
    """Iterated Tukey-weighted 6-DOF WLS (ref CalcPoseUpdate,
    src/Tracker.cc:1386-1511).  Mirrors the reference's schedule: full
    re-projection + Jacobians at iterations 0, 4 and the last; linear
    residual updates (e -= J*delta) in between (src/Tracker.cc:1064-1073)
    — the sequential latency of the iteration chain, not its FLOPs, is
    what this costs on TPU.

    Returns (pose, H (6,6), final_weights (K,), final_err (K,2))."""
    pos_w = ms.points.pos_w[pt_idx]
    inv_scale = 1.0 / (2.0 ** level.astype(jnp.float32))       # 1/LevelScale
    reproject_at = {0, 4, max(0, iterations - 1)}

    def full_linearize(pose):
        uv, proj_ok, J, _ = _pair_jacobian(
            cams, ms.cam_from_base, pose, pos_w, cam_idx
        )
        mask = found & proj_ok
        e = (found_pos - uv) * inv_scale[:, None]
        Js = J * inv_scale[:, None, None]
        # masked pairs can carry non-finite values (e.g. degenerate slots);
        # 0-weight * inf = NaN, so zero them explicitly
        fin = (
            mask & jnp.isfinite(Js).all((-2, -1)) & jnp.isfinite(e).all(-1)
        )
        Js = jnp.where(fin[:, None, None], Js, 0.0)
        e = jnp.where(fin[:, None], e, 0.0)
        return Js, e, fin

    # segment the iteration schedule at the re-linearization points; the
    # identical linear-update iterations between them run as ONE rolled
    # fori_loop body each (~3x less generated code than full unrolling)
    marks = sorted(p for p in reproject_at if p < iterations)
    bounds = marks + [iterations]
    segments = [
        (bounds[i + 1] - bounds[i]) for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]

    H = jnp.eye(6)
    w = jnp.zeros_like(found, jnp.float32)

    def gn_iter(carry):
        pose, Js, e, mask, sigma_sq, _, _ = carry
        err_sq = jnp.sum(e * e, axis=-1)
        w = mest.weight(mest.TUKEY, err_sq, sigma_sq) * mask
        H = jnp.einsum("k,kiv,kiw->vw", w, Js, Js) + prior * jnp.eye(6)
        b = jnp.einsum("k,kiv,ki->v", w, Js, e)
        delta = solve_spd(H, b)
        pose = SE3.exp(delta) @ pose
        # linear residual update (ref TrackerData::LinearUpdate)
        e = e - jnp.einsum("kiv,v->ki", Js, delta)
        return (pose, Js, e, mask, sigma_sq, H, w)

    for seg_len in segments:
        Js, e, mask = full_linearize(pose)
        err_sq = jnp.sum(e * e, axis=-1)
        # the MAD sigma is a full sort over K — recompute it only at
        # re-linearization points (it drifts slowly between them)
        sigma_sq = jnp.maximum(
            mest.find_sigma_squared(err_sq, mask), sigma_floor
        )
        carry = gn_iter((pose, Js, e, mask, sigma_sq, H, w))
        if seg_len > 1:
            carry = jax.lax.fori_loop(
                0, seg_len - 1, lambda _, c: gn_iter(c), carry
            )
        pose, _, _, _, _, H, w = carry

    # final residuals for outlier marking
    uv, proj_ok, _, _ = _pair_jacobian(cams, ms.cam_from_base, pose, pos_w, cam_idx)
    e_fin = (found_pos - uv) * inv_scale[:, None]
    return pose, H, w, e_fin


def robust_mean_depth(p_cam_z, mask):
    """Huber-robust mean depth (ref RefreshSceneDepth via tracker,
    src/Tracker.cc:1180-1228)."""
    med = mest.masked_median_bisect(p_cam_z, mask)
    d_sq = (p_cam_z - med[..., None]) ** 2
    sig = jnp.maximum(mest.find_sigma_squared(d_sq, mask), 0.4)
    w = jnp.sqrt(mest.weight(mest.HUBER, d_sq, sig[..., None])) * mask
    sw = jnp.maximum(jnp.sum(w, -1), 1e-9)
    mean = jnp.sum(w * p_cam_z, -1) / sw
    var = jnp.sum(w * p_cam_z * p_cam_z, -1) / sw - mean * mean
    return mean, jnp.sqrt(jnp.maximum(var, 1e-12))


# ---------------------------------------------------------------------------
# The frame step
# ---------------------------------------------------------------------------

def _stage_sbi(ts: TrackerState, feats: FrameFeatures,
               cams_sbi: CameraModel, cam_from_base: SE3,
               tcfg: TrackerConfig, cam_active):
    """Stage 1a (TrackerTiming.sbi): SBI ESM rotation estimate."""
    if getattr(tcfg, "use_sbi_rotation", True):
        # the Pallas ESM engages only where Pallas compiles (TPU):
        # backend gate AND the config flag (hardware-validated round 5:
        # 0.95 ms vs 1.36 ms for the vmapped XLA path, se2 err 3e-5)
        from mcptam_tpu.backend import use_pallas
        return calc_sbi_rotation(
            ts, feats, cams_sbi, cam_from_base,
            use_pallas=(getattr(tcfg, "use_pallas_esm", True)
                        and use_pallas()),
            cam_active=cam_active,
        )
    return jnp.zeros(3), jnp.zeros((), bool)


def _stage_motion(ts: TrackerState, sbi_rot, have_rot) -> SE3:
    """Stage 1b (TrackerTiming.motion): decayed constant-velocity motion
    model with the rotation part replaced by the SBI estimate
    (ApplyMotionModel, src/Tracker.cc:1516-1536)."""
    v6 = ts.vel
    v6 = jnp.where(have_rot, v6.at[3:].set(sbi_rot), v6)
    return SE3.exp(v6) @ ts.pose


def _stage_pvs(ms: MapState, cams: CameraModel, pose_pred: SE3, cam_active):
    """Stage 2 (TrackerTiming.pvs): potentially-visible-set over the
    (camera x point) grid (FindPVS, src/Tracker.cc:663-723)."""
    pvs = compute_pvs(ms, cams, pose_pred)
    pvs["valid"] = pvs["valid"] & cam_active[:, None]
    return pvs


def _stage_coarse(ts_unused, ms: MapState, cams: CameraModel,
                  feats: FrameFeatures, pvs, pose_pred: SE3,
                  tcfg: TrackerConfig):
    """Stage 3 (TrackerTiming.coarse): levels >= 2, 60 pts, 30 px search +
    coarse GN solve (TestForCoarse, src/Tracker.cc:726-772).  Returns
    (pose_after_coarse, do_coarse)."""
    C = feats.atlas.shape[0]
    N = ms.points.capacity
    perm = _pair_perm(C, N)
    coarse_valid = pvs["valid"] & (pvs["level"] >= 2)
    c_idx, c_ok = _select_pairs(coarse_valid, perm, tcfg.coarse_max)
    c_cam = (c_idx // N).astype(jnp.int32)
    c_pt = (c_idx % N).astype(jnp.int32)
    c_uv = pvs["uv"].reshape(-1, 2)[c_idx]
    c_warp = pvs["warp"].reshape(-1, 2, 2)[c_idx]
    c_lvl = pvs["level"].reshape(-1)[c_idx]
    # static window radius in LEVEL pixels: coarse pairs are all level>=2,
    # so the worst-case level radius is range/4 — a 61-wide window would
    # waste 13x the gather+score work
    coarse_range_lvl = -(-tcfg.coarse_range // 4)
    cf_found, cf_pos, cf_sub = search_pairs(
        ms, feats, c_cam, c_pt, c_uv, c_warp, c_lvl, c_ok,
        coarse_range_lvl, jnp.asarray(float(tcfg.coarse_range)),
        tcfg.coarse_sub_pix_its, max_ssd=64 * tcfg.max_ssd_per_pixel,
    )
    n_coarse_found = jnp.sum(cf_found)
    do_coarse = n_coarse_found >= tcfg.coarse_min
    pose_c, _, _, _ = pose_solve(
        pose_pred, ms, cams, c_cam, c_pt, cf_found, cf_pos, c_lvl,
        tcfg.coarse_iterations, tcfg.tracking_prior, tcfg.mest_sigma_min,
    )
    pose_after_coarse = jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_coarse, a, b), pose_c, pose_pred
    )
    return pose_after_coarse, do_coarse


def _stage_fine(ms: MapState, cams: CameraModel, feats: FrameFeatures,
                pvs, pose_after_coarse: SE3, do_coarse,
                tcfg: TrackerConfig):
    """Stage 4 (TrackerTiming.fine): up to 1000 points searched at 10/5 px
    + subpixel (src/Tracker.cc:841-905).  The PVS (warp matrices, search
    levels, validity) is computed ONCE per frame from the predicted pose —
    as the reference does (FindPVS, src/Tracker.cc:663) — and only the
    predicted image positions of the SELECTED pairs are re-projected under
    the coarse-refined pose (TrackerData::Project re-runs per stage).
    Returns the fine-pair dict."""
    C = feats.atlas.shape[0]
    N = ms.points.capacity
    perm = _pair_perm(C, N)
    f_idx, f_ok = _select_pairs(pvs["valid"], perm, tcfg.max_patches_per_frame)
    f_cam = (f_idx // N).astype(jnp.int32)
    f_pt = (f_idx % N).astype(jnp.int32)
    f_warp = pvs["warp"].reshape(-1, 2, 2)[f_idx]
    f_lvl = pvs["level"].reshape(-1)[f_idx]
    f_uv, f_proj_ok = _pair_project(
        cams, ms.cam_from_base, pose_after_coarse,
        ms.points.pos_w[f_pt], f_cam,
    )
    f_ok = f_ok & f_proj_ok
    fine_range = jnp.where(
        do_coarse, float(tcfg.fine_range), float(tcfg.fine_range_first)
    )
    ff_found, ff_pos, ff_sub = search_pairs(
        ms, feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok,
        tcfg.fine_range_first, fine_range, tcfg.fine_sub_pix_its,
        max_ssd=64 * tcfg.max_ssd_per_pixel,
    )
    return {"cam": f_cam, "pt": f_pt, "lvl": f_lvl, "ok": f_ok,
            "found": ff_found, "pos": ff_pos, "sub": ff_sub}


def _stage_pose(ms: MapState, cams: CameraModel, pose_after_coarse: SE3,
                fine, tcfg: TrackerConfig):
    """Stage 5 (TrackerTiming.pose): Tukey-reweighted 6-DOF solve +
    covariance (CalcPoseUpdate, src/Tracker.cc:1386-1511)."""
    pose_new, H, w_final, e_final = pose_solve(
        pose_after_coarse, ms, cams, fine["cam"], fine["pt"],
        fine["found"], fine["pos"], fine["lvl"],
        tcfg.fine_iterations, tcfg.tracking_prior, tcfg.mest_sigma_min,
    )
    cov = jnp.linalg.pinv(H)
    outlier = fine["found"] & (w_final <= 0.0)
    return pose_new, cov, outlier


def track_frame(ts: TrackerState, ms: MapState, cams: CameraModel,
                cams_sbi: CameraModel, feats: FrameFeatures,
                tcfg: TrackerConfig = DEFAULT_TRACKER, cam_active=None):
    """One tracking step.  Returns (new TrackerState, TrackResult).

    Composed from the _stage_* functions above so a profiling harness can
    dispatch (and time) each stage separately — the TrackerTiming taxonomy
    the reference publishes per frame (src/Tracker.cc:293-332) — while the
    production path fuses everything into one device program.

    cam_active: optional (C,) bool — cameras absent from this frame (sensor
    dropout) contribute no measurements, no rotation vote, and keep their
    previous SBI; the reference tolerates arbitrary camera subsets per
    frame structurally (src/Tracker.cc:286-316)."""
    C = feats.atlas.shape[0]
    if cam_active is None:
        cam_active = jnp.ones((C,), bool)

    # ---- 1. motion model
    sbi_rot, have_rot = _stage_sbi(
        ts, feats, cams_sbi, ms.cam_from_base, tcfg, cam_active
    )
    pose_pred = _stage_motion(ts, sbi_rot, have_rot)

    # ---- 2+3. PVS + coarse stage
    pvs = _stage_pvs(ms, cams, pose_pred, cam_active)
    pose_after_coarse, do_coarse = _stage_coarse(
        None, ms, cams, feats, pvs, pose_pred, tcfg
    )

    # ---- 4. fine stage
    fine = _stage_fine(ms, cams, feats, pvs, pose_after_coarse, do_coarse,
                       tcfg)
    f_cam, f_pt, f_lvl, f_ok = (
        fine["cam"], fine["pt"], fine["lvl"], fine["ok"]
    )
    ff_found, ff_pos, ff_sub = fine["found"], fine["pos"], fine["sub"]

    # ---- 5. pose solve
    pose_new, cov, outlier = _stage_pose(
        ms, cams, pose_after_coarse, fine, tcfg
    )

    # ---- 6. scene depth + quality + state update
    return _stage_finalize(ts, ms, feats, pose_new, cov, fine, outlier,
                           sbi_rot, tcfg, cam_active)


def _stage_finalize(ts: TrackerState, ms: MapState, feats: FrameFeatures,
                    pose_new: SE3, cov, fine, outlier, sbi_rot,
                    tcfg: TrackerConfig, cam_active):
    """Stage 6 (TrackerTiming.depth): per-camera robust scene depth,
    quality grading, lost counter, motion-model update
    (src/Tracker.cc:1076-1151 depth; AssessTrackingQuality :1576-1658).
    Returns (ts_new, TrackResult)."""
    C = feats.atlas.shape[0]
    f_cam, f_pt, f_lvl, f_ok = (
        fine["cam"], fine["pt"], fine["lvl"], fine["ok"]
    )
    ff_found, ff_pos, ff_sub = fine["found"], fine["pos"], fine["sub"]

    # ---- scene depth per camera from found fine points
    cfb = ms.cam_from_base
    p_base = pose_new.apply(ms.points.pos_w[f_pt])
    p_cam = jnp.einsum("kij,kj->ki", cfb.R[f_cam], p_base) + cfb.t[f_cam]
    depth = jnp.linalg.norm(p_cam, axis=-1)
    cam_onehot = jax.nn.one_hot(f_cam, C, axis=0) > 0  # (C,K)
    depth_mask = cam_onehot & ff_found[None, :]
    mean_depth, depth_sigma = robust_mean_depth(
        jnp.broadcast_to(depth[None, :], depth_mask.shape), depth_mask
    )

    # ---- 6. quality (ref AssessTrackingQuality, src/Tracker.cc:1613-1658)
    f_okf = f_ok.astype(jnp.float32)
    ff_foundf = ff_found.astype(jnp.float32)
    attempted = jnp.zeros((C,)).at[f_cam].add(f_okf)
    found_per_cam = jnp.zeros((C,)).at[f_cam].add(ff_foundf)
    # large-level (>= 2) tallies drive the BAD cut when enough large
    # patches were attempted; otherwise fall back to the total fraction
    large = (f_lvl >= 2).astype(jnp.float32)
    large_att = jnp.zeros((C,)).at[f_cam].add(f_okf * large)
    large_found = jnp.zeros((C,)).at[f_cam].add(ff_foundf * large)
    total_frac = found_per_cam / jnp.maximum(attempted, 1.0)
    large_frac = jnp.where(
        large_att > tcfg.coarse_min,
        large_found / jnp.maximum(large_att, 1.0),
        total_frac,
    )
    q_cam = jnp.where(
        total_frac > tcfg.quality_good,
        QUALITY_GOOD,
        jnp.where(large_frac < tcfg.quality_bad, QUALITY_BAD, QUALITY_DODGY),
    )
    # min-found gate: nTotalFound < snMinPatchesPerFrame -> BAD
    q_cam = jnp.where(
        found_per_cam < tcfg.min_patches_per_frame, QUALITY_BAD, q_cam
    )
    quality = jnp.min(q_cam)  # overall = best camera (ref: overall max grade)
    # DODGY demotes to BAD when the pose ran excessively far from the
    # nearest MKF (ref AssessOverallTrackingQuality + MapMakerClientBase::
    # IsDistanceToNearestMultiKeyFrameExcessive, src/Tracker.cc:1589-1596,
    # src/MapMakerClientBase.cc:203-211: distance scaled by the CLOSEST
    # MKF's scene depth, limit = 3 x sdMaxScaledMKFDist)
    from mcptam_tpu.map.state import closest_mkf_distance
    has_depth = (found_per_cam > 0).astype(jnp.float32)
    cur_depth = jnp.sum(mean_depth * has_depth) / jnp.maximum(
        jnp.sum(has_depth), 1.0
    )
    d_near, ci = closest_mkf_distance(ms, pose_new, cur_depth)
    closest_depth = jnp.sum(
        jnp.where(ms.mkfs.kf_valid[ci], ms.mkfs.scene_depth_mean[ci], 0.0)
    ) / jnp.maximum(jnp.sum(ms.mkfs.kf_valid[ci].astype(jnp.float32)), 1.0)
    excessive = (
        d_near / jnp.maximum(closest_depth, 1e-6) > tcfg.excessive_mkf_dist
    )
    quality = jnp.where(
        (quality == QUALITY_DODGY) & excessive, QUALITY_BAD, quality
    )
    # lost counter: +1 on BAD (clamped at the threshold), -1 on GOOD
    # (clamped at 0), unchanged on DODGY (src/Tracker.cc:1597-1609)
    lost_count = jnp.where(
        quality == QUALITY_BAD,
        jnp.minimum(ts.lost_count + 1, tcfg.lost_frame_thresh),
        jnp.where(
            quality == QUALITY_GOOD,
            jnp.maximum(ts.lost_count - 1, 0),
            ts.lost_count,
        ),
    ).astype(jnp.int32)
    lost = lost_count >= tcfg.lost_frame_thresh

    # ---- motion model update (ref UpdateMotionModel)
    delta = (pose_new @ ts.pose.inv()).ln()
    new_vel = 0.9 * delta
    new_vel = jnp.where(lost, jnp.zeros(6), new_vel)

    keep = cam_active[:, None, None]
    ts_new = ts.replace(
        pose=pose_new,
        vel=new_vel,
        sbi_prev=jnp.where(keep, feats.sbi, ts.sbi_prev),
        sbi_prev_gx=jnp.where(keep, feats.sbi_gx, ts.sbi_prev_gx),
        sbi_prev_gy=jnp.where(keep, feats.sbi_gy, ts.sbi_prev_gy),
        have_prev=jnp.ones((), bool),
        lost_count=lost_count,
        quality=quality.astype(jnp.int32),
    )
    result = TrackResult(
        pose=pose_new,
        cov=cov,
        sel_point=f_pt,
        sel_cam=f_cam,
        sel_level=f_lvl,
        sel_pos_l0=ff_pos,
        sel_found=ff_found,
        sel_outlier=outlier,
        sel_subpix=ff_sub,
        num_found=found_per_cam,
        num_attempted=attempted,
        mean_depth=mean_depth,
        depth_sigma=depth_sigma,
        quality=quality.astype(jnp.int32),
        quality_per_cam=q_cam.astype(jnp.int32),
        lost=lost,
        sbi_rot=sbi_rot,
        tot_found=jnp.sum(ff_found),
    )
    return ts_new, result


def apply_tracker_point_stats(ms: MapState, result: TrackResult,
                              min_outliers: int = 20,
                              outlier_multiplier: float = 1.0,
                              enable=True) -> MapState:
    """Fold tracker in/outlier tallies into the map and flag bad points
    (ref MapMakerClientBase::MarkOutliers, src/MapMakerClientBase.cc:73-94).

    enable: traced bool — False makes this a no-op, so it can live inside
    a fused jitted step gated on the lost flag."""
    pts = ms.points
    inl = result.sel_found & ~result.sel_outlier & enable
    in_count = pts.in_count.at[result.sel_point].add(inl.astype(jnp.int32))
    out_count = pts.out_count.at[result.sel_point].add(
        (result.sel_outlier & enable).astype(jnp.int32)
    )
    bad = pts.bad | (
        (out_count > min_outliers)
        & (out_count.astype(jnp.float32)
           > outlier_multiplier * in_count.astype(jnp.float32))
        & pts.valid & ~pts.fixed
    )
    return ms.replace(
        points=pts.replace(in_count=in_count, out_count=out_count, bad=bad)
    )
