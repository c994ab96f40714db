"""Functional map state: fixed-capacity struct-of-arrays replacing the
reference's pointer graph.

The reference Map (src/Map.cc) is std::lists of heap MapPoint/MultiKeyFrame
guarded by a mutex, with atomic refcounts and a deferred-deletion trash
(SURVEY §2.11(1)).  Under jit all of that dissolves into masked arrays: a
point/MKF/measurement is a slot; ``valid`` masks replace liveness, clearing
a mask bit replaces the trash GC, and "snapshotting under mutex" is just
functional-state semantics.

Capacities are construction-time static; keyframe imagery is stored as
uint8 pyramid *atlases* (see ops/atlas.py) plus FAST-corner indicator
atlases so the map-maker can re-run patch searches in old keyframes
(refinds, epipolar search) without recomputing features.

Reference objects -> arrays:
  MapPoint   (include/mcptam/MapPoint.h:92-161)  -> PointArrays
  MultiKeyFrame/KeyFrame (include/mcptam/KeyFrame.h)-> MKFArrays
  Measurement (include/mcptam/KeyFrame.h:100-117) -> MeasArrays
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mcptam_tpu import config as cfg
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.ops.atlas import atlas_width
from mcptam_tpu.config import SBI_SIZE

# Measurement sources (reference KeyFrame.h:100-117 enum)
SRC_TRACKER = 0
SRC_REFIND = 1
SRC_ROOT = 2
SRC_TRAIL = 3
SRC_EPIPOLAR = 4


@struct.dataclass
class PointArrays:
    pos_w: jnp.ndarray        # (N,3) world position
    valid: jnp.ndarray        # (N,) slot in use
    bad: jnp.ndarray          # (N,) flagged bad (pending deletion)
    fixed: jnp.ndarray        # (N,) e.g. calibration grid points
    optimized: jnp.ndarray    # (N,) has been through a BA at least once
    src_mkf: jnp.ndarray      # (N,) source keyframe ids
    src_cam: jnp.ndarray      # (N,)
    src_level: jnp.ndarray    # (N,)
    center_xy: jnp.ndarray    # (N,2) source-level patch center
    src_window: jnp.ndarray   # (N,SW,SW) uint8 source patch window, fixed at
                              # creation (the reference's patch source is
                              # likewise immutable: MapPoint::mpPatchSourceKF
                              # + irCenter, include/mcptam/MapPoint.h:104-110).
                              # Storing it per point keeps the tracker's
                              # working set free of the full KF atlas store.
    src_window_ok: jnp.ndarray  # (N,) window fully inside the source atlas
    center_nc: jnp.ndarray    # (N,3) unit ray of center in source cam frame
    right_nc: jnp.ndarray     # (N,3) unit ray one pixel right
    down_nc: jnp.ndarray      # (N,3) unit ray one pixel down
    pixel_right_w: jnp.ndarray  # (N,3) world-frame pixel footprint (refreshed)
    pixel_down_w: jnp.ndarray   # (N,3)
    in_count: jnp.ndarray     # (N,) tracker inlier tally (MapPoint.h:134-139)
    out_count: jnp.ndarray    # (N,)

    @property
    def capacity(self):
        return self.valid.shape[0]


@struct.dataclass
class MKFArrays:
    base_from_world: SE3      # (M,) batched
    valid: jnp.ndarray        # (M,)
    fixed: jnp.ndarray        # (M,)
    kf_valid: jnp.ndarray     # (M,C) camera present in this MKF
    scene_depth_mean: jnp.ndarray   # (M,C)
    scene_depth_sigma: jnp.ndarray  # (M,C)
    atlas: jnp.ndarray        # (M,C,H,AW) uint8 pyramid atlases
    corner_atlas: jnp.ndarray  # (M,C,H,AW) uint8 0/1 FAST-corner maps
    sbi: jnp.ndarray          # (M,C,ROWS,COLS) f32 blurred templates
    sbi_gx: jnp.ndarray       # (M,C,ROWS,COLS)
    sbi_gy: jnp.ndarray       # (M,C,ROWS,COLS)
    seq: jnp.ndarray          # (M,) insertion sequence number (-1 = none)

    @property
    def capacity(self):
        return self.valid.shape[0]


@struct.dataclass
class MeasArrays:
    mkf: jnp.ndarray     # (K,)
    cam: jnp.ndarray     # (K,)
    point: jnp.ndarray   # (K,)
    level: jnp.ndarray   # (K,)
    uv_l0: jnp.ndarray   # (K,2) root-level (level-0) image position
    valid: jnp.ndarray   # (K,)
    source: jnp.ndarray  # (K,) SRC_*
    subpix: jnp.ndarray  # (K,) measured to subpixel accuracy

    @property
    def capacity(self):
        return self.valid.shape[0]


@struct.dataclass
class MapState:
    points: PointArrays
    mkfs: MKFArrays
    meas: MeasArrays
    cam_from_base: SE3        # (C,) rig extrinsics
    next_seq: jnp.ndarray     # scalar int32: next MKF sequence number
    # per-(KF, point) refind bookkeeping, replacing the reference's
    # MapMakerData::spNeverRetryKFs sets and mlFailureQueue
    # (src/MapMakerServerBase.cc:921-1003,1063-1080,1198-1247):
    no_retry: jnp.ndarray     # (M,C,N) pair failed a refind — never again
    retry_queue: jnp.ndarray  # (M,C,N) outlier pair awaiting a 2nd chance


def create_map_state(
    H: int,
    W: int,
    n_cams: int,
    cam_from_base: SE3,
    max_points: int = cfg.MAX_POINTS,
    max_mkfs: int = cfg.MAX_MKFS,
    max_meas: int = cfg.MAX_MEAS,
) -> MapState:
    N, M, K, C = max_points, max_mkfs, max_meas, n_cams
    AW = atlas_width(W)
    ROWS, COLS = SBI_SIZE
    f = jnp.zeros
    points = PointArrays(
        pos_w=f((N, 3)), valid=f(N, bool), bad=f(N, bool), fixed=f(N, bool),
        optimized=f(N, bool),
        src_mkf=f(N, jnp.int32), src_cam=f(N, jnp.int32),
        src_level=f(N, jnp.int32), center_xy=f((N, 2)),
        src_window=f((N, cfg.SRC_WINDOW, cfg.SRC_WINDOW), jnp.uint8),
        src_window_ok=f(N, bool),
        center_nc=f((N, 3)), right_nc=f((N, 3)), down_nc=f((N, 3)),
        pixel_right_w=f((N, 3)), pixel_down_w=f((N, 3)),
        in_count=f(N, jnp.int32), out_count=f(N, jnp.int32),
    )
    mkfs = MKFArrays(
        base_from_world=SE3.identity((M,)),
        valid=f(M, bool), fixed=f(M, bool), kf_valid=f((M, C), bool),
        scene_depth_mean=jnp.full((M, C), 1.0),
        scene_depth_sigma=jnp.full((M, C), 1.0),
        atlas=f((M, C, H, AW), jnp.uint8),
        corner_atlas=f((M, C, H, AW), jnp.uint8),
        sbi=f((M, C, ROWS, COLS)), sbi_gx=f((M, C, ROWS, COLS)),
        sbi_gy=f((M, C, ROWS, COLS)),
        seq=jnp.full((M,), -1, jnp.int32),
    )
    meas = MeasArrays(
        mkf=f(K, jnp.int32), cam=f(K, jnp.int32), point=f(K, jnp.int32),
        level=f(K, jnp.int32), uv_l0=f((K, 2)), valid=f(K, bool),
        source=f(K, jnp.int32), subpix=f(K, bool),
    )
    return MapState(
        # own a fresh COPY of the extrinsics: MapState is donated through
        # the fused tracker step (System._step_fn donate_argnums), and
        # aliasing the caller's arrays would invalidate their buffers out
        # from under them on the first processed frame
        points=points, mkfs=mkfs, meas=meas,
        cam_from_base=jax.tree_util.tree_map(
            lambda a: jnp.array(a), cam_from_base
        ),
        next_seq=jnp.zeros((), jnp.int32),
        no_retry=f((M, C, N), bool),
        retry_queue=f((M, C, N), bool),
    )


# ---------------------------------------------------------------------------
# Slot allocation: scatter n new items into free slots
# ---------------------------------------------------------------------------

def alloc_slots(free: jnp.ndarray, want: jnp.ndarray):
    """Assign a free slot to each wanted item.

    free: (N,) bool — capacity mask of free slots;
    want: (Q,) bool — which of Q requests actually need a slot.

    Returns (slot_idx (Q,) int32, ok (Q,) bool).  Items that can't be
    placed (capacity exhausted) get ok=False and slot 0 (callers must mask
    their scatters with ok).
    """
    N = free.shape[0]
    # rank of each free slot among free slots
    free_i = jnp.where(free, jnp.arange(N), N)
    order = jnp.sort(free_i)  # free slot ids first, capacity padding after
    # rank of each wanted request among wanted
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    rank = jnp.where(want, rank, 0)
    slot = order[jnp.clip(rank, 0, N - 1)]
    ok = want & (slot < N) & (rank < jnp.sum(free))
    return slot.astype(jnp.int32), ok


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------

def kf_cam_from_world(ms: MapState) -> SE3:
    """(M,C) SE3: camera-from-world for every keyframe slot."""
    M = ms.mkfs.capacity
    C = ms.cam_from_base.t.shape[0]
    base = ms.mkfs.base_from_world  # (M,)
    cam = ms.cam_from_base          # (C,)
    R = jnp.einsum("cij,mjk->mcik", cam.R, base.R)
    t = jnp.einsum("cij,mj->mci", cam.R, base.t) + jnp.broadcast_to(
        cam.t[None], (M, C, 3)
    )
    return SE3(R=R, t=t)


def refresh_pixel_vectors(ms: MapState) -> MapState:
    """Recompute every point's world-frame pixel footprint vectors from its
    current world position (MapPoint::RefreshPixelVectors,
    src/MapPoint.cc:61-87; patch plane assumed fronto-parallel in the
    source view, normal (0,0,-1))."""
    pts = ms.points
    kcw = kf_cam_from_world(ms)  # (M,C)
    src = jax.tree_util.tree_map(
        lambda a: a[pts.src_mkf, pts.src_cam], SE3(R=kcw.R, t=kcw.t)
    )  # (N,) SE3 of source cams
    p_c = src.apply(pts.pos_w)  # point in source cam frame
    cam_height = jnp.abs(p_c[..., 2])

    def on_plane(ray):
        rate = jnp.abs(ray[..., 2])
        rate = jnp.where(rate < 1e-9, 1e-9, rate)
        return ray * (cam_height / rate)[..., None]

    center_pl = on_plane(pts.center_nc)
    right_pl = on_plane(pts.right_nc)
    down_pl = on_plane(pts.down_nc)
    Rt = jnp.swapaxes(src.R, -1, -2)
    pr = jnp.einsum("nij,nj->ni", Rt, right_pl - center_pl)
    pd = jnp.einsum("nij,nj->ni", Rt, down_pl - center_pl)
    return ms.replace(points=pts.replace(pixel_right_w=pr, pixel_down_w=pd))


def point_depths_in_kf(ms: MapState, mkf_idx, cam_idx):
    """Depths (norm of cam-frame position) of all points in the given KF's
    frame + the points' validity.  Used by scene-depth refresh."""
    kcw = kf_cam_from_world(ms)
    pose = jax.tree_util.tree_map(lambda a: a[mkf_idx, cam_idx], SE3(R=kcw.R, t=kcw.t))
    p_c = pose.apply(ms.points.pos_w)
    return jnp.linalg.norm(p_c, axis=-1), p_c


def refresh_scene_depths(ms: MapState) -> MapState:
    """Robust per-KF scene depth from the measured points
    (KeyFrame::RefreshSceneDepthRobust, src/KeyFrame.cc:585-645): Huber
    weights around the median depth, weighted mean + sigma."""
    from mcptam_tpu.core import mest

    M = ms.mkfs.capacity
    C = ms.cam_from_base.t.shape[0]
    kcw = kf_cam_from_world(ms)
    # (M,C,N) depth of each point in each KF frame
    p_c = (
        jnp.einsum("mcij,nj->mcni", kcw.R, ms.points.pos_w)
        + kcw.t[:, :, None, :]
    )
    depths = jnp.linalg.norm(p_c, axis=-1)  # (M,C,N)

    # measurement mask (M,C,N) from the flat measurement list
    meas_ok = ms.meas.valid & ms.points.valid[ms.meas.point]
    mk = jnp.zeros((M, C, ms.points.capacity), bool)
    mk = mk.at[ms.meas.mkf, ms.meas.cam, ms.meas.point].max(meas_ok)

    flatd = depths.reshape(M * C, -1)
    flatm = mk.reshape(M * C, -1)
    med = mest.masked_median_bisect(flatd, flatm)
    dist_sq = (flatd - med[:, None]) ** 2
    sig_sq = jnp.maximum(mest.find_sigma_squared(dist_sq, flatm), 0.4)
    w = jnp.sqrt(mest.weight(mest.HUBER, dist_sq, sig_sq[:, None]))
    w = w * flatm
    sw = jnp.maximum(jnp.sum(w, axis=-1), 1e-9)
    mean = jnp.sum(w * flatd, axis=-1) / sw
    var = jnp.sum(w * flatd * flatd, axis=-1) / sw - mean * mean
    sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
    enough = jnp.sum(flatm, axis=-1) > 3
    old_mean = ms.mkfs.scene_depth_mean.reshape(-1)
    old_sig = ms.mkfs.scene_depth_sigma.reshape(-1)
    mean = jnp.where(enough, mean, old_mean).reshape(M, C)
    sigma = jnp.where(enough, sigma, old_sig).reshape(M, C)
    return ms.replace(
        mkfs=ms.mkfs.replace(scene_depth_mean=mean, scene_depth_sigma=sigma)
    )


def pose_depth_distance(pose_a: SE3, mean_depth_a, pose_b: SE3, depth_b):
    """Depth-aware distance between two base poses, following
    KeyFrame::Distance (src/KeyFrame.cc:715-747):
    |camPos diff| + 0.5 * |meanDepthPoint diff|.  pose_b/depth_b may be
    batched; used against map MKFs AND MKFs still in the map-maker queue
    (MapMakerClientBase::NeedNewMultiKeyFrame, src/MapMakerClientBase.cc:
    111-152)."""
    frac = 0.5  # sdDistanceMeanDiffFraction default
    a_inv = pose_a.inv()
    b_inv = pose_b.inv()
    d_cam = jnp.linalg.norm(b_inv.t - a_inv.t, axis=-1)
    pa = a_inv.apply(jnp.array([0.0, 0.0, 1.0]) * mean_depth_a)
    depth_b = jnp.asarray(depth_b)
    pb = b_inv.apply(
        jnp.stack([jnp.zeros_like(depth_b), jnp.zeros_like(depth_b), depth_b], -1)
    )
    d_mean = jnp.linalg.norm(pb - pa, axis=-1)
    return d_cam + frac * d_mean


def mkf_distance(ms: MapState, pose_a: SE3, mean_depth_a, idx_b):
    """pose_depth_distance between a query pose and MKF slot b."""
    pose_b = ms.mkfs.base_from_world[idx_b]
    depth_b = jnp.mean(
        jnp.where(ms.mkfs.kf_valid[idx_b], ms.mkfs.scene_depth_mean[idx_b], 0.0),
        axis=-1,
    ) / jnp.maximum(
        jnp.mean(ms.mkfs.kf_valid[idx_b].astype(jnp.float32), axis=-1), 1e-9
    )
    return pose_depth_distance(pose_a, mean_depth_a, pose_b, depth_b)


def kf_distance_table(ms: MapState, mkf_idx, cam_idx):
    """(M,C) depth-aware distances from the KF (mkf_idx, cam_idx) to every
    KF slot, following KeyFrame::Distance (src/KeyFrame.cc:715-747):
    |camPos diff| + 0.5 * |meanDepthPoint diff|, each KF contributing the
    point at its own robust scene depth along its optical axis."""
    frac = 0.5  # sdDistanceMeanDiffFraction default
    kcw = kf_cam_from_world(ms)              # (M,C)
    inv = kcw.inv()
    pos = inv.t                              # (M,C,3) camera centers
    depth = ms.mkfs.scene_depth_mean         # (M,C)
    z = jnp.zeros_like(depth)
    dpt = inv.apply(jnp.stack([z, z, depth], -1))  # (M,C,3)
    d_cam = jnp.linalg.norm(pos - pos[mkf_idx, cam_idx], axis=-1)
    d_mean = jnp.linalg.norm(dpt - dpt[mkf_idx, cam_idx], axis=-1)
    return d_cam + frac * d_mean


def closest_kf(ms: MapState, mkf_idx, cam_idx, region: str):
    """Closest valid KF to (mkf_idx, cam_idx) within a region
    (MapMakerBase::ClosestKeyFrame, src/MapMakerBase.cc:90-151):
    'other' = KFs of every OTHER MKF; 'self' = sibling KFs of the same MKF.
    Returns (tgt_mkf, tgt_cam, found)."""
    M = ms.mkfs.capacity
    C = ms.cam_from_base.t.shape[0]
    d = kf_distance_table(ms, mkf_idx, cam_idx)
    ok = ms.mkfs.valid[:, None] & ms.mkfs.kf_valid
    same_mkf = jnp.arange(M)[:, None] == mkf_idx
    if region == "other":
        ok = ok & ~same_mkf
    elif region == "self":
        ok = ok & same_mkf & (jnp.arange(C)[None, :] != cam_idx)
    else:
        ok = ok & ~(same_mkf & (jnp.arange(C)[None, :] == cam_idx))
    d = jnp.where(ok, d, jnp.inf)
    flat = jnp.argmin(d.reshape(-1))
    return (
        (flat // C).astype(jnp.int32),
        (flat % C).astype(jnp.int32),
        jnp.isfinite(d.reshape(-1)[flat]),
    )


def closest_mkf_distance(ms: MapState, pose: SE3, mean_depth):
    """Min depth-scaled distance to any valid MKF (MapMakerBase::
    ClosestMultiKeyFrame + the add heuristic's depth scaling,
    src/MapMakerClientBase.cc:111-152)."""
    M = ms.mkfs.capacity
    idx = jnp.arange(M)
    d = mkf_distance(ms, pose, mean_depth, idx)
    d = jnp.where(ms.mkfs.valid, d, jnp.inf)
    return jnp.min(d), jnp.argmin(d)


def count_points(ms: MapState):
    return jnp.sum(ms.points.valid & ~ms.points.bad)


def count_mkfs(ms: MapState):
    return jnp.sum(ms.mkfs.valid)


def move_bad_points_to_trash(ms: MapState) -> MapState:
    """Mask-clear bad points and their measurements (Map::
    MoveBadPointsToTrash + EmptyTrash collapse into one step — no
    refcounts needed under functional state, src/Map.cc)."""
    bad = ms.points.bad
    pts = ms.points.replace(
        valid=ms.points.valid & ~bad,
        bad=jnp.zeros_like(bad),
    )
    meas_dead = bad[ms.meas.point]
    meas = ms.meas.replace(valid=ms.meas.valid & ~meas_dead)
    # freed slots must not inherit stale refind bookkeeping when reused
    keep = ~bad[None, None, :]
    return ms.replace(
        points=pts, meas=meas,
        no_retry=ms.no_retry & keep,
        retry_queue=ms.retry_queue & keep,
    )
