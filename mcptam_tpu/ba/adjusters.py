"""Bundle-adjuster variants: problem extraction from MapState + writeback.

The reference's BundleAdjusterBase/Multi/Single/Calib
(src/BundleAdjusterBase.cc, src/BundleAdjusterMulti.cc,
src/BundleAdjusterSingle.cc, src/BundleAdjusterCalib.cc) select which
MKFs/points enter the optimization and how poses are parameterized, then
drive ChainBundle.  Here each variant is a pure function MapState ->
BundleProblem plus a writeback MapState <- LMState:

  * :func:`problem_all` — global BA: every valid MKF (first fixed), every
    point with >= 2 valid measurements (BundleAdjustAll,
    src/BundleAdjusterBase.cc:141-184);
  * :func:`problem_recent` — local BA: newest MKF + snRecentNum closest
    movable neighbors; other observing MKFs enter fixed
    (BundleAdjustRecent, src/BundleAdjusterBase.cc:188-265);
  * :func:`problem_calib` — shared movable cam-from-base extrinsics
    (camera 0 fixed), as BundleAdjusterCalib;
  * :func:`writeback` — poses/points back into the map, scene depths and
    pixel vectors refreshed, optimized flags set
    (AdjustAndUpdate, src/BundleAdjusterMulti.cc:267-337);
  * :func:`apply_outliers` — measurement invalidation + point failure
    bookkeeping (HandleOutliers, src/MapMakerServerBase.cc:1198-1247).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.map.state import (
    MapState, refresh_pixel_vectors, refresh_scene_depths, mkf_distance,
)
from mcptam_tpu.ba.bundle import BundleProblem, LMState


def _meas_counts_per_point(ms: MapState):
    L = ms.points.capacity
    ok = ms.meas.valid & ms.points.valid[ms.meas.point]
    return jnp.zeros(L, jnp.int32).at[ms.meas.point].add(ok.astype(jnp.int32))


def _base_problem(ms: MapState, movable_a, movable_b, movable_pt):
    return BundleProblem(
        pose_a=ms.mkfs.base_from_world,
        pose_b=ms.cam_from_base,
        movable_a=movable_a,
        movable_b=movable_b,
        points=ms.points.pos_w,
        movable_pt=movable_pt,
        m_pose_a=ms.meas.mkf,
        m_pose_b=ms.meas.cam,
        m_point=ms.meas.point,
        m_cam=ms.meas.cam,
        m_uv=ms.meas.uv_l0,
        m_level=ms.meas.level,
        m_valid=ms.meas.valid
        & ms.points.valid[ms.meas.point]
        & ~ms.points.bad[ms.meas.point]
        & ms.mkfs.valid[ms.meas.mkf],
        pt_src_a=ms.points.src_mkf,
        pt_src_b=ms.points.src_cam,
    )


def problem_all(ms: MapState) -> BundleProblem:
    """Global BA: all valid MKFs movable except the first (and any flagged
    fixed); points need >= 2 measurements."""
    first = jnp.argmax(ms.mkfs.valid)
    movable_a = ms.mkfs.valid & ~ms.mkfs.fixed
    movable_a = movable_a.at[first].set(False)
    C = ms.cam_from_base.t.shape[0]
    movable_b = jnp.zeros((C,), bool)
    counts = _meas_counts_per_point(ms)
    movable_pt = (
        ms.points.valid & ~ms.points.bad & ~ms.points.fixed & (counts >= 2)
    )
    return _base_problem(ms, movable_a, movable_b, movable_pt)


def problem_recent(ms: MapState, recent_num: int = 3) -> BundleProblem:
    """Local BA around the newest MKF: it + the recent_num closest valid
    MKFs are movable; every other MKF observing their points enters as
    fixed.  The problem is SCOPED to the local edge set (the reference
    restricts the graph to the adjust set's points and *their*
    measurements, src/BundleAdjusterBase.cc:188-265): measurements of
    points never observed by a movable MKF are masked out, so both the LM
    cost and the adaptive-Huber sigma see only the local edges."""
    newest = jnp.argmax(jnp.where(ms.mkfs.valid, ms.mkfs.seq, -1))
    pose_n = ms.mkfs.base_from_world[newest]
    depth_n = jnp.mean(ms.mkfs.scene_depth_mean[newest])
    M = ms.mkfs.capacity
    d = mkf_distance(ms, pose_n, depth_n, jnp.arange(M))
    d = jnp.where(ms.mkfs.valid & ~ms.mkfs.fixed, d, jnp.inf)
    d = d.at[newest].set(jnp.inf)
    first = jnp.argmax(ms.mkfs.valid)
    d = d.at[first].set(jnp.inf)  # first MKF stays fixed (gauge)
    order = jnp.argsort(d)
    movable_a = jnp.zeros(M, bool).at[newest].set(True)
    neighbor_ok = jnp.isfinite(jnp.sort(d))[:recent_num]
    movable_a = movable_a.at[order[:recent_num]].set(neighbor_ok)
    movable_a = movable_a & ms.mkfs.valid & ~ms.mkfs.fixed
    movable_a = movable_a.at[first].set(False)

    C = ms.cam_from_base.t.shape[0]
    movable_b = jnp.zeros((C,), bool)
    counts = _meas_counts_per_point(ms)
    # points observed by a movable MKF
    touched = jnp.zeros(ms.points.capacity, bool).at[ms.meas.point].max(
        ms.meas.valid & movable_a[ms.meas.mkf]
    )
    local_pt = (
        ms.points.valid & ~ms.points.bad & (counts >= 2) & touched
    )
    movable_pt = local_pt & ~ms.points.fixed
    prob = _base_problem(ms, movable_a, movable_b, movable_pt)
    return prob.replace(m_valid=prob.m_valid & local_pt[ms.meas.point])


# Static capacities of the compacted local problem: sized from the
# reference's own budgets — a local window of 1+snRecentNum MKFs, each
# contributing O(100s) of points (snMaxPatchesPerFrame=1000 measurements
# per frame); local LM cost becomes independent of the total map size.
LOCAL_POINTS = 1024
LOCAL_MEAS = 8192


def compact_problem(prob: BundleProblem, max_points: int = LOCAL_POINTS,
                    max_meas: int = LOCAL_MEAS) -> BundleProblem:
    """Gather a problem's active points + measurements into smaller static
    capacities (cumsum compaction, no sort).  Poses keep their index
    space.  The result carries `pt_index` / `m_index` maps back into the
    original arrays for writeback/outlier expansion.  Entries beyond
    capacity are dropped (the local window sized per LOCAL_* never
    approaches this in practice)."""
    L = prob.points.shape[0]
    K = prob.m_valid.shape[0]
    # points that matter: referenced by a valid measurement
    pt_used = jnp.zeros(L, bool).at[prob.m_point].max(prob.m_valid)
    prank = jnp.cumsum(pt_used.astype(jnp.int32)) - 1
    pslot = jnp.where(pt_used & (prank < max_points), prank, max_points)
    pt_index = (
        jnp.zeros(max_points + 1, jnp.int32)
        .at[pslot].set(jnp.arange(L, dtype=jnp.int32), mode="drop")[:max_points]
    )
    n_pt = jnp.minimum(jnp.sum(pt_used.astype(jnp.int32)), max_points)
    pt_ok = jnp.arange(max_points) < n_pt
    # old-id -> new-slot lookup (invalid -> max_points, masked via m_valid)
    lut = jnp.full(L, 0, jnp.int32).at[pt_index].set(
        jnp.arange(max_points, dtype=jnp.int32)
    )
    kept_pt = pt_used & (prank < max_points)

    m_ok = prob.m_valid & kept_pt[prob.m_point]
    mrank = jnp.cumsum(m_ok.astype(jnp.int32)) - 1
    mslot = jnp.where(m_ok & (mrank < max_meas), mrank, max_meas)
    m_index = (
        jnp.zeros(max_meas + 1, jnp.int32)
        .at[mslot].set(jnp.arange(K, dtype=jnp.int32), mode="drop")[:max_meas]
    )
    n_m = jnp.minimum(jnp.sum(m_ok.astype(jnp.int32)), max_meas)
    m_keep = jnp.arange(max_meas) < n_m

    return prob.replace(
        points=prob.points[pt_index],
        movable_pt=prob.movable_pt[pt_index] & pt_ok,
        m_pose_a=prob.m_pose_a[m_index],
        m_pose_b=prob.m_pose_b[m_index],
        m_point=lut[prob.m_point[m_index]],
        m_cam=prob.m_cam[m_index],
        m_uv=prob.m_uv[m_index],
        m_level=prob.m_level[m_index],
        m_valid=prob.m_valid[m_index] & m_keep,
        pt_src_a=None if prob.pt_src_a is None else prob.pt_src_a[pt_index],
        pt_src_b=None if prob.pt_src_b is None else prob.pt_src_b[pt_index],
        pt_index=pt_index,
        pt_index_ok=pt_ok,
        m_index=m_index,
        m_index_ok=m_keep,
    )


def problem_live_counts(prob: BundleProblem):
    """(points referenced by a valid measurement, valid measurements) —
    device scalars the scheduler fetches to pick compaction buckets."""
    L = prob.points.shape[0]
    pt_used = jnp.zeros(L, bool).at[prob.m_point].max(prob.m_valid)
    return jnp.sum(pt_used.astype(jnp.int32)), jnp.sum(
        prob.m_valid.astype(jnp.int32)
    )


def expand_outliers(prob: BundleProblem, outlier_mask, full_K: int):
    """Scatter a (possibly compacted) problem's outlier mask back onto the
    full measurement array."""
    if prob.m_index is None:
        return outlier_mask
    return jnp.zeros(full_K, bool).at[prob.m_index].max(
        outlier_mask & prob.m_index_ok
    )


def problem_single(ms: MapState) -> BundleProblem:
    """Independent-pose BA (BundleAdjusterSingle,
    src/BundleAdjusterSingle.cc:55-120): every valid, non-fixed MKF base
    moves freely.  Used by the pose-calibration map build, where the map
    holds one single-camera MKF per dropped keyframe with identity
    extrinsics, so each base IS an independent camera-from-world pose.
    Unlike problem_all the first MKF is NOT pinned: the board-anchored
    FIXED points carry the gauge (the reference sets mbFixed=false on the
    init MKF, src/MapMakerCalib.cc:72-80)."""
    movable_a = ms.mkfs.valid & ~ms.mkfs.fixed
    C = ms.cam_from_base.t.shape[0]
    movable_b = jnp.zeros((C,), bool)
    counts = _meas_counts_per_point(ms)
    movable_pt = (
        ms.points.valid & ~ms.points.bad & ~ms.points.fixed & (counts >= 2)
    )
    return _base_problem(ms, movable_a, movable_b, movable_pt)


def problem_calib(ms: MapState) -> BundleProblem:
    """Extrinsic-calibration BA: shared cam-from-base poses movable
    (camera 0 = reference, fixed), MKF bases movable except first
    (BundleAdjusterCalib, src/BundleAdjusterCalib.cc:88-308)."""
    first = jnp.argmax(ms.mkfs.valid)
    movable_a = ms.mkfs.valid & ~ms.mkfs.fixed
    movable_a = movable_a.at[first].set(False)
    C = ms.cam_from_base.t.shape[0]
    movable_b = jnp.ones((C,), bool).at[0].set(False)
    counts = _meas_counts_per_point(ms)
    movable_pt = (
        ms.points.valid & ~ms.points.bad & ~ms.points.fixed & (counts >= 1)
    )
    return _base_problem(ms, movable_a, movable_b, movable_pt)


def writeback(ms: MapState, prob: BundleProblem, st: LMState) -> MapState:
    """Apply converged poses/points to the map (AdjustAndUpdate,
    src/BundleAdjusterMulti.cc:267-337): movable MKF poses, movable point
    positions, optimized flags, then refresh pixel vectors + scene depths."""
    mvA = prob.movable_a
    base = ms.mkfs.base_from_world
    newR = jnp.where(mvA[:, None, None], st.pose_a.R, base.R)
    newt = jnp.where(mvA[:, None], st.pose_a.t, base.t)
    mkfs = ms.mkfs.replace(base_from_world=SE3(R=newR, t=newt))

    mvB = prob.movable_b
    cfb = ms.cam_from_base
    cfb = SE3(
        R=jnp.where(mvB[:, None, None], st.pose_b.R, cfb.R),
        t=jnp.where(mvB[:, None], st.pose_b.t, cfb.t),
    )

    mvL = prob.movable_pt
    if prob.pt_index is not None:
        # compacted problem: scatter points back through the index map
        mv = mvL & prob.pt_index_ok
        pos_w = ms.points.pos_w.at[prob.pt_index].set(
            jnp.where(mv[:, None], st.points,
                      ms.points.pos_w[prob.pt_index])
        )
        optimized = ms.points.optimized.at[prob.pt_index].max(mv)
        pts = ms.points.replace(pos_w=pos_w, optimized=optimized)
    else:
        pts = ms.points.replace(
            pos_w=jnp.where(mvL[:, None], st.points, ms.points.pos_w),
            optimized=ms.points.optimized | mvL,
        )
    ms = ms.replace(mkfs=mkfs, points=pts, cam_from_base=cfb)
    ms = refresh_pixel_vectors(ms)
    ms = refresh_scene_depths(ms)
    return ms


def apply_outliers(ms: MapState, outlier_mask) -> MapState:
    """Outlier-measurement routing (HandleOutliers,
    src/MapMakerServerBase.cc:1198-1247):

      * fixed points are exempt (counted, nothing happens);
      * a point whose measurement count (before removal) is <= 2, or whose
        ROOT measurement is the outlier, goes bad;
      * otherwise the measurement is removed and the pair routed by
        source — TRACKER/EPIPOLAR measurements enter the failure queue
        for a second chance, everything else (REFIND/TRAIL) is marked
        never-retry."""
    from mcptam_tpu.map.state import SRC_TRACKER, SRC_EPIPOLAR, SRC_ROOT
    meas = ms.meas
    pts = ms.points
    L = pts.capacity
    out = outlier_mask & meas.valid & ~pts.fixed[meas.point]
    counts_before = jnp.zeros(L, jnp.int32).at[meas.point].add(
        meas.valid.astype(jnp.int32)
    )
    kill = out & (
        (counts_before[meas.point] <= 2) | (meas.source == SRC_ROOT)
    )
    killed_pt = jnp.zeros(L, bool).at[meas.point].max(kill)
    # measurements of killed points stay until trash GC sweeps the point
    removed = out & ~killed_pt[meas.point]
    second_chance = removed & (
        (meas.source == SRC_TRACKER) | (meas.source == SRC_EPIPOLAR)
    )
    retry_q = ms.retry_queue.at[meas.mkf, meas.cam, meas.point].max(
        second_chance
    )
    no_retry = ms.no_retry.at[meas.mkf, meas.cam, meas.point].max(
        removed & ~second_chance
    )
    out_inc = jnp.zeros(L, jnp.int32).at[ms.meas.point].add(
        (outlier_mask & meas.valid).astype(jnp.int32)
    )
    pts = pts.replace(
        bad=pts.bad | (killed_pt & pts.valid & ~pts.fixed),
        out_count=pts.out_count + out_inc,
    )
    return ms.replace(
        meas=meas.replace(valid=meas.valid & ~removed),
        points=pts, retry_queue=retry_q, no_retry=no_retry,
    )
