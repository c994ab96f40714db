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
    fixed (encoded simply by leaving those poses immovable — all
    measurements participate, matching the reference's fixed set)."""
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
    movable_pt = (
        ms.points.valid & ~ms.points.bad & ~ms.points.fixed
        & (counts >= 2) & touched
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
    pts = ms.points.replace(
        pos_w=jnp.where(mvL[:, None], st.points, ms.points.pos_w),
        optimized=ms.points.optimized | mvL,
    )
    ms = ms.replace(mkfs=mkfs, points=pts, cam_from_base=cfb)
    ms = refresh_pixel_vectors(ms)
    ms = refresh_scene_depths(ms)
    return ms


def apply_outliers(ms: MapState, outlier_mask, max_meas_fraction: float = 0.5
                   ) -> MapState:
    """Invalidate outlier measurements; points losing their root/too many
    measurements are marked bad (HandleOutliers,
    src/MapMakerServerBase.cc:1198-1247, simplified: a point goes bad when
    < 2 valid measurements remain and it has been optimized)."""
    meas = ms.meas
    valid = meas.valid & ~outlier_mask
    meas = meas.replace(valid=valid)
    L = ms.points.capacity
    counts = jnp.zeros(L, jnp.int32).at[meas.point].add(valid.astype(jnp.int32))
    bad = ms.points.bad | (
        ms.points.valid & ~ms.points.fixed & ms.points.optimized & (counts < 2)
    )
    out_inc = jnp.zeros(L, jnp.int32).at[ms.meas.point].add(
        outlier_mask.astype(jnp.int32)
    )
    pts = ms.points.replace(bad=bad, out_count=ms.points.out_count + out_inc)
    return ms.replace(meas=meas, points=pts)
