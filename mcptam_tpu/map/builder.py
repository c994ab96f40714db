"""Map mutation primitives: committing keyframes, points, measurements.

These are the functional equivalents of the reference's object insertions
(Map::AddPoint / MultiKeyFrame construction / KeyFrame::AddMeasurement):
pure functions MapState -> MapState with masked scatters.  Used by the map
maker (real point creation) and by tests (ground-truth map building).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel, unproject
from mcptam_tpu.core.levels import level_zero_pos
from mcptam_tpu.map.keyframe import FrameFeatures
from mcptam_tpu.map.state import (
    MapState, alloc_slots, refresh_pixel_vectors, SRC_ROOT,
)


def commit_mkf(ms: MapState, feats: FrameFeatures, base_from_world: SE3,
               kf_valid=None, fixed=False):
    """Write a frame into the first free MKF slot.  Returns (ms, idx, ok).

    Stores uint8 pyramid + corner atlases, SBI (+grads) and the base pose
    (reference: MultiKeyFrame handed to the map maker,
    src/MapMakerServerBase.cc:346-404)."""
    mkfs = ms.mkfs
    C = mkfs.kf_valid.shape[1]
    free = ~mkfs.valid
    idx = jnp.argmax(free)         # first free slot
    ok = jnp.any(free)
    if kf_valid is None:
        kf_valid = jnp.ones((C,), bool)

    def set_at(arr, val):
        return arr.at[idx].set(jnp.where(ok, val, arr[idx]))

    new_base = jax.tree_util.tree_map(
        lambda a, v: a.at[idx].set(jnp.where(ok, v, a[idx])),
        mkfs.base_from_world, base_from_world,
    )
    mkfs = mkfs.replace(
        base_from_world=new_base,
        valid=mkfs.valid.at[idx].set(ok | mkfs.valid[idx]),
        fixed=set_at(mkfs.fixed, jnp.asarray(fixed)),
        kf_valid=set_at(mkfs.kf_valid, kf_valid),
        atlas=set_at(
            mkfs.atlas, jnp.clip(feats.atlas, 0, 255).astype(jnp.uint8)
        ),
        corner_atlas=set_at(
            mkfs.corner_atlas, (feats.corner_atlas > 0.5).astype(jnp.uint8)
        ),
        sbi=set_at(mkfs.sbi, feats.sbi),
        sbi_gx=set_at(mkfs.sbi_gx, feats.sbi_gx),
        sbi_gy=set_at(mkfs.sbi_gy, feats.sbi_gy),
        seq=set_at(mkfs.seq, ms.next_seq),
    )
    return ms.replace(mkfs=mkfs, next_seq=ms.next_seq + 1), idx, ok


def add_points(ms: MapState, cams: CameraModel, mkf_idx, cam_idx, level,
               xy_level, pos_w, want, fixed=None):
    """Create up to Q new points.

    cam_idx/level/xy_level (Q,)/(Q,)/(Q,2): source camera, pyramid level and
    level coords of the patch center in keyframe ``mkf_idx``;
    pos_w (Q,3): world positions; want (Q,): which requests are real.

    Sets the patch-warp metadata exactly as the reference does on point
    creation (MapPoint fields mv3Center_NC / OneRightFromCenter_NC / ...,
    filled in src/MapMakerServerBase.cc point creation sites) and appends a
    ROOT measurement per point.  Returns (ms, slot_idx, ok)."""
    pts = ms.points
    Q = want.shape[0]
    slot, ok = alloc_slots(~pts.valid, want)

    # unit rays at the patch center and one-pixel offsets (level-0 coords)
    cam_q = jax.tree_util.tree_map(lambda a: a[cam_idx], cams)
    lvlf = level.astype(jnp.float32)
    xy0 = level_zero_pos(xy_level, lvlf[:, None])
    scale = (2.0 ** lvlf)[:, None]
    center_nc = unproject(cam_q, xy0)
    right_nc = unproject(cam_q, xy0 + jnp.stack(
        [scale[:, 0], jnp.zeros(Q)], -1))
    down_nc = unproject(cam_q, xy0 + jnp.stack(
        [jnp.zeros(Q), scale[:, 0]], -1))

    if fixed is None:
        fixed = jnp.zeros(Q, bool)

    # snapshot the source patch window from the (already committed) source
    # keyframe — the patch source is immutable (reference
    # MapPoint::mpPatchSourceKF + irCenter), so the tracker's template
    # generation never needs the full KF atlas store again
    from mcptam_tpu.config import SRC_WINDOW
    from mcptam_tpu.ops.batch_patch import gather_windows4, _SRC_HALF
    cxi = jnp.floor(xy_level[:, 0]).astype(jnp.int32)
    cyi = jnp.floor(xy_level[:, 1]).astype(jnp.int32)
    src_win, win_ok = gather_windows4(
        ms.mkfs.atlas, jnp.broadcast_to(mkf_idx, (Q,)).astype(jnp.int32),
        cam_idx.astype(jnp.int32), level.astype(jnp.int32),
        cyi - _SRC_HALF, cxi - _SRC_HALF, SRC_WINDOW,
    )
    src_win_u8 = jnp.clip(src_win, 0, 255).astype(jnp.uint8)

    def sc(arr, val):
        """Masked scatter at slot."""
        return arr.at[slot].set(
            jnp.where(ok.reshape((-1,) + (1,) * (val.ndim - 1)), val, arr[slot])
        )

    pts = pts.replace(
        pos_w=sc(pts.pos_w, pos_w),
        src_window=sc(pts.src_window, src_win_u8),
        src_window_ok=sc(pts.src_window_ok, win_ok),
        valid=pts.valid.at[slot].set(ok | pts.valid[slot]),
        bad=sc(pts.bad, jnp.zeros(Q, bool)),
        fixed=sc(pts.fixed, fixed),
        optimized=sc(pts.optimized, jnp.zeros(Q, bool)),
        src_mkf=sc(pts.src_mkf, jnp.broadcast_to(mkf_idx, (Q,)).astype(jnp.int32)),
        src_cam=sc(pts.src_cam, cam_idx.astype(jnp.int32)),
        src_level=sc(pts.src_level, level.astype(jnp.int32)),
        center_xy=sc(pts.center_xy, xy_level.astype(jnp.float32)),
        center_nc=sc(pts.center_nc, center_nc),
        right_nc=sc(pts.right_nc, right_nc),
        down_nc=sc(pts.down_nc, down_nc),
        in_count=sc(pts.in_count, jnp.zeros(Q, jnp.int32)),
        out_count=sc(pts.out_count, jnp.zeros(Q, jnp.int32)),
    )
    ms = ms.replace(points=pts)
    ms = add_measurements(
        ms,
        mkf=jnp.broadcast_to(mkf_idx, (Q,)).astype(jnp.int32),
        cam=cam_idx.astype(jnp.int32),
        point=slot,
        level=level.astype(jnp.int32),
        uv_l0=xy0,
        want=ok,
        source=jnp.full((Q,), SRC_ROOT, jnp.int32),
        subpix=jnp.ones(Q, bool),
    )
    ms = refresh_pixel_vectors(ms)
    return ms, slot, ok


def add_measurements(ms: MapState, mkf, cam, point, level, uv_l0, want,
                     source, subpix):
    """Append measurements into free slots (masked)."""
    meas = ms.meas
    slot, ok = alloc_slots(~meas.valid, want)

    def sc(arr, val):
        return arr.at[slot].set(
            jnp.where(ok.reshape((-1,) + (1,) * (val.ndim - 1)), val, arr[slot])
        )

    meas = meas.replace(
        mkf=sc(meas.mkf, mkf),
        cam=sc(meas.cam, cam),
        point=sc(meas.point, point),
        level=sc(meas.level, level),
        uv_l0=sc(meas.uv_l0, uv_l0),
        valid=meas.valid.at[slot].set(ok | meas.valid[slot]),
        source=sc(meas.source, source),
        subpix=sc(meas.subpix, subpix),
    )
    return ms.replace(meas=meas)
