"""Tracker integration tests on the synthetic scene: build a ground-truth
map from frame 0, then verify track_frame recovers known rig motions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import LEVELS, TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import unproject
from mcptam_tpu.core.levels import level_zero_pos
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, ray_depth,
)
from mcptam_tpu.map.state import create_map_state, refresh_scene_depths
from mcptam_tpu.map.builder import commit_mkf, add_points
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker.tracker import (
    track_frame, create_tracker_state, QUALITY_GOOD,
)

H, W = 240, 320
C = 2
SEED = 3.0

TEST_TCFG = TrackerConfig(
    max_patches_per_frame=200,
    coarse_max=20,
    coarse_min=6,
)


def build_world():
    cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    return cams, cam_from_base, cams_sbi


def build_gt_map(cams, cam_from_base, pose0, n_per_level=40):
    images = render_rig(cams, cam_from_base, pose0, SEED, H, W)
    feats = make_frame_features(images)
    ms = create_map_state(
        H, W, C, cam_from_base, max_points=1024, max_mkfs=4, max_meas=4096
    )
    ms, mkf_idx, ok = commit_mkf(ms, feats, pose0)
    assert bool(ok)
    for c in range(C):
        cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
        pose_c = cam_from_base[c] @ pose0
        for l in range(LEVELS):
            xy = feats.cand_xy[l][c][:n_per_level].astype(jnp.float32)
            want = feats.cand_valid[l][c][:n_per_level]
            xy0 = level_zero_pos(xy, float(l))
            rays = unproject(cam_c, xy0)
            depth = ray_depth(pose_c, rays)
            p_cam = rays * depth[:, None]
            pos_w = pose_c.inv().apply(p_cam)
            Q = xy.shape[0]
            ms, slot, ok2 = add_points(
                ms, cams,
                mkf_idx=mkf_idx,
                cam_idx=jnp.full((Q,), c, jnp.int32),
                level=jnp.full((Q,), l, jnp.int32),
                xy_level=xy,
                pos_w=pos_w,
                want=want,
            )
    ms = refresh_scene_depths(ms)
    return ms


@pytest.fixture(scope="module")
def world():
    cams, cam_from_base, cams_sbi = build_world()
    pose0 = SE3.identity()
    ms = build_gt_map(cams, cam_from_base, pose0)
    return cams, cam_from_base, cams_sbi, ms


def test_map_built(world):
    cams, cam_from_base, cams_sbi, ms = world
    n_pts = int(jnp.sum(ms.points.valid))
    assert n_pts > 100, n_pts
    assert int(jnp.sum(ms.mkfs.valid)) == 1
    assert int(jnp.sum(ms.meas.valid)) == n_pts


def test_track_static_frame(world):
    """Tracking the exact keyframe image from the exact pose must stay put
    and report good quality."""
    cams, cam_from_base, cams_sbi, ms = world
    images = render_rig(cams, cam_from_base, SE3.identity(), SEED, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(C)
    ts2, res = track_frame(ts, ms, cams, cams_sbi, feats, TEST_TCFG)
    err = np.linalg.norm(np.asarray(res.pose.ln()))
    assert err < 0.01, err
    assert int(res.quality) == QUALITY_GOOD
    assert float(res.tot_found) > 50


def test_track_translated_frame(world):
    """Small translation must be recovered to sub-cm accuracy."""
    cams, cam_from_base, cams_sbi, ms = world
    true_pose = SE3.exp(jnp.asarray([0.06, -0.03, 0.04, 0.0, 0.0, 0.0]))
    images = render_rig(cams, cam_from_base, true_pose, SEED, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(C)
    ts2, res = track_frame(ts, ms, cams, cams_sbi, feats, TEST_TCFG)
    err6 = np.asarray((res.pose @ true_pose.inv()).ln())
    assert np.linalg.norm(err6[:3]) < 0.01, err6
    assert np.linalg.norm(err6[3:]) < 0.01, err6


def test_track_rotated_frame(world):
    cams, cam_from_base, cams_sbi, ms = world
    true_pose = SE3.exp(jnp.asarray([0.0, 0.0, 0.0, 0.015, -0.02, 0.01]))
    images = render_rig(cams, cam_from_base, true_pose, SEED, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(C)
    ts2, res = track_frame(ts, ms, cams, cams_sbi, feats, TEST_TCFG)
    err6 = np.asarray((res.pose @ true_pose.inv()).ln())
    assert np.linalg.norm(err6) < 0.01, err6


def test_track_sequence_with_motion_model(world):
    """Track a short sequence; the motion model + SBI rotation must keep
    the tracker locked on with growing motion."""
    cams, cam_from_base, cams_sbi, ms = world
    ts = create_tracker_state(C)
    poses = []
    for i in range(4):
        v = jnp.asarray([0.02 * i, 0.0, 0.01 * i, 0.0, 0.012 * i, 0.0])
        poses.append(SE3.exp(v))
    errs = []
    for true_pose in poses:
        images = render_rig(cams, cam_from_base, true_pose, SEED, H, W)
        feats = make_frame_features(images)
        ts, res = track_frame(ts, ms, cams, cams_sbi, feats, TEST_TCFG)
        errs.append(np.linalg.norm(np.asarray((res.pose @ true_pose.inv()).ln())))
    assert max(errs) < 0.02, errs
    assert not bool(res.lost)


def test_track_quality_when_lost(world):
    """A wildly wrong map/pose (render far away) must not report GOOD."""
    cams, cam_from_base, cams_sbi, ms = world
    far_pose = SE3.exp(jnp.asarray([2.5, 2.0, -1.5, 0.0, 2.8, 0.4]))
    images = render_rig(cams, cam_from_base, far_pose, SEED + 9.0, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(C)
    ts2, res = track_frame(ts, ms, cams, cams_sbi, feats, TEST_TCFG)
    assert int(res.quality) != QUALITY_GOOD
