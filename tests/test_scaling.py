"""Scaling-axis tests (SURVEY §5): camera count and map size.

The reference's per-frame loops are per-camera and independent up to the
shared pose WLS (src/Tracker.cc:1405-1496), capped at the 8-slot
synchronizer (include/mcptam/CameraGroupSubscriber.h:144-146); map size is
bounded per frame by the PVS cap (snMaxPatchesPerFrame=1000,
src/Tracker.cc:874-884).  Here both are leading-axis / capacity knobs —
these tests pin that the batched design really is general in them.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state

SEED = 3.0


def _track(cams, cfb, cams_sbi, ms, tcfg, pose_true, H, W):
    images = render_rig(cams, cfb, pose_true, SEED, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(int(cfb.t.shape[0]))
    ts2, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
    return ts2, res


@pytest.mark.slow
def test_eight_camera_rig():
    # the reference's synchronizer cap: 8 cameras per group
    H, W, C = 120, 160, 8
    cams, cfb = make_rig(C, H, W, spread_deg=20.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    ms, _ = build_groundtruth_map(
        cams, cfb, H, W, n_per_level=20,
        max_points=1024, max_mkfs=4, max_meas=8192,
    )
    tcfg = TrackerConfig(max_patches_per_frame=256, coarse_max=16,
                         coarse_min=6)
    pose_true = SE3.exp(jnp.asarray([0.03, -0.02, 0.02, 0.01, -0.01, 0.005]))
    ts2, res = _track(cams, cfb, cams_sbi, ms, tcfg, pose_true, H, W)
    terr = float(jnp.linalg.norm(ts2.pose.t - pose_true.t))
    assert terr < 0.03, terr
    # every camera contributed measurements to the shared pose solve
    found_cam = np.asarray(res.sel_cam)[np.asarray(res.sel_found)]
    assert len(np.unique(found_cam)) == C, np.unique(found_cam)


@pytest.mark.slow
def test_large_map_pvs_cap():
    # a map far above the per-frame patch budget: the PVS top-K cap keeps
    # the frame cost bounded (ref snMaxPatchesPerFrame) while tracking
    # stays accurate
    H, W, C = 240, 320, 2
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    ms, _ = build_groundtruth_map(
        cams, cfb, H, W, n_per_level=200,
        max_points=8192, max_mkfs=4, max_meas=16384,
    )
    n_pts = int(jnp.sum(ms.points.valid))
    assert n_pts > 600, n_pts  # well above the per-frame budget below
    tcfg = TrackerConfig(max_patches_per_frame=300, coarse_max=20,
                         coarse_min=6)
    pose_true = SE3.exp(jnp.asarray([0.04, 0.0, 0.025, 0.0, 0.015, 0.0]))
    ts2, res = _track(cams, cfb, cams_sbi, ms, tcfg, pose_true, H, W)
    terr = float(jnp.linalg.norm(ts2.pose.t - pose_true.t))
    assert terr < 0.03, terr
    # the budget is respected: attempted searches <= cap
    n_sel = int(jnp.sum(res.sel_point >= 0))
    assert n_sel <= tcfg.max_patches_per_frame + tcfg.coarse_max
