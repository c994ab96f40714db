"""Trajectory evaluation metrics (ATE/RPE) + loop-trajectory drift.

The reference has no accuracy metrics (verification is visual, SURVEY §4);
these pin the rebuild's scoring tools and use them to bound drift over a
closed-loop trajectory through the full SLAM system.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.system.evaluate import (
    umeyama_alignment, ate_rmse, rpe, centers, evaluate_run,
)


def _poses_from_se3(se3_list):
    return np.stack([
        np.concatenate(
            [np.asarray(p.R), np.asarray(p.t)[:, None]], axis=1
        ) for p in se3_list
    ]).astype(np.float64)


def _random_traj(T, rng, step=0.1):
    poses = []
    for i in range(T):
        v = rng.normal(0, step, 6)
        v[3:] *= 0.3
        poses.append(SE3.exp(jnp.asarray(v * i, jnp.float32)))
    return poses


# build a rotation without scipy
def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(50, 3))
    s_true = 1.37
    R_true = _rot([0.2, -0.5, 1.0], 0.8)
    t_true = np.array([0.4, -1.2, 2.0])
    y = (s_true * (R_true @ x.T)).T + t_true
    s, R, t = umeyama_alignment(x, y)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_gauge_invariance(rng):
    # ATE with alignment must be ~0 for a gauge-transformed copy of the
    # same trajectory (monocular SLAM is scale/pose gauge-free)
    traj = _random_traj(12, rng)
    gt = _poses_from_se3(traj)
    Rg = _rot([1.0, 0.3, -0.2], 0.5)
    sg, tg = 1.8, np.array([2.0, -1.0, 0.5])
    # est centers = gauge(gt centers): build est poses with those centers
    c_gt = centers(gt)
    c_est = (sg * (Rg @ c_gt.T)).T + tg
    est = gt.copy()
    # keep rotations, set t so that -R^T t = c_est  =>  t = -R c_est
    for i in range(len(est)):
        est[i, :, 3] = -est[i, :, :3] @ c_est[i]
    out = ate_rmse(est, gt, align=True, with_scale=True)
    assert out["rmse"] < 1e-5, out  # float32 pose construction
    assert abs(out["scale"] - 1.0 / sg) < 1e-6
    # without alignment the error is large
    out_raw = ate_rmse(est, gt, align=False)
    assert out_raw["rmse"] > 0.5


def test_rpe_perfect_and_offset(rng):
    traj = _random_traj(10, rng)
    gt = _poses_from_se3(traj)
    out = rpe(gt, gt, delta=1)
    assert out["trans_rmse"] < 1e-12
    # float32 rotations: arccos near +1 is ill-conditioned (~0.01 deg noise)
    assert out["rot_rmse_deg"] < 0.05
    # constant global offset leaves RPE at zero (it measures drift)
    off = SE3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.05, 0.02, -0.04]))
    est = _poses_from_se3([
        SE3(R=p.R, t=p.t) @ off for p in traj
    ])
    out2 = rpe(est, gt, delta=1)
    assert out2["trans_rmse"] < 1e-4, out2


@pytest.mark.slow
def test_loop_trajectory_drift():
    """Closed-loop sweep: out and back over 16 frames through the full
    System; ATE stays bounded and the pose returns near the start."""
    from mcptam_tpu.config import TrackerConfig, MapMakerConfig
    from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, render_rig
    from mcptam_tpu.system.system import System

    H, W, C, SEED = 240, 320, 2, 3.0
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    sys_ = System(
        cams, cfb, cams_sbi, H, W,
        TrackerConfig(max_patches_per_frame=200, coarse_max=20, coarse_min=6),
        MapMakerConfig(init_depth=5.0, max_scaled_mkf_dist=0.04),
        max_points=2048, max_mkfs=16, max_meas=16384,
    )
    # out along a smooth arc for 8 frames, then retrace back to the start
    half = [
        SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
        for i in range(8)
    ]
    traj = half + half[::-1]
    infos = []
    for p in traj:
        images = render_rig(cams, cfb, p, SEED, H, W)
        infos.append(sys_.process_frame(images))
    gt = _poses_from_se3(traj)
    scores = evaluate_run(infos, gt)
    assert scores["lost_frames"] == 0, scores
    assert scores["ate"]["rmse"] < 0.03, scores
    assert scores["rpe"]["trans_rmse"] < 0.03, scores
    # loop closure: final pose back at the origin
    end_err = float(np.linalg.norm(infos[-1].pose[:, 3] - np.asarray(traj[-1].t)))
    assert end_err < 0.03, end_err
