"""Extrinsic rig calibration test: recover cam-from-base poses of a
2-camera rig from shared synthetic checkerboard views."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3, so3_exp
from mcptam_tpu.core.camera import make_camera, stack_cameras, project
from mcptam_tpu.calib.board import inner_corner_points
from mcptam_tpu.calib.extrinsic import calibrate_rig, board_pose_pnp

H, W = 240, 320
PARAMS = np.array([95.0, -0.0045, 3.0e-6, -6.0e-9, 163.0, 122.0, 1.0, 0.0, 0.0])
SQUARES = (8, 6)
SQ = 0.04

TRUE_REL = SE3(
    R=so3_exp(jnp.asarray([0.02, 0.35, -0.03])),
    t=jnp.asarray([-0.21, 0.02, 0.05]),
)  # cam1_from_cam0


def make_obs(rng):
    """Synthesize detected corners: project true board corners through the
    true poses with tiny noise (detection is tested elsewhere)."""
    cam = make_camera(PARAMS, (W, H))
    cams = stack_cameras([cam, cam])
    board3 = inner_corner_points(SQUARES, SQ).reshape(-1, 3)
    board2 = board3[:, :2]

    obs = {}
    true_frames = []
    for f in range(6):
        w = rng.normal(size=3) * 0.25 + np.array([3.05, 0, 0])
        t = np.array([0.10, 0.08, 0.0]) + rng.normal(size=3) * np.array([0.05, 0.04, 0.0]) + np.array([0, 0, 0.35 + 0.12 * f % 3])
        T0 = SE3(R=so3_exp(jnp.asarray(w, jnp.float32)), t=jnp.asarray(t, jnp.float32)).inv()  # cam0_from_board
        true_frames.append(T0)
        for c, rel in ((0, SE3.identity()), (1, TRUE_REL)):
            Tc = rel @ T0
            pc = Tc.apply(jnp.asarray(board3, jnp.float32))
            uv, ok = project(cam, pc)
            uv = np.asarray(uv)
            okn = np.asarray(ok)
            if okn.sum() < 12:
                continue
            noise = rng.normal(size=uv.shape) * 0.05
            obs[(f, c)] = dict(
                uv=(uv + noise)[okn], board_idx=np.nonzero(okn)[0]
            )
    return cams, obs, board2, true_frames


def test_board_pose_pnp(rng):
    cams, obs, board2, true_frames = make_obs(rng)
    o = obs[(0, 0)]
    out = board_pose_pnp(PARAMS, board2[o["board_idx"]], o["uv"], (W, H))
    assert out is not None
    R, t = out
    T_true = true_frames[0]
    err_R = np.linalg.norm(np.asarray(so3_exp(jnp.zeros(3))) - R @ np.asarray(T_true.R).T)
    assert np.allclose(R, np.asarray(T_true.R), atol=0.02), R
    assert np.allclose(t, np.asarray(T_true.t), atol=0.02), (t, T_true.t)


def test_calibrate_rig(rng):
    cams, obs, board2, true_frames = make_obs(rng)
    cam_from_base, base_poses, st = calibrate_rig(
        [PARAMS, PARAMS], obs, board2, (W, H), cams
    )
    rel = cam_from_base[1]
    err = np.asarray((rel @ TRUE_REL.inv()).ln())
    assert np.linalg.norm(err[3:]) < 0.005, err   # rotation within 0.3 deg
    assert np.linalg.norm(err[:3]) < 0.01, err    # translation within 1 cm
