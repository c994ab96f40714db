"""Zero-overlap pose-calibration drive: a 2-camera rig with NO
simultaneous board view calibrates through the shared map — the
reference's signature capability (src/PoseCalibrator.cc,
src/TrackerCalib.cc, src/MapMakerCalib.cc).

Standalone script (invoked by tests/test_pose_calib.py through a
subprocess) so the heavy calibration compile runs in a fresh process:
XLA:CPU deterministically segfaults compiling one of this drive's
programs when ~50 test modules' worth of compiled executables already
live in the process (observed on the full-suite run; the same drive
passes in isolation), so the suite isolates it the way test_apps
isolates the CLI binaries.

Prints ONE JSON line: {"rot_err": .., "trans_err": .., "running": ..,
"groups_full": ..}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    # share the suite's host-fingerprinted persistent compile cache
    # (mcptam_tpu/hostcache.py for why the fingerprint)
    from mcptam_tpu.hostcache import enable_cpu_cache
    enable_cpu_cache(jax)

import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3, so3_exp
from mcptam_tpu.core.camera import make_camera, stack_cameras, project
from mcptam_tpu.calib.board import inner_corner_points
from mcptam_tpu.calib.pose_calib import PoseCalibSession
from mcptam_tpu.io.synthetic import render_rig_board, make_sbi_cams
from mcptam_tpu.config import TrackerConfig, MapMakerConfig

H, W = 96, 128
SQUARES = (8, 6)
SQ = 0.25                      # 2.0 x 1.5 m board: scale matches the scene
SEED = 3.0
SEP = np.radians(60.0)         # camera separation in yaw

# Mild-distortion lens (f ~= 0.75 W): the projected checker squares must
# stay >= ~11 px so the SAME-PHASE corner two squares away (and the
# diagonal neighbor) falls OUTSIDE the tracker's +-10 px fine search
# window — with a strong fisheye at this tiny test resolution the corners
# alias and the pose solve locks onto the wrong corner lattice.
PARAMS = np.array(
    [0.75 * W, -0.0035, 1.0e-6, -6.0e-9,
     W / 2.0 + 1.0, H / 2.0 + 1.0, 1.001, 0.0003, -0.0002]
)

TRUE_REL = SE3(
    R=so3_exp(jnp.asarray([0.0, -SEP, 0.02], jnp.float32)),
    t=jnp.asarray([0.22, -0.03, 0.06], jnp.float32),
)  # cam1_from_cam0 (cam0 == base); yaw sign matches the trajectory's

BOARD3 = inner_corner_points(SQUARES, SQ)
BOARD2 = BOARD3.reshape(-1, 3)[:, :2]
BOARD_CENTER = np.array([SQUARES[0] * SQ / 2, SQUARES[1] * SQ / 2, 0.0])

# NOTE round 5 tried shrinking this drive (36 frames, faster sweep) to
# cut suite wall time: camera 2 lost tracking by the end and calibration
# missed the gates (rot_err 0.0112, trans_err 0.0201, running=[T,F]).
# The 48-frame trajectory is load-bearing; the suite keeps it behind the
# `slow` marker instead.
N_FRAMES = 48
ROT_START, ROT_END = 4, 20


def base_pose(i: int) -> SE3:
    """cam0(base)-from-world along the trajectory: starts frontal to the
    board, yaws by -SEP (so cam1 ends frontal), translating for baseline."""
    frac = np.clip((i - ROT_START) / (ROT_END - ROT_START), 0.0, 1.0)
    yaw = -SEP * frac
    Ry = np.array(
        [[np.cos(yaw), 0, -np.sin(yaw)], [0, 1, 0],
         [np.sin(yaw), 0, np.cos(yaw)]], np.float64,
    )
    pos = np.array([
        BOARD_CENTER[0] - 0.28 + 0.033 * i,
        BOARD_CENTER[1] + 0.012 * i - 0.16,
        -1.7 + 0.012 * i,
    ])
    t = -Ry @ pos
    return SE3(R=jnp.asarray(Ry, jnp.float32), t=jnp.asarray(t, jnp.float32))


def cam_pose(i: int, c: int) -> SE3:
    rel = SE3.identity() if c == 0 else TRUE_REL
    return rel @ base_pose(i)


def board_detectable(pose_c: SE3, cam) -> bool:
    """Board counts as detectable when reasonably centered and frontal in
    THIS camera's view: the board center within 25 deg of the optical
    axis, and every corner projecting inside the image.  (A real detector
    needs a well-centered, frontal board; a fisheye lens "seeing" the
    board at 60 deg off-axis does not make it detectable.)"""
    d_c = np.asarray(pose_c.apply(jnp.asarray(BOARD_CENTER, jnp.float32)),
                     np.float64)
    off_axis = np.degrees(
        np.arccos(min(1.0, d_c[2] / max(np.linalg.norm(d_c), 1e-9)))
    )
    if off_axis > 25.0:
        return False
    pts = jnp.asarray(
        np.concatenate([BOARD2, np.zeros((len(BOARD2), 1))], 1), jnp.float32
    )
    uv, ok = project(cam, pose_c.apply(pts))
    uvn = np.asarray(uv)
    inside = (
        np.asarray(ok)
        & (uvn[:, 0] > 4) & (uvn[:, 0] < W - 4)
        & (uvn[:, 1] > 4) & (uvn[:, 1] < H - 4)
    )
    return bool(inside.all())


def main() -> dict:
    cam = make_camera(PARAMS, (W, H))
    cams = stack_cameras([cam, cam])
    cams_sbi = make_sbi_cams(cams, H, W)
    true_cfb = SE3(
        R=jnp.stack([jnp.eye(3), TRUE_REL.R]),
        t=jnp.stack([jnp.zeros(3), TRUE_REL.t]),
    )
    rng = np.random.default_rng(11)

    # ---- verify the scenario really has no simultaneous board view
    detectable = np.zeros((N_FRAMES, 2), bool)
    for i in range(N_FRAMES):
        for c in range(2):
            cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
            detectable[i, c] = board_detectable(cam_pose(i, c), cam_c)
    assert not np.any(detectable[:, 0] & detectable[:, 1]), (
        "scenario broken: simultaneous board view exists"
    )
    assert detectable[:, 0].any() and detectable[:, 1].any()

    session = PoseCalibSession(
        cams=cams, cams_sbi=cams_sbi, params9=[PARAMS, PARAMS],
        board_pts2=BOARD2, H=H, W=W,
        max_points=1024, max_mkfs=48, max_meas=8192,
        tcfg=TrackerConfig(max_patches_per_frame=300, coarse_max=30,
                           max_ssd_per_pixel=500.0),  # calib-mode budget
        # 128x96 test frames leave levels>=2 nearly featureless, so the
        # reference-scale large-point sanity test would reject every
        # single-camera MKF; at full resolution it stays on
        mcfg=MapMakerConfig(large_point_test=False),
        max_scaled_kf_dist=0.05,
    )

    for i in range(N_FRAMES):
        images = render_rig_board(
            cams, true_cfb, base_pose(i), SEED, H, W, SQUARES, SQ
        )
        detections = {}
        for c in range(2):
            if not detectable[i, c]:
                continue
            cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
            pts = jnp.asarray(
                np.concatenate([BOARD2, np.zeros((len(BOARD2), 1))], 1),
                jnp.float32,
            )
            uv, ok = project(cam_c, cam_pose(i, c).apply(pts))
            uvn = np.asarray(uv) + rng.normal(size=(len(BOARD2), 2)) * 0.05
            okn = np.asarray(ok)
            detections[c] = (uvn[okn], np.nonzero(okn)[0])
        session.process_frame(np.asarray(images), detections)

    session.calib_init()
    session.calib_step(40)
    rel = jax.tree_util.tree_map(lambda a: a[1], session.cam_from_base)
    err = np.asarray((rel @ TRUE_REL.inv()).ln())
    return {
        "rot_err": float(np.linalg.norm(err[3:])),
        "trans_err": float(np.linalg.norm(err[:3])),
        "running": [bool(r) for r in session.running],
        "groups_full": sum(1 for g in session.sync_groups if len(g) == 2),
    }


if __name__ == "__main__":
    print(json.dumps(main()), flush=True)
