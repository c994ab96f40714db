"""Calibration tests: checkerboard detection + intrinsic calibration
against ground-truth synthetic boards."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import make_camera
from mcptam_tpu.calib.board import (
    render_checkerboard, project_corners, inner_corner_points,
)
from mcptam_tpu.calib.corners import detect_checkerboard
from mcptam_tpu.calib.intrinsic import calibrate_camera, project_calib

H, W = 240, 320
TRUE_PARAMS = np.array(
    [95.0, -0.0045, 3.0e-6, -6.0e-9, 163.0, 122.0, 1.0, 0.0, 0.0]
)
SQUARES = (8, 6)
SQ = 0.04


@pytest.fixture(scope="module")
def cam():
    return make_camera(TRUE_PARAMS, (W, H))


def board_pose(i):
    """A few varied board poses (board_from_cam)."""
    configs = [
        [0.22, 0.14, 0.18, 3.05, 0.10, 0.0],
        [0.28, 0.10, 0.30, 3.00, -0.45, 0.1],
        [0.14, 0.20, 0.42, 3.1, 0.35, -0.35],
        [0.30, 0.08, 0.24, 2.85, 0.0, 0.45],
        [0.18, 0.13, 0.55, 3.25, -0.3, -0.2],
        [0.25, 0.22, 0.34, 3.0, 0.5, 0.3],
    ]
    # translation then rotation (cam->board); rotate ~pi about x so the
    # board (z up) faces the camera (z forward)
    v = configs[i]
    from mcptam_tpu.core.se3 import so3_exp
    R = so3_exp(jnp.asarray(v[3:], jnp.float32))
    t = jnp.asarray(v[:3], jnp.float32)
    return SE3(R=R, t=t)


@pytest.fixture(scope="module")
def views(cam):
    """Rendered boards + detected grids + ground truth."""
    out = []
    for i in range(6):
        pose = board_pose(i)
        img = np.asarray(render_checkerboard(cam, pose, H, W, SQUARES, SQ))
        gt_uv, gt_ok = project_corners(cam, pose, SQUARES, SQ)
        grid, xy, valid = detect_checkerboard(img)
        out.append(dict(img=img, pose=pose, gt_uv=np.asarray(gt_uv),
                        gt_ok=np.asarray(gt_ok), grid=grid))
    return out


def test_detection_finds_grid(views):
    found = [v for v in views if v["grid"] is not None]
    assert len(found) >= 4, len(found)
    for v in found:
        assert len(v["grid"]) >= 20, len(v["grid"])


def _match_grid_to_gt(grid, gt_uv, gt_ok):
    """Align detected grid (arbitrary origin/orientation) with ground truth
    by nearest neighbors; returns matched (det, gt) arrays."""
    det = np.array(list(grid.values()))
    gt = gt_uv[gt_ok]
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    from scipy.spatial import cKDTree
    tree = cKDTree(gt)
    d, j = tree.query(det)
    keep = d < 3.0
    return det[keep], gt[j[keep]]


def test_detection_subpixel_accuracy(views):
    errs = []
    for v in views:
        if v["grid"] is None:
            continue
        det, gt = _match_grid_to_gt(v["grid"], v["gt_uv"], v["gt_ok"])
        assert len(det) >= 15
        errs.append(np.linalg.norm(det - gt, axis=1))
    err = np.concatenate(errs)
    assert np.median(err) < 0.4, np.median(err)


def _grids_for_calib(views):
    board3 = inner_corner_points(SQUARES, SQ)
    grids_uv, grids_board = [], []
    for v in views:
        g = v["grid"]
        if g is None or len(g) < 20:
            continue
        # determine the (r,c) -> board coordinate mapping: the detected
        # grid's origin/axes are arbitrary; try the 8 dihedral alignments
        # and keep the one consistent with ground truth projections
        det_rc = np.array(list(g.keys()))
        det_uv = np.array(list(g.values()))
        best = None
        nr, nc = board3.shape[:2]
        for flip_r in (False, True):
            for flip_c in (False, True):
                for swap in (False, True):
                    rc = det_rc.copy()
                    if swap:
                        rc = rc[:, ::-1]
                    r = rc[:, 0] - rc[:, 0].min()
                    c = rc[:, 1] - rc[:, 1].min()
                    if flip_r:
                        r = r.max() - r
                    if flip_c:
                        c = c.max() - c
                    if r.max() >= nr or c.max() >= nc:
                        continue
                    for dr in range(nr - r.max()):
                        for dc in range(nc - c.max()):
                            bp = board3[r + dr, c + dc][:, :2]
                            gt = v["gt_uv"][r + dr, c + dc]
                            err = np.linalg.norm(gt - det_uv, axis=1).mean()
                            if best is None or err < best[0]:
                                best = (err, bp)
        if best is not None and best[0] < 2.0:
            grids_uv.append(det_uv)
            grids_board.append(best[1])
    return grids_uv, grids_board


def test_intrinsic_tpu_matches_numpy_oracle(views):
    """The device Schur-LM (intrinsic_tpu) must land where the host float64
    full-Jacobian LM lands: same focal/center to well under a percent and
    no worse RMS (within f32 slack)."""
    grids_uv, grids_board = _grids_for_calib(views)
    p_tpu, rms_tpu = calibrate_camera(grids_uv, grids_board, (W, H),
                                      backend="tpu")
    p_np, rms_np = calibrate_camera(grids_uv, grids_board, (W, H),
                                    backend="numpy")
    assert rms_tpu < rms_np * 1.2 + 0.05, (rms_tpu, rms_np)
    assert np.allclose(p_tpu[4:6], p_np[4:6], atol=1.0), (p_tpu, p_np)
    # parameter-space distance is a poor metric (a0/a2 are correlated in
    # the Taylor model); compare what matters — the projection function —
    # over the calibrated field of view
    angles = np.linspace(0.05, 0.75, 30)   # rad off optical axis
    pts = np.stack([np.sin(angles), np.zeros_like(angles),
                    np.cos(angles)], axis=1) * 2.0
    uv_t, ok_t = project_calib(p_tpu, pts, float(np.hypot(W, H)))
    uv_n, ok_n = project_calib(p_np, pts, float(np.hypot(W, H)))
    both = ok_t & ok_n
    assert both.sum() >= 25
    d = np.linalg.norm(uv_t[both] - uv_n[both], axis=1)
    assert d.max() < 0.75, d.max()


def test_review_loop_discards_corrupted_view(views):
    """The grabbed-frame review loop (per-view RMS + drop-worst +
    re-optimize; the reference operator's review in
    CameraCalibrator::Run, src/CameraCalibrator.cc:128-244) must finger a
    planted bad view and recover the clean solution without it."""
    from mcptam_tpu.calib.intrinsic import calibrate_camera_reviewed

    grids_uv, grids_board = _grids_for_calib(views)
    assert len(grids_uv) >= 4
    bad = 1
    rng = np.random.default_rng(5)
    grids_uv = [np.asarray(g, np.float64).copy() for g in grids_uv]
    # a mildly bad grab (0.8 px detection noise): degrades the shared
    # intrinsics but leaves the solve coherent enough that per-view RMS
    # isolates the culprit — like a real slightly-blurred board view
    grids_uv[bad] += rng.normal(size=grids_uv[bad].shape) * 0.8

    p0, rms0, pv0, kept0 = calibrate_camera_reviewed(
        grids_uv, grids_board, (W, H), drop_worst=0
    )
    assert int(np.argmax(pv0)) == bad, pv0
    p1, rms1, pv1, kept1 = calibrate_camera_reviewed(
        grids_uv, grids_board, (W, H), drop_worst=1
    )
    assert bad not in kept1
    assert np.isnan(pv1[bad])
    assert rms1 < rms0
    assert rms1 < 0.5, rms1


def test_intrinsic_calibration(views):
    grids_uv, grids_board = _grids_for_calib(views)
    assert len(grids_uv) >= 4, len(grids_uv)
    params9, rms = calibrate_camera(grids_uv, grids_board, (W, H))
    # acceptance per the reference guidance: RMS < 0.5 px, typically < 0.3
    # (src/CameraCalibrator.cc:228)
    assert rms < 0.5, rms
    # recovered center within a couple px, a0 within a few percent
    assert abs(params9[4] - TRUE_PARAMS[4]) < 3.0, params9[4]
    assert abs(params9[5] - TRUE_PARAMS[5]) < 3.0, params9[5]
    assert abs(params9[0] - TRUE_PARAMS[0]) / TRUE_PARAMS[0] < 0.05, params9[0]
