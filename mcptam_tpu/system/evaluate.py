"""Trajectory evaluation: ATE / RPE against ground truth.

The reference verifies tracking only visually (grid-overlay stability,
SURVEY §4) and publishes no accuracy metrics; the rebuild adds the
standard SLAM trajectory metrics so replayed sequences are scoreable:

  * ATE (absolute trajectory error): RMSE of camera-center residuals
    after an optional Umeyama similarity alignment — monocular SLAM maps
    are gauge-free in scale (the reference exposes a manual map rescale,
    src/System.cc:305-405), so scale-aligned ATE is the fair metric;
  * RPE (relative pose error): drift per step, translation and rotation.

All poses are base_from_world (the tracker's convention); camera centers
are -R^T t.  Host-side numpy — these are offline metrics.
"""

from __future__ import annotations

import numpy as np


def _as_Rt(poses) -> tuple:
    """poses: (T,3,4) stacked [R|t] base_from_world -> (R (T,3,3), t (T,3))."""
    arr = np.asarray(poses, np.float64)
    assert arr.ndim == 3 and arr.shape[1:] == (3, 4), arr.shape
    return arr[:, :, :3], arr[:, :, 3]


def centers(poses) -> np.ndarray:
    """Camera/base centers in world coordinates: -R^T t, (T,3)."""
    R, t = _as_Rt(poses)
    return -np.einsum("tij,ti->tj", R, t)


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity y ≈ s R x + t (Umeyama 1991).

    x, y: (T,3).  Returns (s, R (3,3), t (3,))."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc ** 2).sum() / len(x)
        s = float(np.trace(np.diag(D) @ S) / max(var_x, 1e-18))
    else:
        s = 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(est_poses, gt_poses, align: bool = True,
             with_scale: bool = True) -> dict:
    """Absolute trajectory error between two (T,3,4) pose arrays.

    Returns {"rmse", "mean", "median", "max", "scale"} in world units."""
    pe, pg = centers(est_poses), centers(gt_poses)
    assert pe.shape == pg.shape, (pe.shape, pg.shape)
    if align and len(pe) >= 3:
        s, R, t = umeyama_alignment(pe, pg, with_scale)
        pe = (s * (R @ pe.T)).T + t
    else:
        s = 1.0
    err = np.linalg.norm(pe - pg, axis=-1)
    return {
        "rmse": float(np.sqrt(np.mean(err ** 2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
        "scale": float(s),
    }


def rpe(est_poses, gt_poses, delta: int = 1) -> dict:
    """Relative pose error at step `delta`: translation RMSE (world units)
    and rotation RMSE (degrees)."""
    Re, te = _as_Rt(est_poses)
    Rg, tg = _as_Rt(gt_poses)
    T = len(Re)
    assert T > delta, (T, delta)
    dts, drs = [], []
    for i in range(T - delta):
        j = i + delta
        # relative motion a_from_b = P_j P_i^{-1} for P = base_from_world
        dRe = Re[j] @ Re[i].T
        dte = te[j] - dRe @ te[i]
        dRg = Rg[j] @ Rg[i].T
        dtg = tg[j] - dRg @ tg[i]
        Rerr = dRe.T @ dRg
        cos = np.clip((np.trace(Rerr) - 1.0) / 2.0, -1.0, 1.0)
        drs.append(np.degrees(np.arccos(cos)))
        dts.append(np.linalg.norm(dte - dtg))
    dts, drs = np.asarray(dts), np.asarray(drs)
    return {
        "trans_rmse": float(np.sqrt(np.mean(dts ** 2))),
        "rot_rmse_deg": float(np.sqrt(np.mean(drs ** 2))),
    }


def evaluate_run(infos, gt_poses, delta: int = 1) -> dict:
    """Score a tracked run: infos = list of FrameInfo (with .pose (3,4)),
    gt_poses = (T,3,4) ground-truth base_from_world."""
    est = np.stack([i.pose for i in infos])
    gt = np.asarray(gt_poses, np.float64)
    assert len(est) == len(gt), (len(est), len(gt))
    out = {"ate": ate_rmse(est, gt), "rpe": rpe(est, gt, delta)}
    out["lost_frames"] = int(sum(bool(i.lost) for i in infos))
    return out
