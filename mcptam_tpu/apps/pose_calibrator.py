"""Rig extrinsic calibration (the `pose_calibrator` binary,
src/MainPoseCalibrator.cc, src/PoseCalibrator.cc).

    python -m mcptam_tpu.apps.pose_calibrator --rig rig.json \
        --video views.npz --squares 8x6 --square-size 0.04 --out rig_cal.json

`--video` is (C,T,H,W) uint8: synchronized views of a shared checkerboard
from every camera.  The pipeline is detection -> canonical labeling ->
per-view PnP -> relative-pose consensus (resolves the 180-degree twin of
symmetric boards) -> rotation averaging -> joint Calib-layout bundle
adjustment (calib/extrinsic.py; ref src/MapMakerCalib.cc:248-528).
"""

from __future__ import annotations

import argparse

import numpy as np

from mcptam_tpu.apps._common import ensure_jax_platform, add_platform_arg


def detect_all(frames: np.ndarray, n_rows: int, n_cols: int):
    """-> dict[(frame, cam)] -> list of candidate labelings."""
    from mcptam_tpu.calib.corners import detect_checkerboard, canonical_labelings

    C, T = frames.shape[:2]
    cands = {}
    for c in range(C):
        for t in range(T):
            grid, _, _ = detect_checkerboard(frames[c, t])
            if grid is None or len(grid) < (n_rows * n_cols) // 2:
                continue
            labs = canonical_labelings(frames[c, t], grid, n_rows, n_cols)
            if labs:
                cands[(t, c)] = labs
    return cands


def resolve_orientation(cands, params9_per_cam, board2_grid, image_size):
    """PnP every candidate labeling; for symmetric boards pick, per view,
    the labeling whose cam-from-cam0 relative rotation agrees with the
    cross-frame consensus (the board pose varies per frame, the rig
    extrinsic does not — only the correct twin is stable)."""
    from mcptam_tpu.calib.extrinsic import board_pose_pnp
    from mcptam_tpu.core.se3 import so3_ln
    import jax.numpy as jnp

    n_rows, n_cols = board2_grid.shape[:2]
    pnp = {}  # (f,c) -> list[(R,t)]
    for (f, c), labs in cands.items():
        outs = []
        for lab in labs:
            rc = np.array(list(lab.keys()))
            uv = np.array(list(lab.values()))
            bidx = rc[:, 0] * n_cols + rc[:, 1]
            out = board_pose_pnp(
                params9_per_cam[c], board2_grid.reshape(-1, 2)[bidx], uv,
                image_size,
            )
            if out is not None:
                outs.append((out, lab, bidx, uv))
        if outs:
            pnp[(f, c)] = outs

    # consensus per camera c>0: choose candidate combination minimizing
    # spread of relative rotations across frames (greedy: for each frame
    # pick the candidate pair closest to the running geodesic mean)
    chosen = {}
    frames_all = sorted({f for (f, c) in pnp})
    for (f, c), outs in pnp.items():
        if len(outs) == 1 or c == 0:
            chosen[(f, c)] = outs[0]
    # iterative: for ambiguous (f,c), test against current relative mean
    for _ in range(3):
        for (f, c), outs in pnp.items():
            if (f, c) in chosen and len(outs) == 1:
                continue
            if c == 0 or (f, 0) not in chosen:
                if (f, c) not in chosen:
                    chosen[(f, c)] = outs[0]
                continue
            R0 = chosen[(f, 0)][0][0]
            # relative rotations of other frames (current choices)
            rels = []
            for f2 in frames_all:
                if f2 == f or (f2, c) not in chosen or (f2, 0) not in chosen:
                    continue
                Rc2 = chosen[(f2, c)][0][0]
                R02 = chosen[(f2, 0)][0][0]
                rels.append(Rc2 @ R02.T)
            if not rels:
                chosen[(f, c)] = outs[0]
                continue
            R_ref = rels[len(rels) // 2]
            best = min(
                outs,
                key=lambda o: np.linalg.norm(
                    np.asarray(so3_ln(jnp.asarray(
                        (o[0][0] @ R0.T) @ R_ref.T, jnp.float32)))
                ),
            )
            chosen[(f, c)] = best
    return chosen


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(p)
    p.add_argument("--rig", required=True, help="rig JSON with intrinsics")
    p.add_argument("--video", required=True, help="(C,T,H,W) uint8")
    p.add_argument("--squares", default="8x6")
    p.add_argument("--square-size", type=float, default=0.04)
    p.add_argument("--out", default="", help="output rig JSON with extrinsics")
    p.add_argument(
        "--tracking", action="store_true",
        help="calibrate by tracking the shared board-anchored map "
             "(TrackerCalib/MapMakerCalib flow — required for rigs with "
             "no simultaneous board views; also the automatic fallback "
             "when shared views are insufficient)",
    )
    args = p.parse_args(argv)
    ensure_jax_platform(args.platform)

    from mcptam_tpu.calib.board import inner_corner_points
    from mcptam_tpu.calib.extrinsic import calibrate_rig
    from mcptam_tpu.io.rig_config import load_rig, load_video, save_rig

    cams, _, H, W, masks, names = load_rig(args.rig)
    frames = load_video(args.video)
    C = frames.shape[0]
    sx, sy = (int(v) for v in args.squares.split("x"))
    board3 = inner_corner_points((sx, sy), args.square_size)
    n_rows, n_cols = board3.shape[:2]
    board2_grid = board3[..., :2]

    import json
    with open(args.rig) as f:
        doc = json.load(f)
    params9_per_cam = [np.asarray(c["params"]) for c in doc["cameras"]]

    cands = detect_all(frames, n_rows, n_cols)
    print(f"detections: {len(cands)} (frame,cam) views "
          f"across {C} cameras, {frames.shape[1]} frames")
    chosen = resolve_orientation(cands, params9_per_cam, board2_grid, (W, H))

    observations = {
        (f, c): {"uv": uv, "board_idx": bidx}
        for (f, c), (_out, _lab, bidx, uv) in chosen.items()
    }

    def _lab_to_uv_bidx(lab):
        rc = np.array(list(lab.keys()))
        uv = np.array(list(lab.values()))
        return uv, rc[:, 0] * n_cols + rc[:, 1]

    # tracking mode gets EVERY candidate labeling: a symmetric board's
    # 180-degree twin cannot be resolved by cross-view consensus when
    # cameras never see the board simultaneously — the PoseCalibSession
    # arbitrates per camera by tracking against the shared map
    multi_observations = {
        key: [_lab_to_uv_bidx(lab) for lab in labs]
        for key, labs in cands.items()
    }

    def _tracking_calibration():
        """TrackerCalib/MapMakerCalib flow: every camera bootstraps from
        the board when it sees it, tracks the shared board-anchored map,
        and the extrinsics come from simultaneous map tracking
        (src/PoseCalibrator.cc:221-411)."""
        import jax
        from mcptam_tpu.calib.pose_calib import PoseCalibSession
        from mcptam_tpu.io.synthetic import make_sbi_cams
        from mcptam_tpu.config import TrackerConfig, MapMakerConfig

        session = PoseCalibSession(
            cams=cams, cams_sbi=make_sbi_cams(cams, H, W),
            params9=params9_per_cam,
            board_pts2=board2_grid.reshape(-1, 2), H=H, W=W,
            tcfg=TrackerConfig(max_ssd_per_pixel=500.0),
            mcfg=MapMakerConfig(),
        )
        for t in range(frames.shape[1]):
            detections = {
                c: labs
                for (f, c), labs in multi_observations.items() if f == t
            }
            session.process_frame(frames[:, t], detections)
        session.calib_init()
        session.calib_step(40)
        return [
            jax.tree_util.tree_map(lambda a: a[c], session.cam_from_base)
            for c in range(C)
        ]

    if args.tracking:
        cam_from_base = _tracking_calibration()
    else:
        try:
            cam_from_base, base_poses, st = calibrate_rig(
                params9_per_cam, observations, board2_grid.reshape(-1, 2),
                (W, H), cams,
            )
        except ValueError as e:
            print(f"shared-board path failed ({e}); "
                  "falling back to tracking calibration")
            cam_from_base = _tracking_calibration()
    for c in range(C):
        v6 = np.asarray(cam_from_base[c].ln())
        print(f"cam {c} ({names[c]}): cam_from_base ln = "
              + np.array2string(v6, precision=5))
    if args.out:
        save_rig(args.out, params9_per_cam, (W, H),
                 cam_from_base=cam_from_base, names=names)
        print(f"saved to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
