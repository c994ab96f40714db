"""App entry-point tests: the five binaries' analogues driven end-to-end
on synthetic data through their CLI mains."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3, so3_exp
from mcptam_tpu.io.synthetic import make_rig, render_rig, DEFAULT_PARAMS

H, W, C = 240, 320, 2
SEED = 3.0


def _rig_json(tmp_path, with_extrinsics=True):
    """Rig JSON matching io.synthetic.make_rig(C, H, W, 25deg)."""
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    params = DEFAULT_PARAMS.copy()
    params[4] = W / 2.0 + 2.0
    params[5] = H / 2.0 + 3.0
    params[0] = 0.28 * W
    doc = {"width": W, "height": H, "cameras": []}
    for c in range(C):
        entry = {"name": f"camera{c+1}", "params": [float(x) for x in params]}
        if with_extrinsics:
            entry["cam_from_base"] = [
                float(x) for x in np.asarray(cfb[c].ln())
            ]
        doc["cameras"].append(entry)
    p = str(tmp_path / "rig.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p, cams, cfb


def _video_npz(tmp_path, cams, cfb, n_frames=5):
    traj = [SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
            for i in range(n_frames)]
    frames = np.stack(
        [np.asarray(render_rig(cams, cfb, p, SEED, H, W)) for p in traj],
        axis=1,
    ).astype(np.uint8)
    p = str(tmp_path / "seq.npz")
    np.savez(p, frames=frames)
    return p, traj


def test_mcptam_app(tmp_path, capsys):
    from mcptam_tpu.apps.mcptam import main

    rig, cams, cfb = _rig_json(tmp_path)
    video, traj = _video_npz(tmp_path, cams, cfb)
    out_map = str(tmp_path / "map.npz")
    gt = str(tmp_path / "gt.npy")
    np.save(gt, np.stack([np.asarray(p.ln()) for p in traj]))
    rc = main(["--rig", rig, "--video", video, "--out-map", out_map,
               "--fps", "1000", "--eval-gt", gt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "frame    4" in out
    assert "lost=0" in out
    assert os.path.exists(out_map)
    # the ATE/RPE report (system/evaluate.py) scores the run
    line = [l for l in out.splitlines() if l.startswith("[mcptam] eval ")][0]
    scores = json.loads(line[len("[mcptam] eval "):])
    assert scores["lost_frames"] == 0
    assert scores["ate"]["rmse"] < 0.05, scores


@pytest.mark.slow
def test_mcptam_app_batched_pipelined(tmp_path, capsys):
    """The throughput deployment flags (--batch/--pipeline) track the
    same trajectory and report every frame exactly once in order."""
    from mcptam_tpu.apps.mcptam import main

    rig, cams, cfb = _rig_json(tmp_path)
    video, traj = _video_npz(tmp_path, cams, cfb)
    gt = str(tmp_path / "gt.npy")
    np.save(gt, np.stack([np.asarray(p.ln()) for p in traj]))
    rc = main(["--rig", rig, "--video", video, "--fps", "1000",
               "--eval-gt", gt, "--batch", "2", "--pipeline", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("[mcptam] eval ")][0]
    scores = json.loads(line[len("[mcptam] eval "):])
    assert scores["lost_frames"] == 0
    assert scores["ate"]["rmse"] < 0.05, scores


def test_rig_roundtrip(tmp_path):
    from mcptam_tpu.io.rig_config import load_rig, save_rig

    rig, cams, cfb = _rig_json(tmp_path)
    cams2, cfb2, h, w, masks, names = load_rig(rig)
    assert (h, w) == (H, W)
    assert masks is None
    assert names == ["camera1", "camera2"]
    for c in range(C):
        err = np.asarray((cfb2[c] @ cfb[c].inv()).ln())
        assert np.linalg.norm(err) < 1e-5, err
    p2 = str(tmp_path / "rig2.json")
    params = [np.asarray([85.0, -4e-3, 2e-6, -5e-9, 160.0, 120.0, 1, 0, 0])] * C
    save_rig(p2, params, (W, H), cam_from_base=cfb2, names=names)
    cams3, cfb3, *_ = load_rig(p2)
    for c in range(C):
        err = np.asarray((cfb3[c] @ cfb2[c].inv()).ln())
        assert np.linalg.norm(err) < 1e-5


@pytest.mark.slow
def test_camera_calibrator_app(tmp_path, capsys):
    from mcptam_tpu.apps.camera_calibrator import main
    from mcptam_tpu.core.camera import make_camera
    from mcptam_tpu.calib.board import render_checkerboard

    TRUE = np.array([95.0, -0.0045, 3.0e-6, -6.0e-9, 163.0, 122.0, 1.0, 0.0, 0.0])
    cam = make_camera(TRUE, (W, H))
    from tests.test_calib import board_pose  # reuse the varied poses
    imgs = np.stack([
        np.asarray(render_checkerboard(cam, board_pose(i), H, W, (8, 6), 0.04))
        for i in range(6)
    ]).astype(np.uint8)
    p = str(tmp_path / "views.npy")
    np.save(p, imgs)
    out = str(tmp_path / "camera.json")
    rc = main(["--images", p, "--squares", "8x6", "--square-size", "0.04",
               "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    # the reference's acceptance criterion: RMS below 0.5 px
    # (src/CameraCalibrator.cc:228) — printed as "OK" by the app
    assert "OK" in text, text
    with open(out) as f:
        doc = json.load(f)
    got = np.asarray(doc["cameras"][0]["params"])
    # parameters are degenerate over a finite FOV (a0 trades against the
    # higher poly terms); check the loose shape + the center
    assert abs(got[0] - TRUE[0]) / TRUE[0] < 0.05, got
    assert np.linalg.norm(got[4:6] - TRUE[4:6]) < 2.0


@pytest.mark.slow
def test_pose_calibrator_app(tmp_path, capsys):
    from mcptam_tpu.apps.pose_calibrator import main
    from mcptam_tpu.core.camera import make_camera
    from mcptam_tpu.calib.board import render_checkerboard
    from tests.test_calib import board_pose

    TRUE = np.array([95.0, -0.0045, 3.0e-6, -6.0e-9, 163.0, 122.0, 1.0, 0.0, 0.0])
    TRUE_REL = SE3(
        R=so3_exp(jnp.asarray([0.02, 0.30, -0.03])),
        t=jnp.asarray([-0.20, 0.02, 0.05]),
    )
    cam = make_camera(TRUE, (W, H))
    # rig json with intrinsics only
    doc = {"width": W, "height": H, "cameras": [
        {"name": f"camera{c+1}", "params": [float(x) for x in TRUE]}
        for c in range(2)
    ]}
    rig = str(tmp_path / "rig.json")
    with open(rig, "w") as f:
        json.dump(doc, f)

    frames = np.zeros((2, 6, H, W), np.uint8)
    for i in range(6):
        bfc0 = board_pose(i)                      # board_from_cam0
        bfc1 = bfc0 @ TRUE_REL.inv()              # board_from_cam1
        frames[0, i] = np.asarray(render_checkerboard(cam, bfc0, H, W, (8, 6), 0.04))
        frames[1, i] = np.asarray(render_checkerboard(cam, bfc1, H, W, (8, 6), 0.04))
    video = str(tmp_path / "views.npz")
    np.savez(video, frames=frames)

    out = str(tmp_path / "rig_cal.json")
    rc = main(["--rig", rig, "--video", video, "--squares", "8x6",
               "--square-size", "0.04", "--out", out])
    assert rc == 0
    with open(out) as f:
        cal = json.load(f)
    rel = SE3.exp(jnp.asarray(cal["cameras"][1]["cam_from_base"]))
    err = np.asarray((rel @ TRUE_REL.inv()).ln())
    assert np.linalg.norm(err[3:]) < 0.02, err   # rotation ~1 deg
    assert np.linalg.norm(err[:3]) < 0.03, err


@pytest.mark.slow
def test_client_server_apps_subprocess(tmp_path):
    """The distributed pair as REAL processes: `mcptam_server` +
    `mcptam_client` CLIs over loopback TCP (the reference runs both ROS
    nodes on one machine with remapped topics, SURVEY §4) — covering the
    argv parsing, the PORT handshake, and a clean SIGTERM shutdown that
    class-level tests (test_distributed.py) cannot."""
    import subprocess
    import sys as _sys

    rig, cams, cfb = _rig_json(tmp_path)
    video, traj = _video_npz(tmp_path, cams, cfb)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/root/.jax_cache_cpu_tests",
    )
    caps = ["--max-points", "1024", "--max-mkfs", "8", "--max-meas", "4096"]
    server = subprocess.Popen(
        [_sys.executable, "-m", "mcptam_tpu.apps.server", "--rig", rig,
         "--port", "0", "--platform", "cpu", *caps],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    try:
        port = None
        for _ in range(200):
            line = server.stdout.readline()
            if line.startswith("PORT "):
                port = int(line.split()[1])
                break
        assert port, "server never printed its port"
        client = subprocess.run(
            [_sys.executable, "-m", "mcptam_tpu.apps.client", "--rig", rig,
             "--video", video, "--server", f"127.0.0.1:{port}",
             "--fps", "1000", "--platform", "cpu", *caps],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        assert client.returncode == 0, client.stderr[-2000:]
        assert "lost=0" in client.stdout, client.stdout[-2000:]
        assert "frame    4" in client.stdout
    finally:
        server.terminate()
    assert server.wait(timeout=60) == 0
