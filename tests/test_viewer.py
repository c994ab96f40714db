"""Headless viewer: keyframe overlays + PLY export."""

import numpy as np
import pytest

from tests.test_system import make_system, TCFG, MCFG, H, W, SEED
from mcptam_tpu.io.synthetic import render_rig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.system.viewer import dump_keyframes, export_ply, write_ppm
import jax.numpy as jnp


@pytest.fixture(scope="module")
def sys_with_map():
    sys_, cams, cfb = make_system()
    for i in range(3):
        pose = SE3.exp(jnp.asarray([0.05 * i, 0, 0.03 * i, 0, 0.02 * i, 0]))
        sys_.process_frame(render_rig(cams, cfb, pose, SEED, H, W))
    return sys_


def test_write_ppm_roundtrip(tmp_path, rng):
    rgb = rng.integers(0, 255, (10, 12, 3), dtype=np.uint8).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    write_ppm(p, rgb)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n12 10\n255\n")
    assert raw.endswith(rgb.tobytes())


def test_dump_keyframes(tmp_path, sys_with_map):
    paths = dump_keyframes(sys_with_map.ms, str(tmp_path / "kfs"))
    assert len(paths) >= 2  # at least one MKF x 2 cameras
    raw = open(paths[0], "rb").read()
    assert raw.startswith(b"P6")
    assert len(raw) > W * H  # full-size image present


def test_export_ply(tmp_path, sys_with_map):
    p = str(tmp_path / "map.ply")
    n = export_ply(p, sys_with_map.ms,
                   trajectory=np.zeros((5, 3)))
    text = open(p).read()
    assert f"element vertex {n}" in text
    assert n > 100  # points + centers + trajectory
    # vertex lines parse as numbers
    body = text.split("end_header\n")[1].strip().splitlines()
    assert len(body) == n
    vals = body[0].split()
    assert len(vals) == 6
