"""Pose-calibrator tracking phase: a 2-camera rig with ZERO simultaneous
board overlap calibrates through the shared map.

This is the reference's signature capability (src/PoseCalibrator.cc,
src/TrackerCalib.cc, src/MapMakerCalib.cc): cameras bootstrap their metric
pose from the checkerboard at DIFFERENT times, track a shared
board-anchored map, and the extrinsics come from simultaneous map
tracking — never from simultaneous board views.

The full drive lives in scripts/zero_overlap_drive.py and runs in a
SUBPROCESS: XLA:CPU deterministically segfaults compiling one of its
programs when it runs after ~50 other test modules' compiles in the same
process (the same drive passes in isolation), so it gets a fresh process
the same way test_apps isolates the CLI binaries.
"""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import so3_exp
from mcptam_tpu.calib.pose_calib import _base_shift_gn

HERE = os.path.dirname(os.path.abspath(__file__))


def test_base_shift_gn_recovers_shift():
    """With observed cam-from-base poses rel_c @ s^-1, the GN must recover
    the shift s (ref base-shift redistribution, MapMakerCalib.cc:398-488)."""
    rng = np.random.default_rng(7)
    s_true = (
        np.asarray(so3_exp(jnp.asarray([0.03, -0.05, 0.02], jnp.float32)),
                   np.float64),
        np.array([0.04, -0.02, 0.06]),
    )
    rel = [(np.eye(3), np.zeros(3))]
    cfb = {}
    for c in range(3):
        if c == 0:
            R_rel, t_rel = np.eye(3), np.zeros(3)
        else:
            R_rel = np.asarray(
                so3_exp(jnp.asarray(rng.normal(size=3) * 0.4, jnp.float32)),
                np.float64,
            )
            t_rel = rng.normal(size=3) * 0.3
            rel.append((R_rel, t_rel))
        s_inv = (s_true[0].T, -s_true[0].T @ s_true[1])
        cfb[c] = (R_rel @ s_inv[0], R_rel @ s_inv[1] + t_rel)
    s = _base_shift_gn(cfb, rel, iters=10)
    # unit prior shrinks the estimate slightly; tolerance reflects that
    assert np.allclose(s[0], s_true[0], atol=0.02), s[0]
    assert np.allclose(s[1], s_true[1], atol=0.02), s[1]


@pytest.mark.slow
def test_zero_overlap_rig_calibrates():
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "..", "scripts",
                                      "zero_overlap_drive.py")],
        capture_output=True, text=True, timeout=1500, check=True,
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["running"] == [True, True], d
    assert d["groups_full"] > 0, "cameras never dropped keyframes together"
    assert d["rot_err"] < 0.01, (d, "rotation error >= 0.57 deg")
    assert d["trans_err"] < 0.02, (d, "translation error >= 2 cm")
