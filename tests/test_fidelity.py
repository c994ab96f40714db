"""North-star fidelity gate: the shipped float32 bundle adjuster must match
a double-precision solve of the same problem within 1e-3 px RMS reprojection
error (BASELINE.md rebuild target; the reference's g2o/CHOLMOD ChainBundle
is double precision, src/ChainBundle.cc:1147-1161).

The float64 oracle runs in a subprocess because JAX_ENABLE_X64 is a
process-global switch that would change dtype promotion for every other
test in this suite.
"""

import json
import os
import subprocess
import sys

import numpy as np

from mcptam_tpu.ba.bundle import create_lm_state, lm_run

from test_bundle import build_problem, rms_reproj

SEED, N_POSES, N_POINTS, N_CAMS = 7, 3, 80, 2
NOISE_PX, N_STEPS = 0.3, 100

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_f32_ba_matches_f64_oracle_within_1e3_px():
    rng = np.random.default_rng(SEED)
    prob, cams, _, _, _ = build_problem(
        rng, n_poses=N_POSES, n_points=N_POINTS, n_cams=N_CAMS,
        noise_px=NOISE_PX,
    )
    st = lm_run(prob, create_lm_state(prob), cams, N_STEPS)
    rms32 = rms_reproj(prob, st, cams)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no need for the 8-device mesh here
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "fidelity_oracle.py"),
         str(SEED), str(N_POSES), str(N_POINTS), str(N_CAMS),
         str(NOISE_PX), str(N_STEPS)],
        env=env, capture_output=True, text=True, timeout=600, check=True,
    )
    oracle = json.loads(out.stdout.strip().splitlines()[-1])
    assert oracle["dtype"] == "float64"

    # both must have actually converged onto the noise floor, not merely
    # agree while diverged
    assert rms32 < NOISE_PX * 3
    assert abs(rms32 - oracle["rms"]) < 1e-3, (rms32, oracle)
