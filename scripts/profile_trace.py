"""Capture an XLA op-level profile of the scan-4 tracking step on TPU."""
import os, sys, time, glob
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(cams, cam_from_base, H, W, n_per_level=60,
                              max_points=2048, max_mkfs=8, max_meas=8192)
tcfg = TrackerConfig()

frames = []
for i in range(4):
    v = jnp.asarray([0.01 * i, -0.005 * i, 0.008 * i, 0.002 * i, 0.0, 0.001 * i])
    frames.append(jnp.clip(jnp.asarray(
        render_rig(cams, cam_from_base, SE3.exp(v), 3.0, H, W)), 0, 255
    ).astype(jnp.uint8))
frames4 = jnp.stack(frames)
ts0 = create_tracker_state(C)


@jax.jit
def step_scan(ts, frames4):
    def body(ts, img):
        feats = make_frame_features(img)
        new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
        return new_ts, res.pose.t[0] + res.tot_found
    return jax.lax.scan(body, ts, frames4)


ts, out = step_scan(ts0, frames4)
jax.block_until_ready(out)

logdir = "/tmp/jax_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
ts = ts0
for _ in range(5):
    ts, out = step_scan(ts, frames4)
jax.block_until_ready(out)
jax.profiler.stop_trace()

files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
