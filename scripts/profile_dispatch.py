"""Dispatch-overhead probe: per-call step vs scan-of-T-frames per call."""
import os, sys, time
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
frames4 = jnp.stack(frames)          # (4,C,H,W)


@jax.jit
def step(ts, ms, images):
    feats = make_frame_features(images)
    new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
    return new_ts, res.pose.t, res.tot_found


@jax.jit
def step_scan4(ts, ms, frames4):
    def body(ts, img):
        feats = make_frame_features(img)
        new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
        return new_ts, (res.pose.t, res.tot_found)
    ts, (tt, ff) = jax.lax.scan(body, ts, frames4)
    return ts, tt, ff


ts0 = create_tracker_state(C)

ts, t_out, _ = step(ts0, ms, frames[0])
t_out.block_until_ready()
n = 60
t0 = time.perf_counter()
ts = ts0
for i in range(n):
    ts, t_out, _ = step(ts, ms, frames4[i % 4])
t_out.block_until_ready()
dt = time.perf_counter() - t0
print(f"per-call:   {dt/n*1000:6.2f} ms/frame ({n/dt:6.1f} FPS)", flush=True)

ts, tt, _ = step_scan4(ts0, ms, frames4)
tt.block_until_ready()
n = 20
t0 = time.perf_counter()
ts = ts0
for i in range(n):
    ts, tt, _ = step_scan4(ts, ms, frames4)
tt.block_until_ready()
dt = time.perf_counter() - t0
print(f"scan-4:     {dt/(n*4)*1000:6.2f} ms/frame ({n*4/dt:6.1f} FPS)", flush=True)
