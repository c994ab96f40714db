"""Perf study of the full tracking step on the real chip (cache-assisted)."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax
import jax.numpy as jnp

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state
from mcptam_tpu.core.se3 import SE3

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(
    cams, cam_from_base, H, W, n_per_level=60,
    max_points=2048, max_mkfs=8, max_meas=8192,
)
tcfg = TrackerConfig()
frames = jnp.stack([
    jnp.asarray(
        render_rig(
            cams, cam_from_base,
            SE3.exp(jnp.asarray([0.01 * i, 0, -0.005 * i, 0, 0.002 * i, 0])),
            3.0, H, W,
        ),
        jnp.float32,
    )
    for i in range(2)
])
ts0 = create_tracker_state(C)


@jax.jit
def feats_fn(images):
    return make_frame_features(images)


@jax.jit
def track_fn(ts, feats):
    new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
    return new_ts, res.pose.t


@jax.jit
def step(ts, images):
    feats = make_frame_features(images)
    new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
    return new_ts, res.pose.t


def bench_call(name, fn, *args, n=30):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    o = None
    for i in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name} async-loop: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    t0 = time.perf_counter()
    for i in range(10):
        o = fn(*args)
        jax.block_until_ready(o)
    print(f"{name} sync: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
    return out


feats = bench_call("feats", feats_fn, frames[0])
bench_call("track", track_fn, ts0, feats)
bench_call("step", step, ts0, frames[0])
