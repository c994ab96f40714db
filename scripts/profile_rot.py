"""Perf split with ROTATING inputs (defeats any identical-input fast path)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
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
frames = [
    jnp.asarray(render_rig(
        cams, cam_from_base,
        SE3.exp(jnp.asarray([0.01 * i, 0, -0.005 * i, 0, 0.002 * i, 0])),
        3.0, H, W), jnp.float32)
    for i in range(4)
]
ts0 = create_tracker_state(C)

feats_fn = jax.jit(make_frame_features)
track_fn = jax.jit(lambda ts, feats: track_frame(ts, ms, cams, cams_sbi, feats, tcfg))
step_fn = jax.jit(lambda ts, images: track_frame(
    ts, ms, cams, cams_sbi, make_frame_features(images), tcfg))

featss = [feats_fn(f) for f in frames]
jax.block_until_ready(featss[-1])


def bench(name, fn, args_list, n=40):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    print(f"{name:22s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)


bench("feats (rotating)", feats_fn, [(f,) for f in frames])
bench("feats (same)", feats_fn, [(frames[0],)])
bench("track (rotating)", track_fn, [(ts0, ft) for ft in featss])
bench("track (same)", track_fn, [(ts0, featss[0])])
bench("step (rotating)", step_fn, [(ts0, f) for f in frames])
