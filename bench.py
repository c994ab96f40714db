"""Benchmark: 4-camera VGA end-to-end tracking throughput on one chip.

Prints ONE JSON line:
  {"metric": "tracking_fps_4cam_vga", "value": N, "unit": "fps",
   "vs_baseline": N/200}

The metric is the reference rebuild target (BASELINE.json north_star:
>= 200 FPS end-to-end 4-cam VGA tracking on one TPU v5e).  "End-to-end"
covers the full per-frame tracker pipeline: pyramid + FAST + candidate
extraction + SBI, SBI-ESM motion model, PVS over the whole map, coarse +
fine warped-patch ZMSSD search with subpixel refinement, and the robust
6-DOF pose solve — everything the reference's TrackerTiming `total`
covers except video decode.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
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
    ms, _ = build_groundtruth_map(
        cams, cam_from_base, H, W, n_per_level=60,
        max_points=2048, max_mkfs=8, max_meas=8192,
    )
    tcfg = TrackerConfig()

    @jax.jit
    def step(ts, ms, images):
        feats = make_frame_features(images)
        new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
        return new_ts, res.pose.t, res.tot_found

    # a short pre-rendered loop of frames (on device) so every step sees a
    # different image, like a live feed
    frames = []
    for i in range(4):
        v = jnp.asarray([0.01 * i, -0.005 * i, 0.008 * i, 0.002 * i, 0.0, 0.001 * i])
        frames.append(
            jnp.clip(
                jnp.asarray(render_rig(cams, cam_from_base, SE3.exp(v), 3.0, H, W)),
                0, 255,
            ).astype(jnp.uint8)
        )

    ts = create_tracker_state(C)
    # warmup / compile
    ts, t_out, found = step(ts, ms, frames[0])
    t_out.block_until_ready()

    n_iters = 60
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, t_out, found = step(ts, ms, frames[i % len(frames)])
    t_out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "tracking_fps_4cam_vga",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 200.0, 4),
    }))


if __name__ == "__main__":
    main()
