"""Honest per-component costs: scan-4 full step with components toggled."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import dataclasses
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

frames = []
for i in range(4):
    v = jnp.asarray([0.01 * i, -0.005 * i, 0.008 * i, 0.002 * i, 0.0, 0.001 * i])
    frames.append(jnp.clip(jnp.asarray(
        render_rig(cams, cam_from_base, SE3.exp(v), 3.0, H, W)), 0, 255
    ).astype(jnp.uint8))
frames4 = jnp.stack(frames)

ts0 = create_tracker_state(C)


def bench(name, tcfg, feats_only=False):
    @jax.jit
    def step_scan(ts, frames4):
        def body(ts, img):
            feats = make_frame_features(img)
            if feats_only:
                return ts, (jnp.sum(feats.atlas) + jnp.sum(feats.sbi)
                            + jnp.sum(feats.corner_atlas))
            new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
            return new_ts, res.pose.t[0] + res.tot_found
        return jax.lax.scan(body, ts, frames4)

    ts, out = step_scan(ts0, frames4)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    ts = ts0
    for _ in range(n):
        ts, out = step_scan(ts, frames4)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:34s} {dt/(n*4)*1000:6.2f} ms/frame", flush=True)


base = TrackerConfig()
bench("features only", base, feats_only=True)
bench("full", base)
bench("no sbi rotation", dataclasses.replace(base, use_sbi_rotation=False))
bench("no subpix", dataclasses.replace(base, fine_sub_pix_its=0, coarse_sub_pix_its=0))
bench("no coarse", dataclasses.replace(base, coarse_max=8))
bench("fine iters 4", dataclasses.replace(base, fine_iterations=4))
bench("half patches", dataclasses.replace(base, max_patches_per_frame=512))
