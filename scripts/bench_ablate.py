"""Ablation timing on REAL rotating frames (the only trustworthy
measurement on this runtime): end-to-end step time with stages disabled
one at a time.  The difference full-vs-ablated is the stage's true cost."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import dataclasses
import jax
import jax.numpy as jnp

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker import tracker as T
from mcptam_tpu.core.se3 import SE3

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(cams, cam_from_base, H, W, n_per_level=60,
    max_points=2048, max_mkfs=8, max_meas=8192)
N_FRAMES = 16
frames = [jnp.asarray(render_rig(cams, cam_from_base,
    SE3.exp(jnp.asarray([0.004*i, -0.002*i, 0.003*i, 0.0005*i, 0.001*i, 0])),
    3.0, H, W), jnp.float32) for i in range(N_FRAMES)]
ts0 = T.create_tracker_state(C)


def bench(name, tcfg, mode="full", n=48):
    if mode == "feats_only":
        fn = jax.jit(lambda ts, images: (ts, make_frame_features(images).atlas))
    else:
        fn = jax.jit(lambda ts, images: T.track_frame(
            ts, ms, cams, cams_sbi, make_frame_features(images), tcfg))
    ts = ts0
    out = fn(ts, frames[0])
    jax.block_until_ready(out)
    ts = ts0
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(ts, frames[i % N_FRAMES])
        if mode != "feats_only":
            ts = r[0].replace(pose=ts0.pose, vel=ts0.vel)  # keep pose bounded
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)


base = TrackerConfig()
bench("feats only", base, mode="feats_only")
bench("full (baseline)", base)
bench("subpix 0 (fine+coarse)", dataclasses.replace(
    base, coarse_sub_pix_its=0, fine_sub_pix_its=0))
bench("fine 500 patches", dataclasses.replace(base, max_patches_per_frame=500))
bench("fine 250 patches", dataclasses.replace(base, max_patches_per_frame=250))
bench("coarse off (max=1)", dataclasses.replace(base, coarse_max=1, coarse_min=999))
bench("pose iters 3/3", dataclasses.replace(base, coarse_iterations=3, fine_iterations=3))
bench("fine range 5 only", dataclasses.replace(base, fine_range_first=5))

bench("sbi rotation off", dataclasses.replace(base, use_sbi_rotation=False))

# map-capacity (PVS size) variants
for cap in (1024, 512):
    ms_small, _ = build_groundtruth_map(
        cams, cam_from_base, H, W, n_per_level=60,
        max_points=cap, max_mkfs=8, max_meas=8192,
    )
    _ms_save = ms
    ms = ms_small
    bench(f"map capacity {cap}", base)
    ms = _ms_save
