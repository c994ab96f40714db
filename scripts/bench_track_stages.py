"""Chained (replay-proof) per-stage timing of track_frame internals."""
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
from mcptam_tpu.tracker import tracker as T
from mcptam_tpu.core.se3 import SE3

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(cams, cam_from_base, H, W, n_per_level=60,
    max_points=2048, max_mkfs=8, max_meas=8192)
tcfg = TrackerConfig()
img = jnp.asarray(render_rig(cams, cam_from_base, SE3.identity(), 3.0, H, W), jnp.float32)
feats = jax.jit(make_frame_features)(img)
jax.block_until_ready(feats.atlas)
ts0 = T.create_tracker_state(C)
N = ms.points.capacity
pri = T._pair_perm(C, N)


def bench_chain(name, fn, x0, n=30):
    f = jax.jit(fn)
    x = f(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)


# chain through a tiny pose perturbation each call
def pvs_chain(eps):
    pose = SE3.exp(jnp.concatenate([eps[None] * 1e-6, jnp.zeros(5)]))
    pvs = T.compute_pvs(ms, cams, pose)
    return eps + 1e-9 * jnp.sum(pvs["uv"])

bench_chain("compute_pvs", pvs_chain, jnp.zeros(()))


def select_chain(eps):
    pose = SE3.exp(jnp.concatenate([eps[None] * 1e-6, jnp.zeros(5)]))
    pvs = T.compute_pvs(ms, cams, pose)
    f_idx, f_ok = T._select_pairs(pvs["valid"], pri, tcfg.max_patches_per_frame)
    return eps + 1e-9 * jnp.sum(f_idx)

bench_chain("pvs+select", select_chain, jnp.zeros(()))


def gathersel_chain(eps):
    pose = SE3.exp(jnp.concatenate([eps[None] * 1e-6, jnp.zeros(5)]))
    pvs = T.compute_pvs(ms, cams, pose)
    f_idx, f_ok = T._select_pairs(pvs["valid"], pri, tcfg.max_patches_per_frame)
    f_warp = pvs["warp"].reshape(-1, 2, 2)[f_idx]
    f_lvl = pvs["level"].reshape(-1)[f_idx]
    f_uv = pvs["uv"].reshape(-1, 2)[f_idx]
    return eps + 1e-9 * (jnp.sum(f_warp) + jnp.sum(f_uv) + jnp.sum(f_lvl))

bench_chain("pvs+select+gather", gathersel_chain, jnp.zeros(()))


def search_chain(eps):
    pose = SE3.exp(jnp.concatenate([eps[None] * 1e-6, jnp.zeros(5)]))
    pvs = T.compute_pvs(ms, cams, pose)
    f_idx, f_ok = T._select_pairs(pvs["valid"], pri, tcfg.max_patches_per_frame)
    f_cam = (f_idx // N).astype(jnp.int32)
    f_pt = (f_idx % N).astype(jnp.int32)
    f_uv = pvs["uv"].reshape(-1, 2)[f_idx]
    f_warp = pvs["warp"].reshape(-1, 2, 2)[f_idx]
    f_lvl = pvs["level"].reshape(-1)[f_idx]
    ff, fp, fs = T.search_pairs(
        ms, feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok,
        tcfg.fine_range_first, jnp.asarray(float(tcfg.fine_range)), 10,
        max_ssd=64 * 250.0,
    )
    return eps + 1e-9 * jnp.sum(fp)

bench_chain("...+search(1000, subpix10)", search_chain, jnp.zeros(()))


def search0_chain(eps):
    pose = SE3.exp(jnp.concatenate([eps[None] * 1e-6, jnp.zeros(5)]))
    pvs = T.compute_pvs(ms, cams, pose)
    f_idx, f_ok = T._select_pairs(pvs["valid"], pri, tcfg.max_patches_per_frame)
    f_cam = (f_idx // N).astype(jnp.int32)
    f_pt = (f_idx % N).astype(jnp.int32)
    f_uv = pvs["uv"].reshape(-1, 2)[f_idx]
    f_warp = pvs["warp"].reshape(-1, 2, 2)[f_idx]
    f_lvl = pvs["level"].reshape(-1)[f_idx]
    ff, fp, fs = T.search_pairs(
        ms, feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok,
        tcfg.fine_range_first, jnp.asarray(float(tcfg.fine_range)), 0,
        max_ssd=64 * 250.0,
    )
    return eps + 1e-9 * jnp.sum(fp)

bench_chain("...+search(1000, nosubpix)", search0_chain, jnp.zeros(()))


def full_chain(eps):
    v = jnp.zeros(6).at[0].set(eps * 1e-6)
    ts = ts0.replace(pose=SE3.exp(v))
    new_ts, res = T.track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
    return eps + 1e-9 * jnp.sum(res.pose.t)

bench_chain("track_frame full", full_chain, jnp.zeros(()))


def sbi_chain(eps):
    ts = ts0.replace(sbi_prev=ts0.sbi_prev + eps * 1e-6, have_prev=jnp.ones((), bool))
    w, ok = T.calc_sbi_rotation(ts, feats, cams_sbi, ms.cam_from_base)
    return eps + 1e-9 * jnp.sum(w)

bench_chain("sbi rotation", sbi_chain, jnp.zeros(()))
