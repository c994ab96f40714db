"""Sub-stage perf breakdown of feats + track on the real chip."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax
import jax.numpy as jnp

from mcptam_tpu.config import TrackerConfig, LEVELS
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker import tracker as T
from mcptam_tpu.ops import fast as F
from mcptam_tpu.ops.pyramid import build_pyramid
from mcptam_tpu.ops.atlas import build_atlas
from mcptam_tpu.core.se3 import SE3

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(
    cams, cam_from_base, H, W, n_per_level=60,
    max_points=2048, max_mkfs=8, max_meas=8192,
)
tcfg = TrackerConfig()
images = jnp.asarray(render_rig(cams, cam_from_base, SE3.identity(), 3.0, H, W), jnp.float32)
ts0 = T.create_tracker_state(C)
feats = jax.jit(make_frame_features)(images)
jax.block_until_ready(feats)


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)
    return out


# ---- feats sub-stages
pyr = bench("pyramid", build_pyramid, images)
scores = bench("fast_scores(all levels)", lambda p: [F.fast_score_image(x) for x in p], pyr)
bench("adaptive_thresh L0", lambda s: jax.vmap(lambda x: F.adaptive_threshold(x))(s), scores[0])
bench("adaptive all levels", lambda ss: [jax.vmap(lambda x: F.adaptive_threshold(x))(s) for s in ss], scores)
bench("nonmax all levels", lambda ss: [F.nonmax_3x3(s) for s in ss], scores)
def topk_all(ss):
    out = []
    for l in range(LEVELS):
        k = 256 >> 0
        out.append(jax.vmap(lambda s: F.topk_corners(s, 256, 0.0))(ss[l]))
    return out
bench("topk all levels", topk_all, scores)
bench("atlas build", build_atlas, list(pyr))
bench("feats total", make_frame_features, images)

# ---- track sub-stages
pose = SE3.identity()
pvs = bench("compute_pvs", T.compute_pvs, ms, cams, pose)
N = ms.points.capacity
pri = T._pair_perm(C, N)

def fine_select(pvs):
    f_idx, f_ok = T._select_pairs(pvs["valid"], pri, tcfg.max_patches_per_frame)
    return f_idx, f_ok
(f_idx, f_ok) = bench("select_pairs", fine_select, pvs)
f_cam = (f_idx // N).astype(jnp.int32)
f_pt = (f_idx % N).astype(jnp.int32)
f_uv = pvs["uv"].reshape(-1, 2)[f_idx]
f_warp = pvs["warp"].reshape(-1, 2, 2)[f_idx]
f_lvl = pvs["level"].reshape(-1)[f_idx]

def do_search(feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok):
    return T.search_pairs(
        ms, feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok,
        tcfg.fine_range_first, jnp.asarray(float(tcfg.fine_range)), 10,
        max_ssd=64 * 250.0,
    )
ff_found, ff_pos, ff_sub = bench(
    "search_pairs fine(1000)", do_search, feats, f_cam, f_pt, f_uv, f_warp,
    f_lvl, f_ok,
)

def do_search_nosub(feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok):
    return T.search_pairs(
        ms, feats, f_cam, f_pt, f_uv, f_warp, f_lvl, f_ok,
        tcfg.fine_range_first, jnp.asarray(float(tcfg.fine_range)), 0,
        max_ssd=64 * 250.0,
    )
bench("search_pairs no-subpix", do_search_nosub, feats, f_cam, f_pt, f_uv,
      f_warp, f_lvl, f_ok)

def do_pose(pose, f_cam, f_pt, ff_found, ff_pos, f_lvl):
    return T.pose_solve(
        pose, ms, cams, f_cam, f_pt, ff_found, ff_pos, f_lvl,
        tcfg.fine_iterations, tcfg.tracking_prior, tcfg.mest_sigma_min,
    )
bench("pose_solve(10 iters)", do_pose, pose, f_cam, f_pt, ff_found, ff_pos, f_lvl)

def do_sbi(ts, feats):
    return T.calc_sbi_rotation(ts, feats, cams_sbi, ms.cam_from_base)
bench("sbi rotation", do_sbi, ts0, feats)

bench("track total", lambda ts, feats: T.track_frame(ts, ms, cams, cams_sbi, feats, tcfg), ts0, feats)
