"""Chained (replay-proof) timing of make_frame_features sub-stages."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp

from mcptam_tpu.config import LEVELS, MAX_CANDIDATES_PER_LEVEL
from mcptam_tpu.io.synthetic import make_rig, render_rig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.map import keyframe as KF
from mcptam_tpu.ops.pyramid import build_pyramid
from mcptam_tpu.ops.fast import adaptive_threshold_from_freq, topk_corners_blocked
from mcptam_tpu.ops.fast_pallas import fast_frontend_auto
from mcptam_tpu.ops.atlas import build_atlas
from mcptam_tpu.ops.sbi import make_sbi, sbi_gradients

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
img = jnp.asarray(render_rig(cams, cam_from_base, SE3.identity(), 3.0, H, W), jnp.float32)


def bench_chain(name, fn, n=30):
    f = jax.jit(fn)
    x = f(img + 0.0)
    jax.block_until_ready(x)
    x = img
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)


def chain_out(images, *vals):
    """Return an image-shaped carry perturbed by the outputs (defeats CSE)."""
    s = sum(jnp.sum(v.astype(jnp.float32)) for v in vals)
    return images + 1e-20 * s


bench_chain("pyramid", lambda im: chain_out(im, *build_pyramid(im)))
bench_chain("pyramid+fast_frontend", lambda im: chain_out(
    im, *[x for l in range(LEVELS) for x in fast_frontend_auto(build_pyramid(im)[l])]))


def thresh_chain(im):
    pyr = build_pyramid(im)
    fronts = [fast_frontend_auto(pyr[l]) for l in range(LEVELS)]
    outs = []
    for l in range(LEVELS):
        h, w = pyr[l].shape[-2:]
        t = adaptive_threshold_from_freq(fronts[l][2], h * w, 5, 60, 500.0)
        cm = (fronts[l][0] > t[:, None, None] - 1e-6)
        outs += [t, jnp.sum(cm, axis=(-2, -1))]
    return chain_out(im, *outs)


bench_chain("...+thresh+cornermaps", thresh_chain)


def atlas_chain(im):
    pyr = build_pyramid(im)
    fronts = [fast_frontend_auto(pyr[l]) for l in range(LEVELS)]
    cms = [(fronts[l][0] > 9.0) for l in range(LEVELS)]
    a = build_atlas(pyr)
    ca = build_atlas([m.astype(jnp.float32) for m in cms])
    return chain_out(im, a, ca)


bench_chain("pyr+fast+2x build_atlas", atlas_chain)


def topk_chain(im):
    pyr = build_pyramid(im)
    fronts = [fast_frontend_auto(pyr[l]) for l in range(LEVELS)]
    outs = []
    for l in range(LEVELS):
        k = min(MAX_CANDIDATES_PER_LEVEL[l], (H >> l) * (W >> l))
        h, w = pyr[l].shape[-2:]
        border = KF._border_mask(h, w, KF.CANDIDATE_BORDER)
        masked_nm = jnp.where((fronts[l][0] > 9.0) & border, fronts[l][1], 0.0)
        xy, vals, valid = jax.vmap(
            lambda s: topk_corners_blocked(s, k, 0.0, block=2)
        )(masked_nm)
        outs += [xy, vals, valid]
    return chain_out(im, *outs)


bench_chain("pyr+fast+topk", topk_chain)

bench_chain("sbi", lambda im: chain_out(im, make_sbi(im), *sbi_gradients(make_sbi(im))))

bench_chain("make_frame_features FULL", lambda im: chain_out(
    im, KF.make_frame_features(im).atlas,
    KF.make_frame_features(im).corner_atlas,
    *KF.make_frame_features(im).cand_xy,
))
