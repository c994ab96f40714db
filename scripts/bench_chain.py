"""Trustworthy micro-bench: CHAINED inputs (each call consumes the
previous call's output) so no runtime replay/caching can fake the
timing."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

C, H, W = 4, 480, 640
img0 = jnp.asarray(np.random.rand(C, H, W).astype(np.float32) * 255)


def bench_chain(name, fn, x0, n=30):
    """fn: x -> (x_next, aux...); x chained through calls."""
    f = jax.jit(fn)
    x = f(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)


# pyramid variants: return perturbed L0 to chain
from mcptam_tpu.ops.pyramid import build_pyramid

def pyr_chain(x):
    p = build_pyramid(x)
    return p[0] + 1e-6 * p[0]

def pyr_rw(x):
    out = [x]
    for _ in range(3):
        out.append(jax.lax.reduce_window(
            out[-1], 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") * 0.25)
    return out[0] + 1e-6 * out[0]

bench_chain("pyramid strided (chained)", pyr_chain, img0)
bench_chain("pyramid reduce_window", pyr_rw, img0)

# FAST
from mcptam_tpu.ops.fast import fast_score_image, nonmax_3x3, adaptive_threshold, topk_corners

def fast_chain(x):
    s = fast_score_image(x)
    return x + 1e-9 * s

bench_chain("fast_score L0 (chained)", fast_chain, img0)

def nonmax_chain(x):
    return x + 1e-9 * nonmax_3x3(x)

bench_chain("nonmax L0 (chained)", nonmax_chain, img0)

def adapt_chain(x):
    t = jax.vmap(lambda s: adaptive_threshold(s))(x[..., ::2, :])
    return x + 1e-9 * t[:, None, None]

bench_chain("adaptive L0 (chained)", adapt_chain, img0)

def topk_chain(x):
    xy, vals, valid = jax.vmap(lambda s: topk_corners(s, 512, 0.0))(x)
    return x + 1e-9 * jnp.sum(vals, axis=-1)[:, None, None]

bench_chain("topk512 L0 exact (chained)", topk_chain, img0)

def topk_approx_chain(x):
    def one(s):
        vals, idx = jax.lax.approx_max_k(s.reshape(-1), 512, recall_target=0.95)
        return jnp.sum(vals)
    v = jax.vmap(one)(x)
    return x + 1e-9 * v[:, None, None]

bench_chain("topk512 L0 approx (chained)", topk_approx_chain, img0)

# full feats
from mcptam_tpu.map.keyframe import make_frame_features

def feats_chain(x):
    f = make_frame_features(x)
    return x + 1e-9 * f.atlas[:, :H, :W]

bench_chain("make_frame_features (chained)", feats_chain, img0)

# sbi
from mcptam_tpu.ops.sbi import make_sbi, sbi_gradients, esm_align

def sbi_chain(x):
    s = make_sbi(x)
    gx, gy = sbi_gradients(s)
    se2, score = jax.vmap(esm_align)(s, s, gx, gy)
    return x + 1e-9 * score[:, None, None]

bench_chain("sbi make+esm x4cam (chained)", sbi_chain, img0)
