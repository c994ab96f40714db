"""Micro-bench the stages inside find_patches / subpix for K=1024."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.config import PATCH_SIZE
from mcptam_tpu.ops.patch import PACK_CORNER, HALF, _SUBPIX_PAD

K = 1024
R = 10
S = 2 * R + 1
G = S + PATCH_SIZE
P = _SUBPIX_PAD
G2 = G + 2 * P

rng = np.random.default_rng(0)
region_raw = jnp.asarray(rng.standard_normal((K, G2, G2)), jnp.float32)
templates = jnp.asarray(rng.standard_normal((K, 8, 8)), jnp.float32)


def bench(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)


def decode(region_raw):
    flag2 = region_raw >= PACK_CORNER / 2
    region2 = region_raw - PACK_CORNER * flag2.astype(region_raw.dtype)
    region = region2[:, P:P+G, P:P+G]
    reg = jnp.transpose(region, (1, 2, 0))
    return reg, region2

bench("decode+transpose", lambda r: decode(r)[0], region_raw)

reg = jnp.asarray(rng.standard_normal((G, G, K)), jnp.float32)

def box8(a):
    rows = sum(a[:, px:px+S, :] for px in range(PATCH_SIZE))
    return sum(rows[py:py+S, :, :] for py in range(PATCH_SIZE))

bench("box8(reg) + box8(reg*reg)", lambda a: box8(a) + box8(a * a), reg)


def conv_cross(reg, t):
    filt = jnp.transpose(t, (1, 2, 0))[:, :, None, :]
    return jax.lax.conv_general_dilated(
        reg[None], filt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=t.shape[0],
        precision=jax.lax.Precision.HIGHEST,
    )[0][:S, :S]

bench("cross depthwise conv", conv_cross, reg, templates)


def argmin_stage(scores):
    flat = scores.reshape(S * S, K)
    best = jnp.argmin(flat, axis=0)
    return best, jnp.min(flat, axis=0)

scores = jnp.asarray(rng.standard_normal((S, S, K)), jnp.float32)
bench("mask+argmin", argmin_stage, scores)


def onehot_window(region2, by, bx):
    WSZ = PATCH_SIZE + 1 + 2 * P
    reg2T = jnp.transpose(region2, (1, 2, 0))
    ohy = jax.nn.one_hot(by, S, axis=-1)
    ohx = jax.nn.one_hot(bx, S, axis=-1)
    rows15 = sum(ohy[:, p] * reg2T[p:p+WSZ, :, :] for p in range(S))
    winT = sum(ohx[:, q] * rows15[:, q:q+WSZ, :] for q in range(S))
    return winT

by = jnp.asarray(rng.integers(0, S, K), jnp.int32)
bx = jnp.asarray(rng.integers(0, S, K), jnp.int32)
region2 = jnp.asarray(rng.standard_normal((K, G2, G2)), jnp.float32)
bench("subpix one-hot window extract", onehot_window, region2, by, bx)


# template generation (from batch_patch)
from mcptam_tpu.ops.batch_patch import make_warped_templates, _SRC_HALF
from mcptam_tpu.ops.atlas import level_size_arrays

SW = 2 * _SRC_HALF + 2
src_win = jnp.asarray(rng.standard_normal((K, SW, SW)), jnp.float32)
win_ok = jnp.ones(K, bool)
level_hw = level_size_arrays(480, 640)
src_level = jnp.zeros(K, jnp.int32)
center = jnp.full((K, 2), 100.0)
warp = jnp.broadcast_to(jnp.eye(2), (K, 2, 2))
slvl = jnp.zeros(K, jnp.int32)
bench("make_warped_templates", make_warped_templates,
      src_win, win_ok, level_hw, src_level, center, warp, slvl)
