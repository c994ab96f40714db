"""Micro-bench: window-gather strategies for the patch search."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

C, H, AW = 4, 480, 1264
K, G = 1024, 32
atlas = jnp.asarray(np.random.rand(C, H, AW).astype(np.float32))
rng = np.random.default_rng(0)
cam = jnp.asarray(rng.integers(0, C, K), jnp.int32)
y0 = jnp.asarray(rng.integers(0, H - G, K), jnp.int32)
x0 = jnp.asarray(rng.integers(0, AW - G, K), jnp.int32)


def bench(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)


# A: vmapped dynamic_slice (current approach) -> (K,G,G)
def strat_a(cam, y0, x0):
    def per(c, y, x):
        return jax.lax.dynamic_slice(atlas, (c, y, x), (1, G, G))[0]
    return jax.vmap(per)(cam, y0, x0)

# B: flat single-element gather, K minor -> (G,G,K)
def strat_b(cam, y0, x0):
    flat = atlas.reshape(-1)
    base = (cam * H + y0) * AW + x0
    offs = jnp.arange(G)[:, None] * AW + jnp.arange(G)[None, :]
    idx = offs[:, :, None] + base[None, None, :]
    return flat[idx]

# C: row-chunk gather via vmap over K and G of 64-wide dynamic slices
def strat_c(cam, y0, x0):
    x_al = x0 & ~31  # 32-aligned, width 64 covers x0+G
    a2 = atlas.reshape(C * H, AW)
    def per(c, y, xa):
        r = c * H + y
        def row(a):
            return jax.lax.dynamic_slice(a2, (r + a, xa), (1, 64))[0]
        return jax.vmap(row)(jnp.arange(G))
    return jax.vmap(per)(cam, y0, x_al)

# D: one lax.gather of (1,64) slices
def strat_d(cam, y0, x0):
    x_al = x0 & ~31
    a2 = atlas.reshape(C * H, AW)
    rows = (cam * H + y0)[:, None] + jnp.arange(G)[None, :]  # (K,G)
    starts = jnp.stack(
        [rows.reshape(-1), jnp.repeat(x_al, G)], axis=-1
    )  # (K*G, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    out = jax.lax.gather(
        a2, starts, dn, slice_sizes=(1, 64), mode="clip"
    )  # (K*G,1,64)
    return out.reshape(K, G, 64)

# E: like D but 128-wide aligned chunks
def strat_e(cam, y0, x0):
    x_al = x0 & ~127
    a2 = atlas.reshape(C * H, AW)
    rows = (cam * H + y0)[:, None] + jnp.arange(G)[None, :]
    starts = jnp.stack([rows.reshape(-1), jnp.repeat(x_al, G)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    out = jax.lax.gather(a2, starts, dn, slice_sizes=(1, 160), mode="clip")
    return out.reshape(K, G, 160)

# F: whole-window gather with slice (G,G) -> one gather of K windows
def strat_f(cam, y0, x0):
    starts = jnp.stack([cam * H + y0, x0], axis=-1)  # treat rows globally
    a2 = atlas.reshape(C * H, AW)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    return jax.lax.gather(a2, starts, dn, slice_sizes=(G, G), mode="clip")

bench("A vmapped dynamic_slice (K,G,G)", strat_a, cam, y0, x0)
bench("B flat elem gather (G,G,K)", strat_b, cam, y0, x0)
bench("C vmap 64-wide row slices", strat_c, cam, y0, x0)
bench("D lax.gather (1,64) rows", strat_d, cam, y0, x0)
bench("E lax.gather (1,160) rows", strat_e, cam, y0, x0)
bench("F lax.gather (G,G) windows", strat_f, cam, y0, x0)
