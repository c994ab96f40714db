"""half_sample variants on TPU: strided slice vs reshape vs conv vs matmul."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

H, W, C = 480, 640, 4
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((C, H, W)), jnp.float32)


def hs_strided(a):
    return (a[..., 0::2, 0::2] + a[..., 0::2, 1::2]
            + a[..., 1::2, 0::2] + a[..., 1::2, 1::2]) * 0.25


def hs_reshape(a):
    s = a.shape
    a = a.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
    return a.sum(axis=(-3, -1)) * 0.25


def hs_conv(a):
    s = a.shape
    x = a.reshape((-1,) + s[-2:] + (1,))
    k = jnp.full((2, 2, 1, 1), 0.25, a.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(s[:-2] + (s[-2] // 2, s[-1] // 2))


def hs_matmul(a):
    s = a.shape
    h, w = s[-2], s[-1]
    Pw = jnp.zeros((w, w // 2), a.dtype).at[
        (jnp.arange(w), jnp.arange(w) // 2)].set(0.5)
    Ph = jnp.zeros((h // 2, h), a.dtype).at[
        (jnp.arange(h) // 2, jnp.arange(h))].set(0.5)
    y = a @ Pw                      # (...,h,w/2)
    return jnp.einsum("ij,...jk->...ik", Ph, y)


def full_pyramid(hs):
    def f(a):
        p1 = hs(a)
        p2 = hs(p1)
        p3 = hs(p2)
        return p1.sum() + p2.sum() + p3.sum()
    return f


def bench(name, fn, *args, n=100):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)


for name, hs in [("strided", hs_strided), ("reshape", hs_reshape),
                 ("conv", hs_conv), ("matmul", hs_matmul)]:
    bench(name, full_pyramid(hs), img)
    # correctness
    ref = np.asarray(jax.jit(hs_strided)(img))
    got = np.asarray(jax.jit(hs)(img))
    print(f"  max|diff| = {np.abs(ref - got).max():.2e}", flush=True)
