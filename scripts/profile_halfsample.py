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


# --- context test: does adding the SBI resize force gather lowering? ---
def with_resize(hs):
    def f(a):
        p1 = hs(a)
        p2 = hs(p1)
        p3 = hs(p2)
        small = jax.image.resize(a, a.shape[:-2] + (30, 40), method="linear")
        return p1.sum() + p2.sum() + p3.sum() + small.sum()
    return f

print("-- with jax.image.resize in the graph --", flush=True)
bench("strided+resize", with_resize(hs_strided), img)
bench("matmul+resize", with_resize(hs_matmul), img)


def resize_mm(a):
    import numpy as np2
    def wmat(n_in, n_out):
        s = n_in / n_out
        j = np2.arange(n_in)[:, None]
        i = np2.arange(n_out)[None, :]
        w = np2.maximum(0.0, 1.0 - np2.abs((j + 0.5) / s - (i + 0.5)))
        w = w / w.sum(axis=0, keepdims=True)
        return jnp.asarray(w, jnp.float32)
    Wh = wmat(a.shape[-2], 30)   # (480,30)
    Ww = wmat(a.shape[-1], 40)   # (640,40)
    y = a @ Ww                                  # (...,480,40)
    return jnp.einsum("hr,...hw->...rw", Wh, y)  # (...,30,40)

ref = jax.image.resize(img, (C, 30, 40), method="linear")
got = resize_mm(img)
print("resize_mm vs jax.image.resize max|diff| =",
      float(jnp.max(jnp.abs(ref - got))), "scale", float(jnp.max(jnp.abs(ref))), flush=True)

def with_resize_mm(hs):
    def f(a):
        p1 = hs(a); p2 = hs(p1); p3 = hs(p2)
        return p1.sum() + p2.sum() + p3.sum() + resize_mm(a).sum()
    return f

print("-- with matmul resize in the graph --", flush=True)
bench("strided+resize_mm", with_resize_mm(hs_strided), img)


def resize_mm2(a):
    import numpy as np2
    def wmat(n_in, n_out):
        s = n_in / n_out
        j = np2.arange(n_in)[:, None]
        i = np2.arange(n_out)[None, :]
        w = np2.maximum(0.0, 1.0 - np2.abs((j + 0.5) / s - (i + 0.5)))
        w = w / w.sum(axis=0, keepdims=True)
        return jnp.asarray(w, jnp.float32)
    Wh = wmat(a.shape[-2], 30)   # (480,30)
    Ww = wmat(a.shape[-1], 40)   # (640,40)
    y = a @ Ww                          # (...,480,40) natural-layout matmul
    yT = jnp.swapaxes(y, -1, -2)        # (...,40,480) small explicit transpose
    s = yT @ Wh                         # (...,40,30)
    return jnp.swapaxes(s, -1, -2)      # (...,30,40)

ref = jax.image.resize(img, (C, 30, 40), method="linear")
print("resize_mm2 max|diff| =", float(jnp.max(jnp.abs(ref - resize_mm2(img)))), flush=True)

def with_resize_mm2(hs):
    def f(a):
        p1 = hs(a); p2 = hs(p1); p3 = hs(p2)
        return p1.sum() + p2.sum() + p3.sum() + resize_mm2(a).sum()
    return f

print("-- with small-transpose matmul resize --", flush=True)
bench("strided+resize_mm2", with_resize_mm2(hs_strided), img)
