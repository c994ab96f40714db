"""Micro-bench: pyramid downsample + FAST shift strategies."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

C, H, W = 4, 480, 640
img = jnp.asarray(np.random.rand(C, H, W).astype(np.float32) * 255)


def bench(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)


# --- downsample variants
def down_strided(x):
    return (x[..., ::2, ::2] + x[..., ::2, 1::2]
            + x[..., 1::2, ::2] + x[..., 1::2, 1::2]) * 0.25

def down_reduce_window(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") * 0.25

def down_conv(x):
    k = jnp.full((1, 1, 2, 2), 0.25, jnp.float32)
    return jax.lax.conv_general_dilated(
        x[:, None], k, (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

def down_reshape(x):
    Cc, Hh, Ww = x.shape
    r = x.reshape(Cc, Hh // 2, 2, Ww // 2, 2)
    return r.mean(axis=(2, 4))

def pyr(down):
    def f(x):
        out = [x]
        for _ in range(3):
            out.append(down(out[-1]))
        return out
    return f

bench("pyramid strided-slice", pyr(down_strided), img)
bench("pyramid reduce_window", pyr(down_reduce_window), img)
bench("pyramid conv stride2", pyr(down_conv), img)
bench("pyramid reshape-mean", pyr(down_reshape), img)

# --- FAST shift strategies
RING = ((-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1))

def fast_roll(x):
    rings = jnp.stack([jnp.roll(x, (-dy, -dx), (-2, -1)) for dy, dx in RING], -1)
    d = rings - x[..., None]
    m2 = jnp.minimum(d, jnp.roll(d, -1, -1))
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, -1))
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, -1))
    m10 = jnp.minimum(m8, jnp.roll(m2, -8, -1))
    e = -d
    e2 = jnp.minimum(e, jnp.roll(e, -1, -1))
    e4 = jnp.minimum(e2, jnp.roll(e2, -2, -1))
    e8 = jnp.minimum(e4, jnp.roll(e4, -4, -1))
    e10 = jnp.minimum(e8, jnp.roll(e2, -8, -1))
    return jnp.maximum(jnp.maximum(m10.max(-1), e10.max(-1)), 0.0)

def fast_pad_slice(x):
    # pad once; ring views are static slices (no roll relayouts);
    # circular windows via python-level lists (fully unrolled DAG)
    B = 3
    xp = jnp.pad(x, ((0, 0), (B, B), (B, B)))
    Hh, Ww = x.shape[-2:]
    d = [xp[..., B + dy : B + dy + Hh, B + dx : B + dx + Ww] - x
         for dy, dx in RING]
    def win10(vals):
        m2 = [jnp.minimum(vals[a], vals[(a + 1) % 16]) for a in range(16)]
        m4 = [jnp.minimum(m2[a], m2[(a + 2) % 16]) for a in range(16)]
        m8 = [jnp.minimum(m4[a], m4[(a + 4) % 16]) for a in range(16)]
        m10 = [jnp.minimum(m8[a], m2[(a + 8) % 16]) for a in range(16)]
        out = m10[0]
        for a in range(1, 16):
            out = jnp.maximum(out, m10[a])
        return out
    bright = win10(d)
    dark = win10([-v for v in d])
    return jnp.maximum(jnp.maximum(bright, dark), 0.0)

bench("fast roll-stack", fast_roll, img)
bench("fast pad+static-slice", fast_pad_slice, img)

# sanity: same result (border aside)
a = jax.jit(fast_roll)(img)[..., 4:-4, 4:-4]
b = jax.jit(fast_pad_slice)(img)[..., 4:-4, 4:-4]
print("fast variants agree:", bool(jnp.allclose(a, b, atol=1e-4)))
