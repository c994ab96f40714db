"""Prototype Pallas half-sample kernel: correctness + speed on TPU."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hs_kernel_strided(img_ref, out_ref, *, TR, W):
    x = img_ref[0]
    s = x[0::2, :] + x[1::2, :]          # sublane stride-2
    out_ref[0] = (s[:, 0::2] + s[:, 1::2]) * 0.25   # lane stride-2


def _hs_kernel_matmul(rh_ref, cw_ref, img_ref, out_ref, *, TR, W):
    x = img_ref[0]
    s = jnp.dot(rh_ref[...], x, preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(s, cw_ref[...], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("variant",))
def hs_pallas(img, variant="strided"):
    C, H, W = img.shape
    TR = 48 if H % 48 == 0 else 16
    while H % TR:
        TR //= 2
    nH = H // TR
    Wp = -(-W // 256) * 256  # even number of lane tiles

    imgp = jnp.pad(img, ((0, 0), (0, 0), (0, Wp - W))) if Wp != W else img

    if variant == "strided":
        kern = functools.partial(_hs_kernel_strided, TR=TR, W=W)
        args = (imgp,)
        in_specs = [pl.BlockSpec((1, TR, Wp), lambda c, i: (c, i, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        rh = np.zeros((TR // 2, TR), np.float32)
        rh[np.arange(TR) // 2, np.arange(TR)] = 0.25
        cw = np.zeros((Wp, Wp // 2), np.float32)
        cw[np.arange(Wp), np.arange(Wp) // 2] = 1.0
        kern = functools.partial(_hs_kernel_matmul, TR=TR, W=W)
        args = (jnp.asarray(rh), jnp.asarray(cw), imgp)
        in_specs = [
            pl.BlockSpec((TR // 2, TR), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, Wp // 2), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Wp), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        kern,
        grid=(C, nH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TR // 2, Wp // 2), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H // 2, Wp // 2), jnp.float32),
    )(*args)
    return out[:, :, : W // 2]


def hs_ref(a):
    return (a[..., 0::2, 0::2] + a[..., 0::2, 1::2]
            + a[..., 1::2, 0::2] + a[..., 1::2, 1::2]) * 0.25


rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((4, 480, 640)), jnp.float32)
ref = np.asarray(jax.jit(hs_ref)(img))

for variant in ("strided", "matmul"):
    try:
        got = np.asarray(hs_pallas(img, variant))
        print(f"{variant}: max|diff| = {np.abs(got - ref).max():.2e}", flush=True)
        f = lambda a: hs_pallas(a, variant)
        out = f(img); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(100):
            out = f(img)
        jax.block_until_ready(out)
        print(f"{variant}: {(time.perf_counter()-t0)/100*1000:.3f} ms", flush=True)
    except Exception as e:
        print(f"{variant} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def _hs_kernel_reshape(img_ref, out_ref, *, TR, W):
    x = img_ref[0]
    Wp = x.shape[1]
    s = x.reshape(TR // 2, 2, Wp).sum(axis=1)          # sublane pair sum
    out_ref[0] = s.reshape(TR // 2, Wp // 2, 2).sum(axis=-1) * 0.25  # lane pairs


def _hs_kernel_roll(img_ref, out_ref, *, TR, W):
    # pair sums via roll, compaction via reshape-free "every other lane"
    x = img_ref[0]
    Wp = x.shape[1]
    s = x.reshape(TR // 2, 2, Wp).sum(axis=1)
    t = s + pltpu.roll(s, -1, axis=1)                   # t[:, 2k] = pair sum
    out_ref[0] = t.reshape(TR // 2, Wp // 2, 2)[:, :, 0] * 0.25


import functools as ft
for name, kern in (("reshape", _hs_kernel_reshape), ("roll", _hs_kernel_roll)):
    try:
        @ft.partial(jax.jit, static_argnames=())
        def hs2(img, _k=kern):
            C, H, W = img.shape
            TR = 48
            nH = H // TR
            Wp = -(-W // 256) * 256
            imgp = jnp.pad(img, ((0, 0), (0, 0), (0, Wp - W))) if Wp != W else img
            return pl.pallas_call(
                ft.partial(_k, TR=TR, W=W),
                grid=(C, nH),
                in_specs=[pl.BlockSpec((1, TR, Wp), lambda c, i: (c, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, TR // 2, Wp // 2),
                                       lambda c, i: (c, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, H // 2, Wp // 2), jnp.float32),
            )(imgp)[:, :, : W // 2]
        got = np.asarray(hs2(img))
        print(f"{name}: max|diff| = {np.abs(got - ref).max():.2e}", flush=True)
        out = hs2(img); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(100):
            out = hs2(img)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/100*1000:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)
