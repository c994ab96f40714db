"""Micro-bench: Pallas window gather vs unaligned-DMA variant.

Tests whether Mosaic supports arbitrary (unaligned) DMA source offsets —
if so, the super-window + dual-roll realignment in pallas_gather can be
dropped for a direct (G, G)-ish copy.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcptam_tpu.ops.pallas_gather import gather_windows_pallas

_SLOTS = 8


def _unaligned_kernel(rows_ref, cols_ref, atlas_ref, out_ref, scratch, sems,
                      *, B, G, GR, GC):
    blk = pl.program_id(0)

    def get_dma(slot, i):
        r = rows_ref[blk * B + i]
        c = cols_ref[blk * B + i]
        return pltpu.make_async_copy(
            atlas_ref.at[pl.ds(r, GR), pl.ds(c, GC)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(_SLOTS, B)):
        get_dma(s, s).start()

    def body(i, _):
        slot = jax.lax.rem(i, _SLOTS)
        get_dma(slot, i).wait()
        out_ref[i] = scratch[slot][:G, :G]

        @pl.when(i + _SLOTS < B)
        def _():
            get_dma(slot, i + _SLOTS).start()

        return 0

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit, static_argnames=("G", "block"))
def gather_unaligned(atlas2, rows, cols, G, block=128):
    K = rows.shape[0]
    GR = G          # copy exactly G rows
    GC = ((G + 127) // 128) * 128   # lane dim must still be padded to 128?
    atlas2 = jnp.pad(atlas2, ((0, GR), (0, GC)))
    HH, AW = atlas2.shape
    rows = jnp.clip(rows, 0, HH - GR)
    cols = jnp.clip(cols, 0, AW - GC)
    kernel = functools.partial(_unaligned_kernel, B=block, G=G, GR=GR, GC=GC)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(K // block,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (block, G, G), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, GR, GC), jnp.float32),
                pltpu.SemaphoreType.DMA((_SLOTS,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((K, G, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, cols, atlas2)


def bench(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)
    return out


rng = np.random.default_rng(0)
HH, AW = 4 * 480, 960
atlas = jnp.asarray(rng.standard_normal((HH, AW)), jnp.float32)
K = 1024
rows = jnp.asarray(rng.integers(0, HH - 64, K), jnp.int32)
cols = jnp.asarray(rng.integers(0, AW - 256, K), jnp.int32)

for G in (37, 25, 19):
    ref = bench(f"aligned+roll  G={G}", lambda a, r, c: gather_windows_pallas(a, r, c, G, 128), atlas, rows, cols)
    try:
        got = bench(f"unaligned dma G={G}", lambda a, r, c: gather_unaligned(a, r, c, G, 128), atlas, rows, cols)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"  max|diff| = {err:.2e}", flush=True)
    except Exception as e:
        print(f"  unaligned failed: {type(e).__name__}: {str(e)[:300]}", flush=True)
