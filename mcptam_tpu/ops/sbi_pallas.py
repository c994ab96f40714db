"""Fused Pallas ESM kernel: all SE2 iterations for all cameras in one launch.

The pure-JAX ``ops/sbi.py::esm_align`` runs 9 Gauss-Newton iterations as a
``fori_loop`` whose body is ~25 tiny (30,40)-shaped ops plus two small
matmuls.  vmapped over 4 cameras that is ~36 serial loop steps of
sub-MXU-granularity work — the per-op fixed cost dominates (~0.4 ms/frame
of the tracker step, measured on v5e), not FLOPs: the whole working set is
4x(30,40) floats per camera.

This kernel runs ONE grid program per camera with the 9 iterations
unrolled, everything VMEM-resident (ref IteratePosRelToTarget,
src/SmallBlurryImage.cc:138-248 — same math as ops/sbi.py, which remains
the cross-checked reference implementation).

Layout notes (TPU/Mosaic):
  * per-pixel quantities live as (30,40) f32 tiles;
  * the gather-free bilinear warp reshapes to a (1200,1) column and builds
    hat-function weight matrices (1200,40)/(1200,30) against 2D iotas —
    the COLS-contraction is a real MXU matmul (1200,40)@(40,30);
  * the current template is passed pre-transposed (C,40,30) so the kernel
    never transposes;
  * neighbor validity uses shift-with-edge-clamp, which inside the 1-px
    inner mask is exactly the reference's wrap-around ``jnp.roll``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcptam_tpu.config import SBI_SIZE

ROWS, COLS = SBI_SIZE
_CX, _CY = float(COLS // 2), float(ROWS // 2)


def _shift_rows(x, d):
    """x shifted so result[r,c] = x[r+d,c], edge rows zero-padded."""
    if d == 0:
        return x
    z = jnp.zeros_like(x)
    if d > 0:
        return jnp.concatenate([x[d:, :], z[:d, :]], axis=0)
    return jnp.concatenate([z[d:, :], x[:d, :]], axis=0)


def _shift_cols(x, d):
    if d == 0:
        return x
    z = jnp.zeros_like(x)
    if d > 0:
        return jnp.concatenate([x[:, d:], z[:, :d]], axis=1)
    return jnp.concatenate([z[:, d:], x[:, :d]], axis=1)


def _solve4(H, b):
    """Unrolled 4x4 Cholesky solve on scalar entries (SPD + damping)."""
    import math

    h = [[H[i, j] for j in range(4)] for i in range(4)]
    L = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i + 1):
            s = h[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 4
    for i in range(4):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 4
    for i in range(3, -1, -1):
        s = y[i]
        for k in range(i + 1, 4):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _esm_kernel(cur_t_ref, tgt_ref, gx_ref, gy_ref, se2_ref, score_ref,
                *, n_iterations: int):
    cur_t = cur_t_ref[0]          # (COLS, ROWS): pre-transposed current
    target = tgt_ref[0]           # (ROWS, COLS)
    tgx = gx_ref[0]
    tgy = gy_ref[0]

    ys = jax.lax.broadcasted_iota(jnp.float32, (ROWS, COLS), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ROWS, COLS), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.float32, (1, COLS), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.float32, (1, ROWS), 1)
    inner = (
        (ys >= 1.0) & (ys <= ROWS - 2.0) & (xs >= 1.0) & (xs <= COLS - 2.0)
    )

    c = jnp.float32(1.0)
    s = jnp.float32(0.0)
    tx = jnp.float32(0.0)
    ty = jnp.float32(0.0)
    mean_offset = jnp.float32(0.0)
    score = jnp.float32(0.0)

    for _ in range(n_iterations):
        xr = c * (xs - _CX) - s * (ys - _CY) + _CX + tx
        yr = s * (xs - _CX) + c * (ys - _CY) + _CY + ty
        xrc = jnp.clip(xr, 0.0, COLS - 1.0)
        yrc = jnp.clip(yr, 0.0, ROWS - 1.0)

        xf = xrc.reshape(ROWS * COLS, 1)
        yf = yrc.reshape(ROWS * COLS, 1)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xf - col_ids))   # (1200, COLS)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(yf - row_ids))   # (1200, ROWS)
        z = jnp.dot(hx, cur_t, preferred_element_type=jnp.float32)
        warped = jnp.sum(hy * z, axis=1, keepdims=True).reshape(ROWS, COLS)

        valid = (
            (xr >= 0.0) & (xr <= COLS - 2.0)
            & (yr >= 0.0) & (yr <= ROWS - 2.0)
        )
        # neighbor validity: shift-with-zero-pad == reference roll within
        # the inner mask (border rows/cols are masked by `inner` anyway)
        nb = (
            valid
            & _shift_cols(valid, 1) & _shift_cols(valid, -1)
            & _shift_rows(valid, 1) & _shift_rows(valid, -1)
        )
        m = jnp.where(inner & nb, 1.0, 0.0)

        wgx = _shift_cols(warped, 1) - _shift_cols(warped, -1)
        wgy = _shift_rows(warped, 1) - _shift_rows(warped, -1)
        gx = 0.25 * (wgx + tgx)
        gy = 0.25 * (wgy + tgy)
        j3 = -(ys - _CY) * gx + (xs - _CX) * gy
        diff = (warped - target + mean_offset) * m

        J0 = gx * m
        J1 = gy * m
        J2 = j3 * m
        J3 = m
        Js = (J0, J1, J2, J3)
        H = [[jnp.sum(Js[i] * Js[j]) for j in range(4)] for i in range(4)]
        Hm = jnp.stack([jnp.stack(r) for r in H]) + 1e-6 * jnp.eye(4)
        b = [jnp.sum(Js[i] * diff) for i in range(4)]
        upd = _solve4(Hm, b)
        score = jnp.sum(diff * diff)

        dth = -upd[2]
        cu, su = jnp.cos(dth), jnp.sin(dth)
        # se2 := se2 ∘ (cu, su, -upd0, -upd1)
        c, s, tx, ty = (
            c * cu - s * su,
            s * cu + c * su,
            c * (-upd[0]) - s * (-upd[1]) + tx,
            s * (-upd[0]) + c * (-upd[1]) + ty,
        )
        mean_offset = mean_offset - upd[3]

    se2_ref[...] = jnp.stack([c, s, tx, ty]).reshape(1, 4)
    score_ref[...] = score.reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("n_iterations", "interpret"))
def esm_align_all(cur, target, gx, gy, n_iterations: int = 9,
                  interpret: bool = False):
    """Batched fused ESM: (C,30,40) templates -> se2 (C,4), score (C,).

    Semantically identical to ``vmap(ops.sbi.esm_align)`` (cross-checked in
    tests/test_sbi.py); the warped-gradient edge rows differ only outside
    the inner mask, which both implementations zero.
    """
    C = cur.shape[0]
    cur_t = jnp.swapaxes(cur, -1, -2)  # (C, COLS, ROWS)
    kern = functools.partial(_esm_kernel, n_iterations=n_iterations)
    se2, score = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, COLS, ROWS), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 4), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
        ],
        interpret=interpret,
    )(cur_t, target, gx, gy)
    return se2, score[:, 0]
