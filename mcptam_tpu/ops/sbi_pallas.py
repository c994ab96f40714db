"""Fused Pallas ESM kernel: all SE2 iterations for all cameras in one launch.

The pure-JAX ``ops/sbi.py::esm_align`` runs 9 Gauss-Newton iterations as a
``fori_loop`` whose body is ~25 tiny (30,40)-shaped ops plus two small
matmuls.  vmapped over 4 cameras that is ~36 serial loop steps of
sub-MXU-granularity work — the per-op fixed cost dominates (~0.4 ms/frame
of the tracker step, measured on v5e), not FLOPs: the whole working set is
4x(30,40) floats per camera.

This kernel runs ONE program with cameras and the 9 iterations unrolled,
everything VMEM-resident (ref IteratePosRelToTarget,
src/SmallBlurryImage.cc:138-248 — same math as ops/sbi.py, which remains
the cross-checked reference implementation).

Layout notes (TPU/Mosaic — all constraints hit on real v5e hardware):
  * per-pixel quantities live FLAT as (N,1) = (1200,1) f32 columns: Mosaic
    supports neither (1,4) output blocks (sublane-dim rule), f32 iota, nor
    the (30,40)->(1200,1) reshape, so pixel coordinates are derived from an
    int N-iota (divmod by COLS) and the target/gradient images are
    flattened OUTSIDE the kernel;
  * the gather-free bilinear warp builds hat-function weight matrices
    (1200,40)/(1200,30) against column/row id iotas — the COLS-contraction
    is a real MXU matmul (1200,40)@(40,30);
  * the current template is passed pre-transposed (C,40,30) so the kernel
    never transposes;
  * 2D row/col neighbor shifts become flat shifts by COLS/1; they differ
    from the 2D zero-padded shifts only at image borders, which the 1-px
    inner mask excludes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcptam_tpu.config import SBI_SIZE

ROWS, COLS = SBI_SIZE
N = ROWS * COLS
_CX, _CY = float(COLS // 2), float(ROWS // 2)


def _shift_flat(x, d):
    """x shifted so result[n] = x[n+d], out-of-range zero-padded.  (N,1)."""
    if d == 0:
        return x
    z = jnp.zeros_like(x)
    if d > 0:
        return jnp.concatenate([x[d:], z[:d]], axis=0)
    return jnp.concatenate([z[d:], x[:d]], axis=0)


def _solve4(H, b):
    """Unrolled 4x4 Cholesky solve on scalar entries (SPD + damping)."""
    h = [[H[i][j] for j in range(4)] for i in range(4)]
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
                *, n_iterations: int, n_cams: int):
    """ONE program, cameras unrolled (a (1, 4) per-camera output block
    violates the Mosaic block-shape rules, so the whole (C, ...) batch is
    one full-array block and the camera loop is unrolled in-kernel; C is
    4-ish and the per-camera working set is a few (1200,·) tiles, well
    inside VMEM)."""
    out_rows = []
    for cam in range(n_cams):
        out_rows.append(_esm_one(
            cur_t_ref[cam], tgt_ref[cam], gx_ref[cam], gy_ref[cam],
            n_iterations,
        ))
    se2_ref[...] = jnp.stack([r[0] for r in out_rows])      # (C, 4)
    score_ref[...] = jnp.stack(
        [r[1] for r in out_rows]
    ).reshape(n_cams, 1)


def _esm_one(cur_t, target, tgx, tgy, n_iterations: int):
    # cur_t: (COLS, ROWS) pre-transposed current; target/tgx/tgy (N, 1)
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    ys = (n_ids // COLS).astype(jnp.float32)                 # (N,1)
    xs = (n_ids % COLS).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (1, COLS), 1).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (1, ROWS), 1).astype(jnp.float32)
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
        xr = c * (xs - _CX) - s * (ys - _CY) + _CX + tx      # (N,1)
        yr = s * (xs - _CX) + c * (ys - _CY) + _CY + ty
        xf = jnp.clip(xr, 0.0, COLS - 1.0)
        yf = jnp.clip(yr, 0.0, ROWS - 1.0)

        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xf - col_ids))   # (N, COLS)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(yf - row_ids))   # (N, ROWS)
        z = jnp.dot(hx, cur_t, preferred_element_type=jnp.float32)
        warped = jnp.sum(hy * z, axis=1, keepdims=True)      # (N,1)

        # neighbor validity: flat shifts match the 2D zero-padded shifts
        # everywhere the inner mask is true.  Masks shift as f32 — Mosaic
        # cannot concatenate i1 vectors ("Invalid vector register cast").
        vf = jnp.where(
            (xr >= 0.0) & (xr <= COLS - 2.0)
            & (yr >= 0.0) & (yr <= ROWS - 2.0),
            1.0, 0.0,
        )
        nb = (
            vf
            * _shift_flat(vf, 1) * _shift_flat(vf, -1)
            * _shift_flat(vf, COLS) * _shift_flat(vf, -COLS)
        )
        m = jnp.where(inner, 1.0, 0.0) * nb

        wgx = _shift_flat(warped, 1) - _shift_flat(warped, -1)
        wgy = _shift_flat(warped, COLS) - _shift_flat(warped, -COLS)
        gx = 0.25 * (wgx + tgx)
        gy = 0.25 * (wgy + tgy)
        j3 = -(ys - _CY) * gx + (xs - _CX) * gy
        diff = (warped - target + mean_offset) * m

        J0 = gx * m
        J1 = gy * m
        J2 = j3 * m
        J3 = m
        Js = (J0, J1, J2, J3)
        H = [[jnp.sum(Js[i] * Js[j]) + (1e-6 if i == j else 0.0)
              for j in range(4)] for i in range(4)]
        b = [jnp.sum(Js[i] * diff) for i in range(4)]
        upd = _solve4(H, b)
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

    return jnp.stack([c, s, tx, ty]), score


@functools.partial(jax.jit, static_argnames=("n_iterations", "interpret"))
def esm_align_all(cur, target, gx, gy, n_iterations: int = 9,
                  interpret: bool = False):
    """Batched fused ESM: (C,30,40) templates -> se2 (C,4), score (C,).

    Semantically identical to ``vmap(ops.sbi.esm_align)`` (cross-checked in
    tests/test_sbi.py); the warped-gradient edge rows differ only outside
    the inner mask, which both implementations zero.
    """
    C = cur.shape[0]
    cur_t = jnp.swapaxes(cur, -1, -2)                # (C, COLS, ROWS)
    flat = lambda a: a.reshape(C, N, 1)              # outside the kernel
    kern = functools.partial(_esm_kernel, n_iterations=n_iterations,
                             n_cams=C)
    se2, score = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 4), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
        ],
        interpret=interpret,
    )(cur_t, flat(target), flat(gx), flat(gy))
    return se2, score[:, 0]
