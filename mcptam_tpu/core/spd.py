"""Dense SPD solves sized for the reduced (Schur) pose system.

``jnp.linalg.solve``/``cholesky`` lower to LAPACK-style custom calls that
execute as an unfusible serial region on TPU — measured ~22 ms (LU) /
~93 ms (Cholesky) for a 384x384 f32 system on a v5e, because every panel
step pays full kernel-dispatch latency.  The reference leans on
CHOLMOD's supernodal factorization for the same solve
(/root/reference/src/ChainBundle.cc:1147-1161); the TPU-native answer is
one Pallas kernel that keeps the whole matrix in VMEM and runs the
factor + triangular solves as in-kernel ``fori_loop`` rank-1 updates on
the VPU — no per-step dispatch, ~0.1-0.3 ms for n<=512.

``spd_solve`` pads to hardware tiles, picks the Pallas kernel on TPU and
a plain ``jnp.linalg.solve`` elsewhere (CPU tests, the virtual multichip
mesh), and always symmetrizes + expects the caller to have damped/pinned
the system to SPD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spd_kernel(a_ref, b_ref, x_ref, u_ref, lt_ref, *, n_real: int):
    """Cholesky A = U^T U (U upper, rows of U = columns of L) followed by
    column-oriented forward/back substitution, all in VMEM.

    Row-oriented formulation throughout: every step reads/writes one ROW
    (a sublane-dim dynamic slice, which the TPU supports natively) and
    applies a rank-1 update to the trailing matrix — the lane-dim column
    accesses a textbook Cholesky needs are avoided by symmetry (column j
    of the working matrix == row j) and by materializing U^T once for the
    back-substitution.

    All three loops run n_real steps, not the 128-padded count: the pad
    block is identity with zero cross terms and zero rhs, so its rows
    never influence the live block (factored rows stay raw identity,
    which the masked rank-1 updates treat as already-final)."""
    n = a_ref.shape[0]
    m = b_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    u_ref[:] = a_ref[:]

    def factor_step(j, _):
        row = u_ref[pl.ds(j, 1), :]                      # (1, n)
        d = jnp.sum(jnp.where(lane == j, row, 0.0))
        inv = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
        urow = row * inv
        u_ref[pl.ds(j, 1), :] = jnp.where(lane >= j, urow, 0.0)
        v = jnp.where(lane > j, urow, 0.0)               # (1, n)
        # symmetric trailing update; rows <= j have v == 0 so the already
        # final rows of U are untouched
        u_ref[:] = u_ref[:] - v.reshape(n, 1) * v
        return 0

    jax.lax.fori_loop(0, n_real, factor_step, 0, unroll=False)

    # forward solve U^T y = b (column-oriented: column j of U^T is row j
    # of U), y accumulated in place in x_ref
    x_ref[:] = b_ref[:]

    def fwd_step(j, _):
        urow = u_ref[pl.ds(j, 1), :]
        d = jnp.sum(jnp.where(lane == j, urow, 0.0))
        yrow = x_ref[pl.ds(j, 1), :] / jnp.maximum(d, 1e-12)
        x_ref[pl.ds(j, 1), :] = yrow
        v = jnp.where(lane > j, urow, 0.0)
        x_ref[:] = x_ref[:] - v.reshape(n, 1) * yrow
        return 0

    jax.lax.fori_loop(0, n_real, fwd_step, 0, unroll=False)

    # back solve U x = y (column-oriented: column j of U is row j of U^T)
    lt_ref[:] = u_ref[:].T

    def back_step(jj, _):
        j = n_real - 1 - jj
        ltrow = lt_ref[pl.ds(j, 1), :]
        d = jnp.sum(jnp.where(lane == j, ltrow, 0.0))
        xrow = x_ref[pl.ds(j, 1), :] / jnp.maximum(d, 1e-12)
        x_ref[pl.ds(j, 1), :] = xrow
        v = jnp.where(lane < j, ltrow, 0.0)
        x_ref[:] = x_ref[:] - v.reshape(n, 1) * xrow
        return 0

    jax.lax.fori_loop(0, n_real, back_step, 0, unroll=False)


def _spd_kernel_blocked(a_ref, b_ref, x_ref, u_ref, lt_ref, *, n_real: int,
                        pb: int = 8):
    """Blocked right-looking variant of :func:`_spd_kernel`: panels of
    ``pb`` rows factor with cheap (pb, n) slab updates, and each panel's
    trailing update is ONE (n, pb) x (pb, n) matmul on the MXU — the
    serial chain shrinks from n full-matrix rank-1 updates to n cheap
    slab steps + n/pb matmuls.  Same row-oriented masking story as the
    simple kernel; triangular solves are blocked the same way."""
    n = a_ref.shape[0]
    m = b_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0)

    u_ref[:] = a_ref[:]
    nb = (n_real + pb - 1) // pb

    for blk in range(nb):
        p0 = blk * pb
        slab = u_ref[pl.ds(p0, pb), :]                   # (pb, n)
        for r in range(min(pb, n_real - p0)):
            j = p0 + r
            row = jnp.sum(jnp.where(iota_p == r, slab, 0.0), axis=0,
                          keepdims=True)                 # (1, n)
            d = jnp.sum(jnp.where(lane == j, row, 0.0))
            urow = row * jax.lax.rsqrt(jnp.maximum(d, 1e-12))
            urow = jnp.where(lane >= j, urow, 0.0)
            slab = jnp.where(iota_p == r, urow, slab)
            v = jnp.where(lane > j, urow, 0.0)           # (1, n)
            vcol = v.reshape(n, 1)[p0:p0 + pb]           # (pb, 1)
            slab = slab - jnp.where(iota_p > r, vcol, 0.0) * v
        u_ref[pl.ds(p0, pb), :] = slab
        # one MXU matmul updates the whole trailing block (rows and
        # lanes > p0+pb-1 only: V is lane-masked, so V^T V vanishes
        # elsewhere, leaving the finished panel rows untouched)
        V = jnp.where(lane > p0 + pb - 1, slab, 0.0)     # (pb, n)
        u_ref[:] = u_ref[:] - jax.lax.dot_general(
            V, V, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # forward solve U^T y = b, panel-blocked
    x_ref[:] = b_ref[:]
    for blk in range(nb):
        p0 = blk * pb
        uslab = u_ref[pl.ds(p0, pb), :]                  # (pb, n)
        xslab = x_ref[pl.ds(p0, pb), :]                  # (pb, m)
        for r in range(min(pb, n_real - p0)):
            j = p0 + r
            urow = jnp.sum(jnp.where(iota_p == r, uslab, 0.0), axis=0,
                           keepdims=True)
            d = jnp.sum(jnp.where(lane == j, urow, 0.0))
            yrow = jnp.sum(jnp.where(iota_p == r, xslab, 0.0), axis=0,
                           keepdims=True) / jnp.maximum(d, 1e-12)
            xslab = jnp.where(iota_p == r, yrow, xslab)
            # within-panel substitution: rows r+1..pb of the slab
            vcol = jnp.where(lane > j, urow, 0.0).reshape(n, 1)[p0:p0 + pb]
            xslab = xslab - jnp.where(iota_p > r, vcol, 0.0) * yrow
        x_ref[pl.ds(p0, pb), :] = xslab
        # push the panel's contribution into all later rows at once:
        # x[p0+pb:] -= U[p0:p0+pb, p0+pb:]^T @ y_panel
        Vt = jnp.where(lane > p0 + pb - 1, uslab, 0.0)   # (pb, n)
        x_ref[:] = x_ref[:] - jax.lax.dot_general(
            Vt, xslab, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # back solve U x = y, panel-blocked from the bottom
    lt_ref[:] = u_ref[:].T
    for blk in range(nb - 1, -1, -1):
        p0 = blk * pb
        lslab = lt_ref[pl.ds(p0, pb), :]                 # (pb, n) rows of U^T
        xslab = x_ref[pl.ds(p0, pb), :]
        for r in range(min(pb, n_real - p0) - 1, -1, -1):
            j = p0 + r
            lrow = jnp.sum(jnp.where(iota_p == r, lslab, 0.0), axis=0,
                           keepdims=True)
            d = jnp.sum(jnp.where(lane == j, lrow, 0.0))
            xrow = jnp.sum(jnp.where(iota_p == r, xslab, 0.0), axis=0,
                           keepdims=True) / jnp.maximum(d, 1e-12)
            xslab = jnp.where(iota_p == r, xrow, xslab)
            vcol = jnp.where(lane < j, lrow, 0.0).reshape(n, 1)[p0:p0 + pb]
            xslab = xslab - jnp.where(iota_p < r, vcol, 0.0) * xrow
        x_ref[pl.ds(p0, pb), :] = xslab
        Vt = jnp.where(lane < p0, lslab, 0.0)            # (pb, n)
        x_ref[:] = x_ref[:] - jax.lax.dot_general(
            Vt, xslab, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _env_blocked() -> bool:
    """Kernel-choice env var, resolved OUTSIDE any jitted body so a
    changed ``MCPTAM_SPD_KERNEL`` is honored even after the jit cache is
    warm (the static ``blocked`` argument keys the cache).

    Default is the BLOCKED panel kernel: measured on the v5e chip
    (round 5) it beats the simple kernel at every production size —
    n=96: 0.020 vs 0.026 ms, n=192: 1.99 vs 2.17 ms, n=288: 1.30 vs
    1.52 ms — with equal accuracy (max err ~5e-9 vs LAPACK)."""
    import os
    return os.environ.get("MCPTAM_SPD_KERNEL", "blocked") == "blocked"


@functools.partial(jax.jit, static_argnames=("interpret", "blocked"))
def _spd_solve_pallas(A: jnp.ndarray, B: jnp.ndarray, interpret: bool = False,
                      blocked: bool | None = None):
    n = A.shape[0]
    m = B.shape[1]
    npad = _round_up(max(n, 8), 128)
    mpad = _round_up(max(m, 1), 128)
    # identity padding keeps the factor SPD and decouples the pad block
    Ap = jnp.zeros((npad, npad), jnp.float32)
    Ap = Ap.at[:n, :n].set(A.astype(jnp.float32))
    Ap = Ap.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    Bp = jnp.zeros((npad, mpad), jnp.float32).at[:n, :m].set(
        B.astype(jnp.float32)
    )
    if blocked is None:
        blocked = _env_blocked()
    kern = _spd_kernel_blocked if blocked else _spd_kernel
    X = pl.pallas_call(
        functools.partial(kern, n_real=n),
        out_shape=jax.ShapeDtypeStruct((npad, mpad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((npad, npad), jnp.float32),
            pltpu.VMEM((npad, npad), jnp.float32),
        ],
        interpret=interpret,
    )(Ap, Bp)
    return X[:n, :m].astype(B.dtype)


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the dense SPD system ``A x = b`` (b may be (n,) or (n, m)).

    TPU backends route through the single-kernel Pallas Cholesky; other
    platforms (CPU test mesh) use the stock solver, which is fast there."""
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    from mcptam_tpu.backend import use_pallas
    if use_pallas():
        X = _spd_solve_pallas(A, B, blocked=_env_blocked())
    else:
        X = jnp.linalg.solve(A, B)
    return X[:, 0] if vec else X
