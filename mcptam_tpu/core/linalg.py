"""Closed-form small-matrix solves for TPU hot loops.

``jnp.linalg.solve``/``inv`` lower to LU-factorization custom calls that
the TPU runs as a slow, unfusible serial region — tens of microseconds for
a 4x4 inside a ``fori_loop`` body that otherwise costs nothing.  Every
fixed-size SPD system in the per-frame path (ESM 4x4, SE3-from-SE2 3x3,
pose WLS 6x6, subpixel 3x3) is at most 6x6, so an unrolled scalar Cholesky
is a handful of fusible vector ops instead (the reference leans on TooN's
fixed-size ``Cholesky<6>``/``WLS<6>`` and hand-written 2x2/3x3 inverses in
SmallMatrixOpts.h:51-77 for exactly the same reason).

All helpers broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for symmetric positive-definite H of static size
    (..., n, n) with n <= ~8, by fully unrolled Cholesky.

    Matches ``jnp.linalg.solve`` on SPD inputs; NaN/garbage on indefinite
    ones (callers add a prior/damping term, as the reference does with its
    WLS prior)."""
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Cofactor inverse of (..., 3, 3) matrices (SmallMatrixOpts.h:60-77):
    nine fused multiplies instead of a batched LU custom call."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / det
    rows = [
        jnp.stack([A00, A01, A02], axis=-1),
        jnp.stack([A10, A11, A12], axis=-1),
        jnp.stack([A20, A21, A22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def inv2(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) matrices (SmallMatrixOpts.h:51-58)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    inv_det = 1.0 / (a * d - b * c)
    return (
        jnp.stack(
            [
                jnp.stack([d, -b], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        )
        * inv_det[..., None, None]
    )
