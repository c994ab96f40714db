"""Closed-form small-matrix solves vs jnp.linalg golden values."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.linalg import solve_spd, inv2, inv3


@pytest.mark.parametrize("n", [2, 3, 4, 6])
def test_solve_spd_matches_linalg(rng, n):
    A = rng.standard_normal((8, n, n))
    H = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    b = rng.standard_normal((8, n))
    x = np.asarray(solve_spd(jnp.asarray(H), jnp.asarray(b)))
    x_ref = np.linalg.solve(H, b[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=1e-4, atol=1e-5)


def test_inv3_matches_linalg(rng):
    A = rng.standard_normal((16, 3, 3))
    A += np.eye(3) * 3.0  # keep well-conditioned
    np.testing.assert_allclose(
        np.asarray(inv3(jnp.asarray(A))), np.linalg.inv(A),
        rtol=1e-4, atol=1e-5,
    )


def test_inv2_matches_linalg(rng):
    A = rng.standard_normal((16, 2, 2))
    A += np.eye(2) * 3.0
    np.testing.assert_allclose(
        np.asarray(inv2(jnp.asarray(A))), np.linalg.inv(A),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("blocked", [False, True])
@pytest.mark.parametrize("n,m", [(6, 1), (30, 6), (128, 3), (130, 2)])
def test_pallas_spd_solve_interpreted(rng, n, m, blocked):
    """Both in-VMEM Pallas Cholesky kernels — the production reduced-
    system solvers on TPU — checked on CPU via interpret mode against
    jnp.linalg.solve (spd_solve routes around the kernel on the CPU
    backend, so without this the kernels ship untested off-hardware).
    Sizes straddle the 128-lane padding boundary and the blocked
    kernel's 8-row panels."""
    from mcptam_tpu.core.spd import _spd_solve_pallas

    A = rng.standard_normal((n, n))
    A = (A @ A.T / n + np.eye(n)).astype(np.float32)
    B = rng.standard_normal((n, m)).astype(np.float32)
    X = np.asarray(_spd_solve_pallas(jnp.asarray(A), jnp.asarray(B),
                                     interpret=True, blocked=blocked))
    X_ref = np.linalg.solve(A, B)
    np.testing.assert_allclose(X, X_ref, rtol=2e-3, atol=2e-4)
