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
