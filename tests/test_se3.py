"""SE3/SO3 golden tests: round trips, group laws, generator fields."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import (
    SE3, so3_exp, so3_ln, hat, vee, se3_generator_field, geodesic_rotation_mean,
)


def random_tangents(rng, n, scale=1.0):
    """Tangents with rotation magnitude < pi (exp injective region)."""
    v = rng.normal(size=(n, 6)) * scale
    wn = np.linalg.norm(v[:, 3:], axis=-1, keepdims=True)
    v[:, 3:] *= np.minimum(1.0, 0.95 * np.pi / np.maximum(wn, 1e-9))
    return v


def test_hat_vee_roundtrip(rng):
    w = rng.normal(size=(17, 3)).astype(np.float32)
    assert np.allclose(vee(hat(jnp.asarray(w))), w)


def test_so3_exp_orthogonal(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    R = so3_exp(w)
    eye = jnp.eye(3)
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye))
    assert err < 1e-5
    det = jnp.linalg.det(R)
    assert np.allclose(det, 1.0, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0, 3.0])
def test_so3_log_exp_roundtrip(rng, scale):
    w = rng.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, scale, (64, 1))
    w = jnp.asarray(w, jnp.float32)
    w2 = so3_ln(so3_exp(w))
    assert np.allclose(w, w2, atol=5e-4 * max(scale, 1.0))


def test_so3_log_near_pi(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = np.pi - 1e-4
    w = jnp.asarray(axis * theta, jnp.float32)
    R = so3_exp(w)
    w2 = so3_ln(R)
    # log may return +-(axis*theta); compare rotations
    assert np.allclose(np.asarray(so3_exp(w2)), np.asarray(R), atol=3e-4)


def test_se3_exp_ln_roundtrip(rng):
    v = jnp.asarray(random_tangents(rng, 64, 1.5), jnp.float32)
    T = SE3.exp(v)
    v2 = T.ln()
    assert np.allclose(v, v2, atol=2e-4)


def test_se3_group_ops(rng):
    a = SE3.exp(jnp.asarray(random_tangents(rng, 8), jnp.float32))
    b = SE3.exp(jnp.asarray(random_tangents(rng, 8), jnp.float32))
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    lhs = (a @ b).apply(x)
    rhs = a.apply(b.apply(x))
    assert np.allclose(lhs, rhs, atol=1e-5)
    ident = a @ a.inv()
    assert np.allclose(ident.apply(x), x, atol=1e-4)


def test_se3_exp_small_is_linear():
    v = jnp.asarray([[1e-5, -2e-5, 3e-5, 1e-5, 2e-5, -1e-5]], jnp.float32)
    T = SE3.exp(v)
    assert np.allclose(T.t, v[0, :3], atol=1e-9)


def test_generator_field_matches_autodiff():
    """exp(eps*e_j) @ p derivative at eps=0 equals the generator field."""
    p = jnp.asarray([0.3, -1.2, 2.5], jnp.float32)
    ph = jnp.concatenate([p, jnp.ones(1)])
    for j in range(6):
        def f(eps, j=j):
            v = jnp.zeros(6).at[j].set(eps)
            return SE3.exp(v).apply(p)
        g = jax.jacfwd(f)(0.0)
        gf = se3_generator_field(j, ph)[:3]
        assert np.allclose(g, gf, atol=1e-5), f"generator {j}"


def test_geodesic_rotation_mean(rng):
    base = so3_exp(jnp.asarray(rng.normal(size=3), jnp.float32))
    perturbs = jnp.asarray(rng.normal(size=(6, 3)) * 0.05, jnp.float32)
    perturbs = perturbs - jnp.mean(perturbs, axis=0)  # zero-mean noise
    Rs = so3_exp(perturbs) @ base
    mask = jnp.ones(6)
    R_mean = geodesic_rotation_mean(Rs, mask)
    diff = so3_ln(jnp.swapaxes(base, -1, -2) @ R_mean)
    assert np.linalg.norm(diff) < 2e-3


def test_se3_as_matrix(rng):
    T = SE3.exp(jnp.asarray(random_tangents(rng, 4), jnp.float32))
    M = T.as_matrix()
    x = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    xh = jnp.concatenate([x, jnp.ones((4, 1))], axis=-1)
    out = jnp.einsum("nij,nj->ni", M, xh)
    assert np.allclose(out[:, :3], T.apply(x), atol=1e-5)
