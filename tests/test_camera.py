"""Taylor camera model golden tests.

The golden oracle is the model's defining equation (same as the reference,
src/TaylorCamera.cc:202-346): unprojection of pixel uv satisfies
``z = a0 + a2 r^2 + a3 r^3 + a4 r^4`` on the sensor plane; projection is its
inverse.  Parameters are a realistic wide-angle fisheye set.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.camera import (
    make_camera, stack_cameras, project, unproject,
    projection_derivs_sphere, project_jacobian_point, polyval,
)

# Realistic Scaramuzza-style params for a ~180deg fisheye on 640x480:
# a0 > 0 (z positive at center), negative quadratic droop.
PARAMS = np.array([180.0, -0.0020, 1.2e-6, -2.0e-9, 322.0, 243.0, 1.001, 0.0003, -0.0002])
SIZE = (640, 480)


@pytest.fixture(scope="module")
def cam():
    return make_camera(PARAMS, SIZE)


def test_polyval_matches_numpy():
    c = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    x = jnp.asarray([0.0, 1.0, -1.5, 2.0])
    ref = np.polyval(np.asarray(c)[::-1], np.asarray(x))
    assert np.allclose(polyval(c, x), ref)


def test_project_unproject_roundtrip(cam, rng):
    uv = jnp.asarray(
        rng.uniform(low=(40, 40), high=(600, 440), size=(256, 2)), jnp.float32
    )
    v3 = unproject(cam, uv)
    assert np.allclose(np.linalg.norm(v3, axis=-1), 1.0, atol=1e-5)
    uv2, valid = project(cam, v3)
    assert bool(jnp.all(valid))
    assert np.allclose(uv, uv2, atol=0.02), np.abs(uv - uv2).max()


def test_unproject_satisfies_polynomial(cam):
    """z/r on the sensor plane must equal poly(r)/r — the defining model."""
    uv = jnp.asarray([[100.0, 120.0], [322.0, 243.0], [500.0, 400.0]], jnp.float32)
    v3 = unproject(cam, uv)
    # reconstruct sensor-plane coords
    aff_inv = np.asarray(cam.affine_inv)
    d = (np.asarray(uv) - np.asarray(cam.center)) @ aff_inv.T
    r = np.linalg.norm(d, axis=-1)
    z_expected = np.polyval(np.asarray(cam.poly)[::-1], r)
    scale = np.asarray(v3)[:, 2] / z_expected  # both normalized by same norm
    xy = np.asarray(v3)[:, :2] / scale[:, None]
    assert np.allclose(xy, d, atol=1e-2)


def test_project_center(cam):
    """Optical-axis point projects to the projection center."""
    uv, valid = project(cam, jnp.asarray([0.0, 0.0, 1.0]))
    assert bool(valid)
    assert np.allclose(uv, np.asarray(cam.center), atol=0.5)


def test_project_scale_invariant(cam):
    v3 = jnp.asarray([0.2, -0.1, 0.95])
    uv1, _ = project(cam, v3)
    uv2, _ = project(cam, v3 * 7.3)
    assert np.allclose(uv1, uv2, atol=1e-3)


def test_project_invalid_behind(cam):
    # point with theta far below min_theta (behind a ~180deg fisheye)
    _, valid = project(cam, jnp.asarray([0.01, 0.0, -1.0]))
    assert not bool(valid)


def test_projection_derivs_match_autodiff(cam):
    """Analytic 2x3 point Jacobian vs jax.jacfwd through project()."""
    pts = jnp.asarray(
        [[0.1, 0.2, 1.0], [-0.4, 0.3, 0.8], [0.0, 0.01, 1.0], [0.5, -0.5, 0.4]],
        jnp.float32,
    )

    def proj_uv(p):
        return project(cam, p)[0]

    J_auto = jax.vmap(jax.jacfwd(proj_uv))(pts)
    J_analytic = project_jacobian_point(cam, pts)
    assert np.allclose(J_auto, J_analytic, rtol=2e-2, atol=2e-2), (
        np.abs(J_auto - J_analytic).max()
    )


def test_batched_cameras(rng):
    cams = stack_cameras([
        make_camera(PARAMS, SIZE),
        make_camera(PARAMS * np.array([1.1, 1, 1, 1, 0.98, 1.02, 1, 1, 1]), SIZE),
    ])
    v3 = jnp.asarray(rng.normal(size=(2, 10, 3)) + np.array([0, 0, 2.0]), jnp.float32)
    # vmap over camera axis
    uv, valid = jax.vmap(project)(cams, v3)
    assert uv.shape == (2, 10, 2)
    uv0, _ = project(cams[0], v3[0])
    assert np.allclose(uv[0], uv0)


def test_jit_compiles(cam):
    f = jax.jit(lambda v: project(cam, v))
    uv, _ = f(jnp.asarray([0.1, 0.1, 1.0]))
    assert uv.shape == (2,)
