"""Dominant-plane RANSAC aligner + global map transform/scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3, so3_exp
from mcptam_tpu.map.align import (
    dominant_plane, plane_align_transform,
    apply_global_transform, apply_global_scale,
)
from mcptam_tpu.map.state import create_map_state, kf_cam_from_world


def _planar_cloud(rng, n_plane=80, n_out=20, N=128):
    """Points on the plane n.x = d (tilted), plus outliers; padded."""
    n = np.array([0.2, -0.3, 0.93])
    n /= np.linalg.norm(n)
    c = np.array([0.5, -0.2, 2.0])
    u = np.cross(n, [1.0, 0, 0]); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    a = rng.normal(size=(n_plane, 2))
    pts_plane = c + a[:, :1] * u + a[:, 1:] * v + rng.normal(size=(n_plane, 3)) * 0.002
    pts_out = c + rng.normal(size=(n_out, 3)) * 2.0
    pts = np.zeros((N, 3), np.float32)
    pts[:n_plane] = pts_plane
    pts[n_plane:n_plane + n_out] = pts_out
    valid = np.zeros(N, bool)
    valid[:n_plane + n_out] = True
    return jnp.asarray(pts), jnp.asarray(valid), n, c


def test_dominant_plane_found(rng):
    pts, valid, n_true, c_true = _planar_cloud(rng)
    c, n, inlier, ok = dominant_plane(pts, valid, jax.random.PRNGKey(0))
    assert bool(ok)
    n = np.asarray(n)
    assert abs(abs(n @ n_true) - 1.0) < 1e-3, n
    # centroid lies on the true plane
    assert abs((np.asarray(c) - c_true) @ n_true) < 0.01
    assert int(jnp.sum(inlier)) > 60


def test_plane_align_puts_plane_at_z0(rng):
    pts, valid, n_true, _ = _planar_cloud(rng)
    T, ok = plane_align_transform(pts, valid, jax.random.PRNGKey(1))
    assert bool(ok)
    moved = np.asarray(T.apply(pts))[np.asarray(valid)]
    # inliers (the first 80) now sit near z=0
    assert np.median(np.abs(moved[:80, 2])) < 0.01


def test_global_transform_preserves_reprojection(rng):
    """Transforming world + poses together must leave cam-frame point
    coords unchanged."""
    C, M, N = 2, 4, 64
    cam_from_base = SE3(
        R=jnp.stack([so3_exp(jnp.asarray([0.0, 0.1 * i, 0.0])) for i in range(C)]),
        t=jnp.asarray(rng.normal(size=(C, 3)) * 0.1, jnp.float32),
    )
    ms = create_map_state(32, 32, C, cam_from_base, N, M, 128)
    pos = jnp.asarray(rng.normal(size=(N, 3)) + np.array([0, 0, 3.0]), jnp.float32)
    ms = ms.replace(
        points=ms.points.replace(pos_w=pos, valid=jnp.ones(N, bool)),
        mkfs=ms.mkfs.replace(
            base_from_world=SE3(
                R=jnp.stack([so3_exp(jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32)) for _ in range(M)]),
                t=jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
            ),
            valid=jnp.ones(M, bool),
        ),
    )
    before = kf_cam_from_world(ms)
    p_before = jax.vmap(lambda R, t: pos @ R[0].T + t[0])(before.R, before.t)

    T = SE3.exp(jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.2, -0.15]))
    ms2 = apply_global_transform(ms, T)
    after = kf_cam_from_world(ms2)
    p_after = jax.vmap(lambda R, t, p: p @ R[0].T + t[0])(
        after.R, after.t, jnp.broadcast_to(ms2.points.pos_w, (M, N, 3))
    )
    assert np.allclose(np.asarray(p_before), np.asarray(p_after), atol=1e-4)


def test_global_scale(rng):
    C, M, N = 1, 2, 16
    ms = create_map_state(32, 32, C, SE3.identity((C,)), N, M, 64)
    pos = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    ms = ms.replace(points=ms.points.replace(pos_w=pos, valid=jnp.ones(N, bool)))
    ms2 = apply_global_scale(ms, 2.5)
    assert np.allclose(np.asarray(ms2.points.pos_w), np.asarray(pos) * 2.5)
    assert np.allclose(
        np.asarray(ms2.mkfs.scene_depth_mean),
        np.asarray(ms.mkfs.scene_depth_mean) * 2.5,
    )
