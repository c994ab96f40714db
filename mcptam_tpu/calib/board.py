"""Synthetic checkerboard rendering + ground truth for calibration tests.

The reference is driven by live checkerboard video; our oracle renders a
planar board through the Taylor camera at known poses, so detection,
intrinsic and extrinsic calibration can be validated against exact
parameters."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel, unproject, project


def render_checkerboard(cam: CameraModel, board_from_cam: SE3,
                        H: int, W: int, squares=(8, 6),
                        square_size: float = 0.04,
                        background: float = 128.0) -> jnp.ndarray:
    """Render an (H,W) image of a checkerboard plane (z=0 in board frame).

    The board spans [0, squares[0]*s] x [0, squares[1]*s]; outside it the
    image is flat background."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    uv = jnp.stack([xs, ys], axis=-1)
    rays = unproject(cam, uv)                              # cam frame
    Rb = board_from_cam.R
    tb = board_from_cam.t
    dz = jnp.einsum("j,hwj->hw", Rb[2], rays)
    t_star = -tb[2] / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    q = (
        jnp.einsum("ij,hwj->hwi", Rb, rays * t_star[..., None])
        + tb
    )
    gx = q[..., 0] / square_size
    gy = q[..., 1] / square_size
    inside = (
        (t_star > 0)
        & (gx >= 0) & (gx <= squares[0]) & (gy >= 0) & (gy <= squares[1])
    )
    checker = (jnp.floor(gx).astype(jnp.int32) + jnp.floor(gy).astype(jnp.int32)) % 2
    color = jnp.where(checker == 0, 235.0, 20.0)
    img = jnp.where(inside, color, background)
    # slight blur to soften the edges (helps subpixel refinement realism)
    from mcptam_tpu.ops.pyramid import gaussian_blur_3
    return gaussian_blur_3(img, sigma=0.8, radius=2)


def inner_corner_points(squares=(8, 6), square_size: float = 0.04) -> np.ndarray:
    """World (board-frame) coords of the inner corners, row-major (r,c):
    (n_rows, n_cols, 3) with n_cols = squares[0]-1, n_rows = squares[1]-1."""
    nc, nr = squares[0] - 1, squares[1] - 1
    pts = np.zeros((nr, nc, 3))
    for r in range(nr):
        for c in range(nc):
            pts[r, c] = [(c + 1) * square_size, (r + 1) * square_size, 0.0]
    return pts


def project_corners(cam: CameraModel, board_from_cam: SE3, squares=(8, 6),
                    square_size: float = 0.04):
    """Ground-truth projections of the inner corners: ((nr,nc,2), valid)."""
    pts = jnp.asarray(inner_corner_points(squares, square_size), jnp.float32)
    cam_pts = board_from_cam.inv().apply(pts.reshape(-1, 3))
    uv, ok = project(cam, cam_pts)
    nr, nc, _ = pts.shape
    return uv.reshape(nr, nc, 2), ok.reshape(nr, nc)
