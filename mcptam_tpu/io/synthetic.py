"""Synthetic multi-camera scene: ground-truth replay harness.

The reference is exercised against ROS bag files of real fisheye rigs; it
has no synthetic tests (SURVEY §4).  This module is the rebuild's test
oracle and benchmark feed: a procedurally textured sphere rendered through
the Taylor camera model, giving multi-view-consistent images with exact
ground-truth poses and depths for any rig trajectory.

Rendering is jitted JAX (fast on TPU and CPU): per-pixel unproject ->
world ray -> sphere intersection -> 3D value-noise texture.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel, make_camera, stack_cameras, unproject

SPHERE_RADIUS = 6.0

# default fisheye intrinsics for tests/benchmarks (realistic wide lens)
DEFAULT_PARAMS = np.array(
    [180.0, -0.0020, 1.2e-6, -2.0e-9, 322.0, 243.0, 1.001, 0.0003, -0.0002]
)


def _hash3(ix, iy, iz, seed):
    h = (
        ix.astype(jnp.float32) * 12.9898
        + iy.astype(jnp.float32) * 78.233
        + iz.astype(jnp.float32) * 37.719
        + seed * 4.1459
    )
    return jnp.abs(jnp.sin(h) * 43758.5453) % 1.0


def value_noise3(p, freq, seed):
    """Trilinear-interpolated lattice noise at points (...,3)."""
    q = p * freq
    q0 = jnp.floor(q)
    f = q - q0
    f = f * f * (3.0 - 2.0 * f)  # smoothstep
    ix, iy, iz = q0[..., 0], q0[..., 1], q0[..., 2]
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                v = _hash3(ix + dx, iy + dy, iz + dz, seed)
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out = out + v * w
    return out


def texture(p, seed: float = 1.0):
    """Multi-octave intensity in [0,255] at world points (...,3)."""
    v = (
        0.55 * value_noise3(p, 1.3, seed)
        + 0.3 * value_noise3(p, 4.1, seed + 1.0)
        + 0.15 * value_noise3(p, 11.7, seed + 2.0)
    )
    return jnp.clip(v * 255.0, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def render_view(cam: CameraModel, cam_from_world: SE3, seed, H: int, W: int):
    """Render one camera view (H,W) f32 given cam_from_world."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    uv = jnp.stack([xs, ys], axis=-1)
    rays_c = unproject(cam, uv)                 # (H,W,3) unit rays (cam frame)
    w_from_c = cam_from_world.inv()
    d = jnp.einsum("ij,hwj->hwi", w_from_c.R, rays_c)
    c = w_from_c.t
    # |c + t d|^2 = R^2
    b = jnp.einsum("hwi,i->hw", d, c)
    disc = b * b - (jnp.dot(c, c) - SPHERE_RADIUS**2)
    t = -b + jnp.sqrt(jnp.maximum(disc, 0.0))
    p = c + t[..., None] * d
    return texture(p, seed)


def render_rig(cams: CameraModel, cam_from_base: SE3, base_from_world: SE3,
               seed, H: int, W: int):
    """Render all C cameras: (C,H,W) f32."""
    def per_cam(cam, cfb):
        pose = cfb @ base_from_world
        return render_view(cam, pose, seed, H, W)
    return jax.vmap(per_cam, in_axes=(0, 0))(cams, cam_from_base)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def render_view_board(cam: CameraModel, cam_from_world: SE3, seed,
                      H: int, W: int, squares=(8, 6),
                      square_size: float = 0.25):
    """Render one view of a world containing BOTH the textured sphere and
    an opaque checkerboard on the world z=0 plane spanning
    [0, squares[0]*s] x [0, squares[1]*s] — the pose-calibration oracle
    world, where the world frame IS the board frame (the reference anchors
    the calibration map to the grid, src/MapMakerCalib.cc:72-90)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    uv = jnp.stack([xs, ys], axis=-1)
    rays_c = unproject(cam, uv)
    w_from_c = cam_from_world.inv()
    d = jnp.einsum("ij,hwj->hwi", w_from_c.R, rays_c)
    c = w_from_c.t
    # sphere hit
    b = jnp.einsum("hwi,i->hw", d, c)
    disc = b * b - (jnp.dot(c, c) - SPHERE_RADIUS**2)
    t_sph = -b + jnp.sqrt(jnp.maximum(disc, 0.0))
    sphere_col = texture(c + t_sph[..., None] * d, seed)
    # board plane hit (z=0)
    dz = jnp.where(jnp.abs(d[..., 2]) < 1e-9, 1e-9, d[..., 2])
    t_pl = -c[2] / dz
    q = c + t_pl[..., None] * d
    gx = q[..., 0] / square_size
    gy = q[..., 1] / square_size
    on_board = (
        (t_pl > 1e-3) & (t_pl < t_sph)
        & (gx >= 0) & (gx <= squares[0]) & (gy >= 0) & (gy <= squares[1])
    )
    # Anti-aliased checker: the pattern is 0.5*(1 + sq(gx)*sq(gy)) with
    # sq the period-2 square wave.  Point-sampling it bakes aliasing into
    # the image that no later blur can undo, and caps sub-pixel matching
    # accuracy near the quantization floor (~0.4 px); instead box-filter
    # sq analytically over each pixel's footprint in grid units via its
    # antiderivative, the period-2 triangle wave.
    def tri(x):
        return 1.0 - jnp.abs(jnp.mod(x, 2.0) - 1.0)

    def sq_filtered(g, w):
        w = jnp.maximum(w, 1e-4)
        # integral of sq over [g-w/2, g+w/2] = T(g+w/2)-T(g-w/2) with
        # T' = sq; T(x) = tri(x) shifted so T'(x)=+1 on [0,1)
        return (tri(g + 0.5 * w) - tri(g - 0.5 * w)) / w

    def footprint(g):
        dgy, dgx = jnp.gradient(g)
        return jnp.abs(dgx) + jnp.abs(dgy)

    sgn = sq_filtered(gx, footprint(gx)) * sq_filtered(gy, footprint(gy))
    board_col = 127.5 + 107.5 * sgn
    img = jnp.where(on_board, board_col, sphere_col)
    # optical blur: razor-sharp synthetic edges would make any half-pixel
    # misregistration blow the ZMSSD budget in a way real lenses never do
    # (render_checkerboard blurs for the same reason)
    from mcptam_tpu.ops.pyramid import gaussian_blur_3
    return gaussian_blur_3(img, sigma=1.0, radius=3)


def render_rig_board(cams: CameraModel, cam_from_base: SE3,
                     base_from_world: SE3, seed, H: int, W: int,
                     squares=(8, 6), square_size: float = 0.25):
    """Render all C cameras of the board+sphere world: (C,H,W) f32."""
    def per_cam(cam, cfb):
        pose = cfb @ base_from_world
        return render_view_board(cam, pose, seed, H, W, squares, square_size)
    return jax.vmap(per_cam, in_axes=(0, 0))(cams, cam_from_base)


def ray_depth(cam_from_world: SE3, rays_c):
    """Ground-truth depth along camera rays to the sphere."""
    w_from_c = cam_from_world.inv()
    d = jnp.einsum("ij,...j->...i", w_from_c.R, rays_c)
    c = w_from_c.t
    b = jnp.einsum("...i,i->...", d, c)
    disc = b * b - (jnp.dot(c, c) - SPHERE_RADIUS**2)
    return -b + jnp.sqrt(jnp.maximum(disc, 0.0))


def make_rig(n_cams: int, H: int = 480, W: int = 640, spread_deg: float = 30.0):
    """A rig of n identical fisheye cameras fanned out in yaw, slightly
    offset in position (like the reference's multi-camera clusters)."""
    params = DEFAULT_PARAMS.copy()
    params[4] = W / 2.0 + 2.0
    params[5] = H / 2.0 + 3.0
    params[0] = 0.28 * W  # focal-ish scaling with resolution
    cams = stack_cameras([make_camera(params, (W, H)) for _ in range(n_cams)])

    yaws = (np.arange(n_cams) - (n_cams - 1) / 2.0) * np.radians(spread_deg)
    Rs, ts = [], []
    for i, y in enumerate(yaws):
        R = np.array(
            [[np.cos(y), 0, -np.sin(y)], [0, 1, 0], [np.sin(y), 0, np.cos(y)]],
            np.float32,
        )
        # decimeter-scale baselines like the reference's camera clusters —
        # triangulation depth accuracy scales with baseline/depth
        t = np.array([0.25 * (i % 2), -0.08 * i, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
    cam_from_base = SE3(R=jnp.asarray(np.stack(Rs)), t=jnp.asarray(np.stack(ts)))
    return cams, cam_from_base


def build_groundtruth_map(cams, cam_from_base, H, W, pose0=None,
                          seed: float = 3.0, n_per_level: int = 40,
                          max_points: int = 1024, max_mkfs: int = 8,
                          max_meas: int = 8192):
    """Build a MapState populated with ground-truth-depth points from one
    rendered keyframe — the instant-map path for tests and benchmarks
    (bypasses epipolar init; exact sphere depths)."""
    import jax
    from mcptam_tpu.config import LEVELS
    from mcptam_tpu.core.levels import level_zero_pos
    from mcptam_tpu.map.state import create_map_state, refresh_scene_depths
    from mcptam_tpu.map.builder import commit_mkf, add_points
    from mcptam_tpu.map.keyframe import make_frame_features

    if pose0 is None:
        pose0 = SE3.identity()
    C = int(cam_from_base.t.shape[0])
    images = render_rig(cams, cam_from_base, pose0, seed, H, W)
    feats = make_frame_features(images)
    ms = create_map_state(H, W, C, cam_from_base, max_points, max_mkfs, max_meas)
    ms, mkf_idx, _ = commit_mkf(ms, feats, pose0, fixed=True)
    for c in range(C):
        cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
        pose_c = cam_from_base[c] @ pose0
        for l in range(LEVELS):
            xy = feats.cand_xy[l][c][:n_per_level].astype(jnp.float32)
            want = feats.cand_valid[l][c][:n_per_level]
            xy0 = level_zero_pos(xy, float(l))
            rays = unproject(cam_c, xy0)
            depth = ray_depth(pose_c, rays)
            pos_w = pose_c.inv().apply(rays * depth[:, None])
            Q = xy.shape[0]
            ms, _, _ = add_points(
                ms, cams, mkf_idx=mkf_idx,
                cam_idx=jnp.full((Q,), c, jnp.int32),
                level=jnp.full((Q,), l, jnp.int32),
                xy_level=xy, pos_w=pos_w, want=want,
            )
    ms = refresh_scene_depths(ms)
    return ms, feats


def make_sbi_cams(cams: CameraModel, H: int, W: int) -> CameraModel:
    """SBI-sized (40x30) variants of the rig cameras for ESM rotation."""
    from mcptam_tpu.config import SBI_SIZE
    n = cams.theta_mean.shape[0]
    out = []
    for i in range(n):
        # reconstruct the host-side params is awkward; instead scale the
        # existing model: centers and affine scale linearly with image size
        sbi = jax.tree_util.tree_map(lambda a: a[i], cams)
        sy = SBI_SIZE[0] / H
        sx = SBI_SIZE[1] / W
        s = jnp.asarray([sx, sy])
        out.append(
            sbi.replace(
                center=sbi.center * s,
                affine=sbi.affine * s[:, None],
                affine_inv=jnp.linalg.inv(sbi.affine * s[:, None]),
                image_size=jnp.asarray([float(SBI_SIZE[1]), float(SBI_SIZE[0])]),
            )
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *out)
