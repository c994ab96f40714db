"""Map alignment: dominant-plane detection + global transform / scale.

The reference finds a dominant plane by RANSAC over map points and aligns
the world frame to it (MapMakerServerBase::CalcPlaneAligner,
src/MapMakerServerBase.cc:1084-1195), and applies global SE3 transforms /
scale changes to every MKF pose and point (ApplyGlobalTransformationToMap
/ ApplyGlobalScaleToMap, src/MapMakerServerBase.cc:549-596; triggered by
the System's rescale & align GUI commands, src/System.cc:305-405).

TPU-native formulation: the hypothesis loop becomes a *batched* RANSAC —
H plane hypotheses scored against all N points at once (an (H,N) distance
matrix, pure VPU work), followed by an inlier-covariance eigen-refinement
of the winner.  No data-dependent loop, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.map.state import MapState


def dominant_plane(points_w: jnp.ndarray, valid: jnp.ndarray, key,
                   n_hyp: int = 128):
    """Batched-RANSAC dominant plane.

    points_w: (N,3), valid: (N,) bool.  Returns (center (3,), normal (3,),
    inlier_mask (N,), ok bool).  The inlier threshold is scale-adaptive:
    10% of the median |point - centroid| spread, mirroring the reference's
    relative tolerance.
    """
    N = points_w.shape[0]
    nv = jnp.sum(valid)
    w = valid.astype(jnp.float32)
    centroid = jnp.sum(points_w * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1)
    spread = jnp.linalg.norm(points_w - centroid, axis=-1)
    med_spread = jnp.median(jnp.where(valid, spread, jnp.nan))
    med_spread = jnp.nan_to_num(med_spread, nan=1.0)
    tol = 0.10 * jnp.maximum(med_spread, 1e-6)

    # H random triples, biased to valid slots via gumbel-top-3 on validity
    keys = jax.random.split(key, n_hyp)

    def triple(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        _, idx = jax.lax.top_k(g, 3)
        return idx

    idx3 = jax.vmap(triple)(keys)            # (H,3)
    p0 = points_w[idx3[:, 0]]                # (H,3)
    p1 = points_w[idx3[:, 1]]
    p2 = points_w[idx3[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)          # (H,3)
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = n_norm[:, 0] < 1e-9
    n = n / jnp.maximum(n_norm, 1e-12)

    # (H,N) point-plane distances
    d = jnp.abs(jnp.einsum("hj,nj->hn", n, points_w) -
                jnp.einsum("hj,hj->h", n, p0)[:, None])
    inl = (d < tol) & valid[None, :]
    score = jnp.where(degenerate, -1, jnp.sum(inl, axis=-1))
    best = jnp.argmax(score)
    inlier = inl[best]

    # refine: centroid + smallest-eigenvector normal of the inlier cloud
    wi = inlier.astype(jnp.float32)
    swi = jnp.maximum(jnp.sum(wi), 1.0)
    c = jnp.sum(points_w * wi[:, None], 0) / swi
    dp = (points_w - c) * wi[:, None]
    cov = dp.T @ dp / swi + 1e-9 * jnp.eye(3)
    eigval, eigvec = jnp.linalg.eigh(cov)
    normal = eigvec[:, 0]                    # smallest eigenvalue
    ok = (nv >= 10) & (score[best] >= jnp.maximum(6, 0.3 * nv))
    return c, normal, inlier, ok


def plane_align_transform(points_w: jnp.ndarray, valid: jnp.ndarray, key,
                          up_hint: jnp.ndarray | None = None) -> tuple[SE3, jnp.ndarray]:
    """SE3 taking old world coords to a frame where the dominant plane is
    z=0.  `up_hint` (3,) in old world coords picks the normal sign (points
    end up on the +z side of it); default -z (camera looking down +z sees
    the plane below, the reference's convention for the ground grid).

    Returns (T_new_from_old, ok)."""
    c, n, _, ok = dominant_plane(points_w, valid, key)
    hint = jnp.asarray([0.0, 0.0, -1.0]) if up_hint is None else up_hint
    n = jnp.where(jnp.dot(n, hint) < 0, -n, n)
    # orthonormal basis (u, v, n): rotation rows -> new frame axes
    a = jnp.where(jnp.abs(n[0]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    u = jnp.cross(n, a)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    v = jnp.cross(n, u)
    R = jnp.stack([u, v, n])                 # new_from_old rotation
    T = SE3(R=R, t=-R @ c)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), T, SE3.identity()
    ), ok


def apply_global_transform(ms: MapState, T: SE3) -> MapState:
    """w' = T.apply(w): move every point and re-hang every MKF base pose
    (base_from_world' = base_from_world @ T^-1), then refresh the points'
    world-frame pixel footprints (ApplyGlobalTransformationToMap,
    src/MapMakerServerBase.cc:549-596)."""
    from mcptam_tpu.map.state import refresh_pixel_vectors

    Tinv = T.inv()
    pts = ms.points.replace(pos_w=T.apply(ms.points.pos_w))
    base = ms.mkfs.base_from_world
    new_base = SE3(
        R=jnp.einsum("mij,jk->mik", base.R, Tinv.R),
        t=jnp.einsum("mij,j->mi", base.R, Tinv.t) + base.t,
    )
    ms = ms.replace(points=pts,
                    mkfs=ms.mkfs.replace(base_from_world=new_base))
    return refresh_pixel_vectors(ms)


def apply_global_scale(ms: MapState, scale) -> MapState:
    """Uniform rescale about the world origin: point positions, MKF
    translations, scene depths and pixel footprints all scale
    (ApplyGlobalScaleToMap; the 'rescale' GUI command path,
    src/System.cc:305-405)."""
    s = jnp.asarray(scale, jnp.float32)
    pts = ms.points.replace(
        pos_w=ms.points.pos_w * s,
        pixel_right_w=ms.points.pixel_right_w * s,
        pixel_down_w=ms.points.pixel_down_w * s,
    )
    base = ms.mkfs.base_from_world
    mkfs = ms.mkfs.replace(
        base_from_world=SE3(R=base.R, t=base.t * s),
        scene_depth_mean=ms.mkfs.scene_depth_mean * s,
        scene_depth_sigma=ms.mkfs.scene_depth_sigma * s,
    )
    return ms.replace(points=pts, mkfs=mkfs)
