"""Taylor (Scaramuzza) omnidirectional camera model, batched & jit-friendly.

TPU-native re-implementation of the reference's ``TaylorCamera``
(/root/reference/src/TaylorCamera.cc).  The model:

  * 9 parameters: polynomial a0,a2,a3,a4 (a1 == 0), projection center
    (xc, yc), affine sensor->image params (c, d, e);
  * unprojection: sensor radius rho -> z via the quartic
    ``poly(rho) = a0 + a2 rho^2 + a3 rho^3 + a4 rho^4``;
  * projection: elevation angle theta -> rho via a precomputed *inverse*
    polynomial fitted on the host at camera-construction time (mirroring
    ``RefreshParams``/``FindInvPolyUsingRoots``, src/TaylorCamera.cc:84-198,
    489-604) — no iterative root solving on the device hot path.

Pixel convention matches the reference/CVD: ``uv[0] = x = column``,
``uv[1] = y = row``; images are indexed ``img[y, x]``.

The device-side struct (:class:`CameraModel`) holds only arrays, so a rig of
N cameras is one struct with a leading camera axis (stack with
:func:`stack_cameras`) and every function vmaps/broadcasts over it — this is
the batching axis the reference loops over by camera name
(src/Tracker.cc:303-333 etc.).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from mcptam_tpu.config import MAX_INV_DEGREE

_INV_LEN = MAX_INV_DEGREE + 1


def polyval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation; ``coeffs[..., i]`` multiplies ``x**i`` (constant
    first, same storage as the reference's PolyVal).  Static unrolled loop
    over the (small, fixed) coefficient count."""
    n = coeffs.shape[-1]
    val = jnp.zeros_like(x)
    for i in range(n - 1, 0, -1):
        val = (val + coeffs[..., i]) * x
    return val + coeffs[..., 0]


@struct.dataclass
class CameraModel:
    """Device-side camera(s).  All fields may carry leading batch dims."""

    poly: jnp.ndarray        # (...,5)  [a0, 0, a2, a3, a4]
    poly_deriv_mod: jnp.ndarray  # (...,5) coeffs for d_rho/d_theta denominator
    inv_poly: jnp.ndarray    # (...,_INV_LEN) inverse fit, padded with zeros
    theta_mean: jnp.ndarray  # (...)
    theta_std: jnp.ndarray   # (...)
    center: jnp.ndarray      # (...,2)
    affine: jnp.ndarray      # (...,2,2)
    affine_inv: jnp.ndarray  # (...,2,2)
    image_size: jnp.ndarray  # (...,2)  (width, height) as float
    min_theta: jnp.ndarray   # (...)
    max_rho: jnp.ndarray     # (...)
    one_pixel_angle: jnp.ndarray  # (...)

    @property
    def batch_shape(self):
        return self.theta_mean.shape

    def __getitem__(self, idx) -> "CameraModel":
        import jax
        return jax.tree_util.tree_map(lambda a: a[idx], self)


# ---------------------------------------------------------------------------
# Host-side construction (numpy; mirrors RefreshParams)
# ---------------------------------------------------------------------------

def _forward_theta_of_rho(poly: np.ndarray, rho: np.ndarray) -> np.ndarray:
    """theta such that poly(rho) = rho * tan(theta)."""
    z = np.polyval(poly[::-1], rho)
    return np.arctan2(z, rho)


def make_camera(
    params9,
    calib_size,
    full_scale_size=None,
    image_size=None,
    dtype=jnp.float32,
) -> CameraModel:
    """Build a :class:`CameraModel` from the 9-vector + sizes.

    ``calib_size``/``full_scale_size``/``image_size`` are (width, height);
    scaling/centering semantics follow src/TaylorCamera.cc:114-190 (binning
    support: polynomial evaluated at full-scale radii, centers/affine scaled
    to the current image size).
    """
    params9 = np.asarray(params9, dtype=np.float64)
    calib_size = np.asarray(calib_size, dtype=np.float64)
    full_scale_size = (
        calib_size if full_scale_size is None
        else np.asarray(full_scale_size, dtype=np.float64)
    )
    image_size = (
        full_scale_size if image_size is None
        else np.asarray(image_size, dtype=np.float64)
    )

    a0, a2, a3, a4, xc, yc, c, d, e = params9
    poly = np.array([a0, 0.0, a2, a3, a4])
    # Coeffs of the denominator of d_rho/d_theta = (rho^2+w^2)/(-a0 + a2 rho^2
    # + 2 a3 rho^3 + 3 a4 rho^4)  (src/TaylorCamera.cc:106-110,355-358)
    poly_deriv_mod = np.array([-a0, 0.0, a2, 2.0 * a3, 3.0 * a4])

    scale = image_size / full_scale_size
    full_scale_center = np.array([
        xc - (calib_size[0] - full_scale_size[0]) / 2.0,
        yc - (calib_size[1] - full_scale_size[1]) / 2.0,
    ])
    center = full_scale_center * scale

    corner = np.maximum(full_scale_center, full_scale_size - full_scale_center - 1.0)
    max_rho = float(np.sqrt(np.sum(corner**2)))
    min_theta = float(np.arctan(np.polyval(poly[::-1], max_rho) / max_rho))

    # ---- inverse polynomial fit (host) ----------------------------------
    # Sample rho densely, keep the region where theta(rho) is strictly
    # monotonic (single-root region of the model), then least-squares fit
    # rho as a polynomial of the centered/scaled theta, raising the degree
    # until max abs error < 1e-4 px (same acceptance as the reference,
    # src/TaylorCamera.cc:157,489-604).
    rho_s = np.linspace(1e-6, max_rho, 4000)
    theta_s = _forward_theta_of_rho(poly, rho_s)
    # theta decreases from pi/2 (optical axis) as rho grows; keep the strictly
    # monotonic prefix (the single-root region the reference filters for).
    dtheta = np.diff(theta_s)
    if np.any(dtheta >= 0):
        cut = int(np.argmax(dtheta >= 0)) + 1
        rho_s, theta_s = rho_s[:cut], theta_s[:cut]
    theta_mean = float(np.mean(theta_s))
    theta_std = float(np.std(theta_s))
    tn = (theta_s - theta_mean) / theta_std

    inv_coeffs = None
    for degree in range(2, MAX_INV_DEGREE + 1):
        V = np.vander(tn, degree + 1, increasing=True)
        sol, *_ = np.linalg.lstsq(V, rho_s, rcond=None)
        err = np.max(np.abs(V @ sol - rho_s))
        if err < 1e-4:
            inv_coeffs = sol
            break
    if inv_coeffs is None:  # fall back to the best high-degree fit
        inv_coeffs = sol
    inv_padded = np.zeros(_INV_LEN)
    inv_padded[: inv_coeffs.size] = inv_coeffs

    affine = np.array([[scale[0] * c, scale[1] * d], [scale[0] * e, scale[1] * 1.0]])
    affine_inv = np.linalg.inv(affine)

    # one-pixel angle (src/TaylorCamera.cc:192-197) — pure host numpy: the
    # build path must stay free of device->host transfers (a single D2H
    # permanently downgrades the remote-TPU dispatch path to its slow mode)
    def _unproject_np(uv):
        uvd = affine_inv @ (np.asarray(uv, np.float64) - center)
        z = np.polyval(poly[::-1], np.linalg.norm(uvd))
        v = np.array([uvd[0], uvd[1], z])
        return v / np.linalg.norm(v)

    v_c = _unproject_np(image_size / 2.0)
    v_d = _unproject_np(image_size / 2.0 + 1.0)
    opa = float(np.arccos(np.clip(np.dot(v_c, v_d), -1.0, 1.0)) / np.sqrt(2.0))

    return CameraModel(
        poly=jnp.asarray(poly, dtype),
        poly_deriv_mod=jnp.asarray(poly_deriv_mod, dtype),
        inv_poly=jnp.asarray(inv_padded, dtype),
        theta_mean=jnp.asarray(theta_mean, dtype),
        theta_std=jnp.asarray(theta_std, dtype),
        center=jnp.asarray(center, dtype),
        affine=jnp.asarray(affine, dtype),
        affine_inv=jnp.asarray(affine_inv, dtype),
        image_size=jnp.asarray(image_size, dtype),
        min_theta=jnp.asarray(min_theta, dtype),
        max_rho=jnp.asarray(max_rho, dtype),
        one_pixel_angle=jnp.asarray(opa, dtype),
    )


def stack_cameras(cams) -> CameraModel:
    """Stack a list of single cameras into one struct with leading axis."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


# ---------------------------------------------------------------------------
# Device-side ops
# ---------------------------------------------------------------------------

def project(cam: CameraModel, v3: jnp.ndarray):
    """Camera-frame point(s) -> pixel coords.

    Returns ``(uv, valid)``; invalid when theta < min_theta (outside model
    FOV) or the pixel falls outside the image (src/TaylorCamera.cc:202-287).
    Broadcasts cam batch dims against v3 batch dims.
    """
    x, y, z = v3[..., 0], v3[..., 1], v3[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(z, norm)
    valid = theta >= cam.min_theta

    tn = (theta - cam.theta_mean) / cam.theta_std
    rho = polyval(cam.inv_poly, tn)

    norm_safe = jnp.where(norm == 0, 1.0, norm)
    cos_phi = jnp.where(norm == 0, 0.0, x / norm_safe)
    sin_phi = jnp.where(norm == 0, 0.0, y / norm_safe)
    rho = jnp.where(norm == 0, 0.0, rho)

    uv_dist = jnp.stack([cos_phi * rho, sin_phi * rho], axis=-1)
    uv = jnp.einsum("...ij,...j->...i", cam.affine, uv_dist) + cam.center

    inside = (
        (uv[..., 0] >= 0)
        & (uv[..., 1] >= 0)
        & (uv[..., 0] < cam.image_size[..., 0] - 1)
        & (uv[..., 1] < cam.image_size[..., 1] - 1)
    )
    return uv, valid & inside


def unproject(cam: CameraModel, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> unit-sphere direction in the camera frame
    (src/TaylorCamera.cc:319-346)."""
    uv_dist = jnp.einsum(
        "...ij,...j->...i", cam.affine_inv, uv - cam.center
    )
    rho = jnp.linalg.norm(uv_dist, axis=-1)
    z = polyval(cam.poly, rho)
    v3 = jnp.concatenate([uv_dist, z[..., None]], axis=-1)
    n = jnp.linalg.norm(v3, axis=-1, keepdims=True)
    return v3 / jnp.where(n == 0, 1.0, n)


def projection_derivs_sphere(cam: CameraModel, v3: jnp.ndarray) -> jnp.ndarray:
    """2x2 d(uv)/d(theta,phi) at camera-frame point v3
    (src/TaylorCamera.cc:353-383).  Broadcasts like :func:`project`."""
    x, y, z = v3[..., 0], v3[..., 1], v3[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(z, norm)
    tn = (theta - cam.theta_mean) / cam.theta_std
    rho = polyval(cam.inv_poly, tn)
    norm_safe = jnp.where(norm == 0, 1.0, norm)
    cos_phi = jnp.where(norm == 0, 0.0, x / norm_safe)
    sin_phi = jnp.where(norm == 0, 0.0, y / norm_safe)

    w = polyval(cam.poly, rho)
    denom = polyval(cam.poly_deriv_mod, rho)
    drho_dtheta = (rho * rho + w * w) / jnp.where(denom == 0, 1.0, denom)

    d_theta = jnp.stack([cos_phi * drho_dtheta, sin_phi * drho_dtheta], axis=-1)
    d_phi = jnp.stack([-sin_phi * rho, cos_phi * rho], axis=-1)
    cols = jnp.stack([d_theta, d_phi], axis=-1)  # (...,2,2) sensor-plane
    return jnp.einsum("...ij,...jk->...ik", cam.affine, cols)


def cam_sphere_deriv(v3: jnp.ndarray):
    """d(theta)/d(point), d(phi)/d(point): each (...,3)
    (src/TaylorCamera.cc:617-669, static GetCamSphereDeriv)."""
    x, y, z = v3[..., 0], v3[..., 1], v3[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    n2 = x2 + y2
    n = jnp.sqrt(n2)
    n3 = n2 * n
    dn = n3 + n * z2
    dn_safe = jnp.where(dn == 0, 1.0, dn)
    zero_n = n == 0
    d_theta = jnp.stack(
        [
            jnp.where(zero_n, 0.0, -z * x / dn_safe),
            jnp.where(zero_n, 0.0, -z * y / dn_safe),
            jnp.where(zero_n, 0.0, n / jnp.where(n2 + z2 == 0, 1.0, n2 + z2)),
        ],
        axis=-1,
    )
    n2_safe = jnp.where(n2 == 0, 1.0, n2)
    d_phi = jnp.stack(
        [
            jnp.where(zero_n, 0.0, -y / n2_safe),
            jnp.where(zero_n, 0.0, x / n2_safe),
            jnp.zeros_like(x),
        ],
        axis=-1,
    )
    return d_theta, d_phi


def project_jacobian_point(cam: CameraModel, v3: jnp.ndarray) -> jnp.ndarray:
    """Full 2x3 d(uv)/d(v3_cam) — chain of the two derivs above.  This is
    the Jacobian the reference assembles per measurement in
    TrackerData::CalcJacobian and EdgeChainMeas::linearizeOplus."""
    duv = projection_derivs_sphere(cam, v3)          # (...,2,2)
    d_theta, d_phi = cam_sphere_deriv(v3)            # (...,3) each
    dsph = jnp.stack([d_theta, d_phi], axis=-2)      # (...,2,3)
    return jnp.einsum("...ij,...jk->...ik", duv, dsph)


# ---------------------------------------------------------------------------
# Scalar-component ("SoA") variants for the bundle-adjustment hot path
# ---------------------------------------------------------------------------
#
# TPU arrays tile their two minor dimensions to (8, 128); a (K, 2, 2)
# Jacobian array therefore stores 4 floats in a 1024-float tile.  The BA
# normal-equation assembly touches tens of such tensors per measurement,
# so the AoS layout wastes ~2 orders of magnitude of bandwidth.  These
# helpers keep every per-measurement quantity as a flat (N,) array
# (python lists standing in for the small fixed dims), which vectorizes
# perfectly and lets XLA fuse the whole chain.  Math is identical to
# project/projection_derivs_sphere/cam_sphere_deriv above
# (ref src/TaylorCamera.cc:202-287,353-383,617-669).

def camera_soa(cam: CameraModel, idx: jnp.ndarray) -> dict:
    """Gather per-measurement camera parameters as flat component arrays.

    cam carries a leading camera axis; idx is the (N,) per-measurement
    camera index."""
    g = lambda t: t[idx]
    return {
        "inv_poly": [g(cam.inv_poly[..., i]) for i in range(cam.inv_poly.shape[-1])],
        "poly": [g(cam.poly[..., i]) for i in range(cam.poly.shape[-1])],
        "pdm": [g(cam.poly_deriv_mod[..., i]) for i in range(cam.poly_deriv_mod.shape[-1])],
        "theta_mean": g(cam.theta_mean),
        "theta_std": g(cam.theta_std),
        "min_theta": g(cam.min_theta),
        "cx": g(cam.center[..., 0]),
        "cy": g(cam.center[..., 1]),
        "a00": g(cam.affine[..., 0, 0]),
        "a01": g(cam.affine[..., 0, 1]),
        "a10": g(cam.affine[..., 1, 0]),
        "a11": g(cam.affine[..., 1, 1]),
        "wm1": g(cam.image_size[..., 0]) - 1.0,
        "hm1": g(cam.image_size[..., 1]) - 1.0,
    }


def _horner_soa(coeffs: list, x: jnp.ndarray) -> jnp.ndarray:
    val = jnp.zeros_like(x)
    for i in range(len(coeffs) - 1, 0, -1):
        val = (val + coeffs[i]) * x
    return val + coeffs[0]


def project_chain_soa(camf: dict, x, y, z, with_derivs: bool = True):
    """Projection + (optionally) the full derivative chain, SoA.

    Returns a dict with u, v, ok, and when with_derivs: duv (2x3 nested
    list, d uv / d p_cam — the product of the 2x2 image-from-sphere
    Jacobian with the sphere-coordinate derivs, ref
    EdgeChainMeas::linearizeOplus src/ChainBundle.cc:449-749)."""
    n2 = x * x + y * y
    norm = jnp.sqrt(n2)
    theta = jnp.arctan2(z, norm)
    fov_ok = theta >= camf["min_theta"]

    tn = (theta - camf["theta_mean"]) / camf["theta_std"]
    rho = _horner_soa(camf["inv_poly"], tn)

    zero_n = norm == 0
    norm_safe = jnp.where(zero_n, 1.0, norm)
    cos_phi = jnp.where(zero_n, 0.0, x / norm_safe)
    sin_phi = jnp.where(zero_n, 0.0, y / norm_safe)
    rho = jnp.where(zero_n, 0.0, rho)

    ux = cos_phi * rho
    uy = sin_phi * rho
    u = camf["a00"] * ux + camf["a01"] * uy + camf["cx"]
    v = camf["a10"] * ux + camf["a11"] * uy + camf["cy"]
    ok = (
        fov_ok & (u >= 0) & (v >= 0) & (u < camf["wm1"]) & (v < camf["hm1"])
    )
    out = {"u": u, "v": v, "ok": ok}
    if not with_derivs:
        return out

    w_ = _horner_soa(camf["poly"], rho)
    denom = _horner_soa(camf["pdm"], rho)
    drho = (rho * rho + w_ * w_) / jnp.where(denom == 0, 1.0, denom)
    # duv2 = affine @ [[c*drho, -s*rho], [s*drho, c*rho]]
    d00 = camf["a00"] * cos_phi * drho + camf["a01"] * sin_phi * drho
    d01 = -camf["a00"] * sin_phi * rho + camf["a01"] * cos_phi * rho
    d10 = camf["a10"] * cos_phi * drho + camf["a11"] * sin_phi * drho
    d11 = -camf["a10"] * sin_phi * rho + camf["a11"] * cos_phi * rho

    # sphere coordinate derivs (GetCamSphereDeriv)
    z2 = z * z
    n3dn = norm * n2 + norm * z2
    dn_safe = jnp.where(n3dn == 0, 1.0, n3dn)
    r2 = n2 + z2
    dth = [
        jnp.where(zero_n, 0.0, -z * x / dn_safe),
        jnp.where(zero_n, 0.0, -z * y / dn_safe),
        jnp.where(zero_n, 0.0, norm / jnp.where(r2 == 0, 1.0, r2)),
    ]
    n2_safe = jnp.where(zero_n, 1.0, n2)
    dph = [
        jnp.where(zero_n, 0.0, -y / n2_safe),
        jnp.where(zero_n, 0.0, x / n2_safe),
        jnp.zeros_like(x),
    ]
    # duv[i][l] = duv2[i][0]*dth[l] + duv2[i][1]*dph[l]
    out["duv"] = [
        [d00 * dth[l] + d01 * dph[l] for l in range(3)],
        [d10 * dth[l] + d11 * dph[l] for l in range(3)],
    ]
    return out
