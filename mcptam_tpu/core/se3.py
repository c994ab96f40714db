"""Batched SE(3)/SO(3) Lie-group operations.

TPU-native replacement for TooN's ``SO3<>``/``SE3<>`` used throughout the
reference (pose updates in src/Tracker.cc:1386-1511, the left-multiplied
``SE3::exp`` vertex update in src/ChainBundle.cc:93-99, generator fields in
include/mcptam/TrackerData.h:152-178).

Conventions (matching TooN):
  * a 6-vector tangent is ``[u, w]`` — translation part first, rotation last;
  * pose update is left-multiplied: ``pose' = exp(delta) @ pose``;
  * ``SE3`` maps points *into* its frame: ``x_cam = R @ x_world + t`` for a
    ``cam_from_world`` pose.

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap/grad friendly (no data-dependent Python control flow; small-angle
cases handled with series + ``jnp.where`` guards so gradients stay finite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) with
    series fallbacks for small angles.  The series threshold is wide
    (theta < 0.1) because the closed forms cancel catastrophically in
    float32 well before theta reaches sqrt(eps); the 3-term series is
    accurate to ~1e-10 there."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta_sq < 1e-2
    ts = jnp.where(small, 1.0, theta)  # safe theta
    t2 = theta_sq
    A = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(ts) / ts)
    B = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
        (1.0 - jnp.cos(ts)) / jnp.where(small, 1.0, t2),
    )
    C = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
        (1.0 - A) / jnp.where(small, 1.0, t2),
    )
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) tangent -> (...,3,3) rotation."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_ln(R: jnp.ndarray) -> jnp.ndarray:
    """Log map (...,3,3) -> (...,3).  Handles the full range including
    rotations near pi via the symmetric-part eigen decomposition trick."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    s = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # sin(t) * axis
    sin_t = jnp.linalg.norm(s, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)

    # Regular branch: w = theta/sin(theta) * s   (series near 0)
    small = sin_t < _EPS
    sin_safe = jnp.where(small, 1.0, sin_t)
    factor = jnp.where(small, 1.0 + theta * theta / 6.0, theta / sin_safe)
    w_regular = factor[..., None] * s

    # Near-pi branch: axis from diagonal of (R + I)/2 = aa^T(approximately)
    near_pi = cos_t < -0.999
    Rp = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    col_norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis = col / jnp.where(col_norm < _EPS, 1.0, col_norm)
    # fix sign so axis agrees with s (s may be ~0 at exactly pi; sign then
    # arbitrary, which is fine — +pi and -pi rotations coincide)
    sign = jnp.where(jnp.sum(axis * s, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign

    return jnp.where(near_pi[..., None], w_pi, w_regular)


@struct.dataclass
class SE3:
    """Rigid transform: ``x_out = R @ x_in + t``.  Fields broadcast over
    leading batch dims; the struct is a pytree so it can live inside jitted
    state."""

    R: jnp.ndarray  # (...,3,3)
    t: jnp.ndarray  # (...,3)

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(R=R, t=t)

    @classmethod
    def exp(cls, v6: jnp.ndarray) -> "SE3":
        """Tangent (...,6) = [u, w] -> SE3.  t = V @ u."""
        u, w = v6[..., :3], v6[..., 3:]
        theta_sq = jnp.sum(w * w, axis=-1)
        A, B, C = _sinc_coeffs(theta_sq)
        W = hat(w)
        W2 = W @ W
        eye = jnp.broadcast_to(jnp.eye(3, dtype=v6.dtype), W.shape)
        R = eye + A[..., None, None] * W + B[..., None, None] * W2
        V = eye + B[..., None, None] * W + C[..., None, None] * W2
        t = jnp.einsum("...ij,...j->...i", V, u)
        return cls(R=R, t=t)

    @classmethod
    def from_Rt(cls, R: jnp.ndarray, t: jnp.ndarray) -> "SE3":
        return cls(R=R, t=t)

    # -- group ops ---------------------------------------------------------
    def __matmul__(self, other: "SE3") -> "SE3":
        R = self.R @ other.R
        t = jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t
        return SE3(R=R, t=t)

    def inv(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(R=Rt, t=-jnp.einsum("...ij,...j->...i", Rt, self.t))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points (...,3)."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def rotate(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...j->...i", self.R, x)

    def ln(self) -> jnp.ndarray:
        """Log map -> (...,6) = [u, w]."""
        w = so3_ln(self.R)
        theta_sq = jnp.sum(w * w, axis=-1)
        A, B, _ = _sinc_coeffs(theta_sq)
        W = hat(w)
        W2 = W @ W
        # V^{-1} = I - W/2 + coef * W^2,  coef = (1 - A/(2B)) / theta^2.
        # Wide series threshold: the closed form cancels in f32 (1 - A/(2B)
        # is O(theta^2/12) computed from O(1) quantities).
        small = theta_sq < 1e-2
        ts_safe = jnp.where(small, 1.0, theta_sq)
        coef = jnp.where(
            small,
            1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0,
            (1.0 - A / (2.0 * B)) / ts_safe,
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
        Vinv = eye - 0.5 * W + coef[..., None, None] * W2
        u = jnp.einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([u, w], axis=-1)

    # -- misc --------------------------------------------------------------
    def as_matrix(self) -> jnp.ndarray:
        """(...,4,4) homogeneous matrix."""
        bottom = jnp.zeros(self.R.shape[:-2] + (1, 4), dtype=self.R.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def __getitem__(self, idx) -> "SE3":
        return SE3(R=self.R[idx], t=self.t[idx])


def se3_generator_field(j: int, p_homog: jnp.ndarray) -> jnp.ndarray:
    """TooN ``SE3::generator_field`` analogue: derivative of exp(e_j) acting
    on a homogeneous point (reference: used by TrackerData::CalcJacobian,
    include/mcptam/TrackerData.h:152-178).  p_homog is (...,4); returns
    (...,4) (last component always 0)."""
    out = jnp.zeros_like(p_homog)
    if j < 3:
        return out.at[..., j].set(p_homog[..., 3])
    # rotation generators: hat(e_j) @ p
    a, b = [(1, 2), (2, 0), (0, 1)][j - 3]
    out = out.at[..., a].set(-p_homog[..., b])
    out = out.at[..., b].set(p_homog[..., a])
    return out


def geodesic_rotation_mean(Rs: jnp.ndarray, mask: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Geodesic L2 mean of rotations (N,3,3) with validity mask (N,).

    Replaces the reference's iterative rotation averaging used to fuse
    per-camera SBI rotation estimates (src/Tracker.cc:1687-1749) and in
    extrinsic calibration (src/MapMakerCalib.cc:248-345).  Fixed iteration
    count instead of convergence test (XLA-friendly)."""
    denom = jnp.maximum(jnp.sum(mask), 1.0)

    def body(_, R_mean):
        # average tangents of R_mean^T @ R_i
        rel = jnp.einsum("ji,njk->nik", R_mean, Rs)
        tangents = so3_ln(rel) * mask[:, None]
        delta = jnp.sum(tangents, axis=0) / denom
        return R_mean @ so3_exp(delta)

    R0 = jnp.eye(3, dtype=Rs.dtype)
    return jax.lax.fori_loop(0, iters, body, R0)
