"""SmallBlurryImage: 40x30 ESM image alignment for rotation estimation and
relocalization.

Re-implements src/SmallBlurryImage.cc: a keyframe's level-0 image resized to
40x30, zero-meaned and Gaussian-blurred; ESM SE2 tracking (Benhimane &
Malis) with the 4-DOF [tx, ty, theta, mean] parameterization and averaged
template/current gradients; ZMSSD scoring for relocalization; and the
2-point WLS lift of an image SO2 rotation to a camera SO3
(SE3fromSE2, src/SmallBlurryImage.cc:253-313).

Everything is batched/jit-friendly; the ESM loop is a fixed-iteration
``fori_loop``.  SE2 state is carried as (cos, sin, tx, ty).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import SBI_SIZE
from mcptam_tpu.core.camera import (
    CameraModel, project, projection_derivs_sphere, unproject, cam_sphere_deriv,
)
from mcptam_tpu.core.se3 import so3_exp
from mcptam_tpu.core.linalg import solve_spd

ROWS, COLS = SBI_SIZE
CENTER = (COLS // 2, ROWS // 2)  # (x, y) = (20, 15)
DEFAULT_BLUR = 2.5


def make_sbi(img_l0: jnp.ndarray) -> jnp.ndarray:
    """(…,H,W) level-0 image -> (…,30,40) zero-mean blurred template
    (ref MakeFromKF, src/SmallBlurryImage.cc:67-95).

    Downsampling is a chain of 2x2 box half-samples (VGA: exactly four),
    not ``jax.image.resize``: the resize's dot-generals force XLA to keep
    a transposed copy of the full-resolution image, which in turn lowers
    the pyramid's strided slices as serial gathers (~2 ms/frame on v5e).
    The half-sample chain is CSE'd with the pyramid itself, and the heavy
    sigma-2.5 blur below makes box-vs-triangle filtering immaterial."""
    from mcptam_tpu.ops.pyramid import half_sample

    small = img_l0
    while (
        small.shape[-2] % 2 == 0 and small.shape[-2] // 2 >= ROWS
        and small.shape[-1] % 2 == 0 and small.shape[-1] // 2 >= COLS
    ):
        small = half_sample(small)
    if small.shape[-2:] != (ROWS, COLS):  # non-power-of-two fallback
        small = jax.image.resize(
            small, small.shape[:-2] + (ROWS, COLS), method="linear"
        )
    mean = jnp.mean(small, axis=(-2, -1), keepdims=True)
    centered = small - mean
    from mcptam_tpu.ops.pyramid import gaussian_blur_3

    return gaussian_blur_3(centered, sigma=DEFAULT_BLUR, radius=4)


def sbi_gradients(template: jnp.ndarray):
    """Unscaled central-difference gradients, zero at borders
    (ref MakeJacs — the 0.5 factors are folded in later, :99-118)."""
    gx = jnp.zeros_like(template)
    gy = jnp.zeros_like(template)
    gx = gx.at[..., 1:-1, 1:-1].set(
        template[..., 1:-1, 2:] - template[..., 1:-1, :-2]
    )
    gy = gy.at[..., 1:-1, 1:-1].set(
        template[..., 2:, 1:-1] - template[..., :-2, 1:-1]
    )
    return gx, gy


def sbi_zmssd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum-of-squared-differences of already-zero-mean templates
    (broadcasts; reduces over the trailing two axes)."""
    return jnp.sum((a - b) ** 2, axis=(-2, -1))


def _se2_mul(a, b):
    ca, sa, tax, tay = a
    cb, sb, tbx, tby = b
    return (
        ca * cb - sa * sb,
        sa * cb + ca * sb,
        ca * tbx - sa * tby + tax,
        sa * tbx + ca * tby + tay,
    )


def esm_align(cur_template, target_template, target_gx, target_gy,
              n_iterations: int = 9):
    """ESM-align ``cur_template`` to ``target_template``
    (ref IteratePosRelToTarget, src/SmallBlurryImage.cc:138-248).

    Returns ((cos, sin, tx, ty), final_score): the SE2 "CtoC" transform in
    centered pixel coords and the final SSD over valid pixels.
    """
    ys = jax.lax.broadcasted_iota(jnp.float32, (ROWS, COLS), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ROWS, COLS), 1)
    cx, cy = float(CENTER[0]), float(CENTER[1])

    row_ids = jnp.arange(ROWS, dtype=jnp.float32)
    col_ids = jnp.arange(COLS, dtype=jnp.float32)

    def body(_, carry):
        se2, mean_offset, _score = carry
        c, s, tx, ty = se2
        # warp current template: centered transform W * C * W^{-1};
        # warped[x] = cur[R @ (x - center) + center + t].  Bilinear sampling
        # is done gather-free: hat-function (triangle) weights over the row
        # and column index grids turn interpolation into two small
        # contractions — TPU gathers are the slow path, matmuls are not.
        xr = c * (xs - cx) - s * (ys - cy) + cx + tx
        yr = s * (xs - cx) + c * (ys - cy) + cy + ty
        xrc = jnp.clip(xr, 0.0, COLS - 1.0)
        yrc = jnp.clip(yr, 0.0, ROWS - 1.0)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(yrc[..., None] - row_ids))  # (R,C,ROWS)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xrc[..., None] - col_ids))  # (R,C,COLS)
        z = jnp.einsum("rcb,ab->rca", hx, cur_template)  # (R,C,ROWS)
        warped = jnp.einsum("rca,rca->rc", hy, z)
        valid_src = (xr >= 0) & (xr <= COLS - 2) & (yr >= 0) & (yr <= ROWS - 2)
        inner = jnp.zeros((ROWS, COLS), bool).at[1:-1, 1:-1].set(True)
        # gradient of the warped image (needs valid neighbors too)
        wgx = jnp.zeros_like(warped).at[1:-1, 1:-1].set(
            warped[1:-1, 2:] - warped[1:-1, :-2]
        )
        wgy = jnp.zeros_like(warped).at[1:-1, 1:-1].set(
            warped[2:, 1:-1] - warped[:-2, 1:-1]
        )
        nb_valid = (
            valid_src
            & jnp.roll(valid_src, 1, 1) & jnp.roll(valid_src, -1, 1)
            & jnp.roll(valid_src, 1, 0) & jnp.roll(valid_src, -1, 0)
        )
        m = (inner & nb_valid).astype(warped.dtype)

        gx = 0.25 * (wgx + target_gx)
        gy = 0.25 * (wgy + target_gy)
        j3 = -(ys - cy) * gx + (xs - cx) * gy
        diff = (warped - target_template + mean_offset) * m
        J = jnp.stack([gx * m, gy * m, j3 * m, m], axis=-1)  # (R,C,4)
        Jf = J.reshape(-1, 4)
        H = Jf.T @ Jf
        b = Jf.T @ diff.reshape(-1)
        upd = solve_spd(H + 1e-6 * jnp.eye(4), b)
        score = jnp.sum(diff * diff)

        dth = -upd[2]
        se2_upd = (jnp.cos(dth), jnp.sin(dth), -upd[0], -upd[1])
        new_se2 = _se2_mul(se2, se2_upd)
        return new_se2, mean_offset - upd[3], score

    init = (
        (jnp.ones(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
        jnp.zeros(()),
        jnp.asarray(jnp.inf),
    )
    se2, _, score = jax.lax.fori_loop(0, n_iterations, body, init)
    return se2, score


def se3_from_se2(se2, cam_src_sbi: CameraModel, cam_target_sbi: CameraModel):
    """Lift an SBI-image SE2 to a camera-frame SO3 via 2-point reprojection
    WLS (ref SE3fromSE2, src/SmallBlurryImage.cc:253-313).  The camera
    models must be SBI-sized variants (image_size == (40,30)).

    Returns R (3,3): rotation taking target-frame rays to source-frame.
    """
    c, s, tx, ty = se2
    cx, cy = float(CENTER[0]), float(CENTER[1])
    center = jnp.asarray([cx, cy])
    p5 = jnp.asarray([5.0, 0.0])
    turned = jnp.stack([
        center + jnp.asarray([c * 5.0 + tx, s * 5.0 + ty]),
        center + jnp.asarray([-c * 5.0 + tx, -s * 5.0 + ty]),
    ])
    orig = jnp.stack([
        unproject(cam_target_sbi, center + p5),
        unproject(cam_target_sbi, center - p5),
    ])

    def gn_step(_, R):
        v3cam = jnp.einsum("ij,nj->ni", R, orig)
        uv, _ = project(cam_src_sbi, v3cam)
        err = turned - uv  # (2,2)
        duv = projection_derivs_sphere(cam_src_sbi, v3cam)  # (2,2,2)
        d_th, d_ph = cam_sphere_deriv(v3cam)  # (2,3) each
        # motion of v3cam under SO3 generators: gen_m(v) = e_m x v
        gens = jnp.stack([
            jnp.stack([jnp.zeros_like(v3cam[:, 0]), -v3cam[:, 2], v3cam[:, 1]], -1),
            jnp.stack([v3cam[:, 2], jnp.zeros_like(v3cam[:, 0]), -v3cam[:, 0]], -1),
            jnp.stack([-v3cam[:, 1], v3cam[:, 0], jnp.zeros_like(v3cam[:, 0])], -1),
        ], axis=1)  # (2,3gen,3)
        sph = jnp.stack([
            jnp.einsum("nd,ngd->ng", d_th, gens),
            jnp.einsum("nd,ngd->ng", d_ph, gens),
        ], axis=1)  # (2pt, 2sph, 3gen)
        Jg = jnp.einsum("nij,njg->nig", duv, sph)  # (2pt,2uv,3)
        Jf = Jg.reshape(-1, 3)
        ef = err.reshape(-1)
        H = Jf.T @ Jf + 10.0 * jnp.eye(3)  # prior 10 as in reference
        mu = solve_spd(H, Jf.T @ ef)
        return so3_exp(mu) @ R

    R0 = jnp.eye(3)
    return jax.lax.fori_loop(0, 3, gn_step, R0)
