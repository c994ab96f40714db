"""TPU-native nonlinear intrinsic refinement: batched analytic-Jacobian LM
with pose/camera Schur elimination.

The reference's CameraCalibrator::OptimizeOneStepLM
(/root/reference/src/CameraCalibrator.cc:439-555) eliminates the per-view
pose blocks from the normal equations and solves a small camera-parameter
system.  This module is the same algorithm expressed the TPU way:

  * all views padded to one static (V, K) measurement tensor;
  * calibration-mode projection solves the quartic ``poly(rho) =
    rho * tan(theta)`` with a vectorized Newton iteration seeded from the
    MEASURED sensor radius — the measurement-consistent root, replacing
    the reference's per-point companion-matrix root enumeration
    (src/TaylorCamera.cc:235-258) with something jit-able and
    differentiable;
  * Jacobians via ``jax.jacfwd`` on the per-view residual (vmapped), so
    the pose blocks come out already block-diagonal;
  * Schur: S = U - sum_i W_i V_i^-1 W_i^T over the 9 camera parameters,
    back-substitution for the 6-DOF pose updates — identical elimination
    order to the reference.

Everything is float32 on device; the BA fidelity gate (test_fidelity.py)
establishes that f32 LM tracks the f64 oracle at these problem scales.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _rodrigues_j(w):
    """exp(skew(w)) with series fallbacks smooth at w=0 — the LM starts at
    eps=0 exactly, so the jacfwd there must not see a w/|w| singularity."""
    th2 = jnp.sum(w * w)
    small = th2 < 1e-8
    safe = jnp.where(small, 1.0, th2)          # double-where grad guard
    th = jnp.sqrt(safe)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / safe)
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    return jnp.eye(3) + A * K + B * (K @ K)


def _project_calib_newton(p9, pc, rho_init, n_newton: int = 10):
    """Calibration-mode projection of cam-frame points pc (...,3).

    Solves a4 r^4 + a3 r^3 + a2 r^2 + a0 = r * tan(theta) by Newton from
    rho_init (the measured sensor radius).  Returns (uv (...,2), ok)."""
    a0, a2, a3, a4, xc, yc, c, d, e = [p9[i] for i in range(9)]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    norm = jnp.sqrt(x * x + y * y + 1e-24)
    tan_t = z / norm
    rho = jnp.maximum(rho_init, 1e-3)
    for _ in range(n_newton):
        g = a0 + rho * rho * (a2 + rho * (a3 + rho * a4)) - rho * tan_t
        gp = rho * (2.0 * a2 + rho * (3.0 * a3 + rho * 4.0 * a4)) - tan_t
        rho = rho - g / jnp.where(jnp.abs(gp) < 1e-9, 1e-9, gp)
    g = a0 + rho * rho * (a2 + rho * (a3 + rho * a4)) - rho * tan_t
    ok = (jnp.abs(g) < 1e-3 * jnp.abs(a0)) & (rho > 0.0)
    mx = x / norm * rho
    my = y / norm * rho
    u = c * mx + d * my + xc
    v = e * mx + my + yc
    return jnp.stack([u, v], axis=-1), ok


def _residual_view(p9, eps, R0, t0, board3, uv_meas, mask):
    """Masked residuals of one view under pose tangent eps=[w, dt]."""
    R = _rodrigues_j(eps[:3]) @ R0
    t = t0 + eps[3:]
    pc = board3 @ R.T + t
    # measured sensor radius under the CURRENT affine/center — the Newton
    # seed tracking the parameters being optimized
    xc, yc, c, d, e = p9[4], p9[5], p9[6], p9[7], p9[8]
    du = uv_meas[..., 0] - xc
    dv = uv_meas[..., 1] - yc
    det = c - d * e
    mx = (du - d * dv) / det
    my = (c * dv - e * du) / det
    rho0 = jnp.sqrt(mx * mx + my * my + 1e-12)
    uv, ok = _project_calib_newton(p9, pc, jax.lax.stop_gradient(rho0))
    w = (mask & ok).astype(jnp.float32)
    r = (uv - uv_meas) * w[..., None]
    return r.reshape(-1), w


def _build_normal(p9, eps, R0, t0, board3, uv, mask):
    """Per-view residuals + Jacobians + masked normal-equation blocks."""
    def rv(p9_, eps_v, R0_v, t0_v, b_v, uv_v, m_v):
        return _residual_view(p9_, eps_v, R0_v, t0_v, b_v, uv_v, m_v)[0]

    r, w = jax.vmap(
        lambda e_v, R_v, t_v, b_v, u_v, m_v:
            _residual_view(p9, e_v, R_v, t_v, b_v, u_v, m_v)
    )(eps, R0, t0, board3, uv, mask)                       # (V,2K), (V,K)
    Jc = jax.vmap(
        lambda e_v, R_v, t_v, b_v, u_v, m_v:
            jax.jacfwd(rv, argnums=0)(p9, e_v, R_v, t_v, b_v, u_v, m_v)
    )(eps, R0, t0, board3, uv, mask)                       # (V,2K,9)
    Jp = jax.vmap(
        lambda e_v, R_v, t_v, b_v, u_v, m_v:
            jax.jacfwd(rv, argnums=1)(p9, e_v, R_v, t_v, b_v, u_v, m_v)
    )(eps, R0, t0, board3, uv, mask)                       # (V,2K,6)
    U = jnp.einsum("vki,vkj->ij", Jc, Jc)                  # (9,9)
    Vb = jnp.einsum("vki,vkj->vij", Jp, Jp)                # (V,6,6)
    Wb = jnp.einsum("vki,vkj->vij", Jc, Jp)                # (V,9,6)
    gc = jnp.einsum("vki,vk->i", Jc, r)
    gp = jnp.einsum("vki,vk->vi", Jp, r)
    cost = jnp.sum(r * r)
    return r, cost, U, Vb, Wb, gc, gp


def _lm_step(p9, eps, lam, R0, t0, board3, uv, mask):
    """One Schur-eliminated LM solve; returns (delta_c, delta_p, cost)."""
    _, cost, U, Vb, Wb, gc, gp = _build_normal(
        p9, eps, R0, t0, board3, uv, mask
    )
    dU = jnp.diag(jnp.diag(U))
    dV = Vb * jnp.eye(6)
    Ud = U + lam * dU + 1e-6 * jnp.eye(9)
    Vd = Vb + lam * dV + 1e-6 * jnp.eye(6)
    Vinv = jnp.linalg.inv(Vd)                               # (V,6,6)
    WVinv = jnp.einsum("vij,vjk->vik", Wb, Vinv)            # (V,9,6)
    S = Ud - jnp.einsum("vik,vjk->ij", WVinv, Wb)
    rhs = -(gc - jnp.einsum("vik,vk->i", WVinv, gp))
    dc = jnp.linalg.solve(S, rhs)
    dp = -jnp.einsum("vij,vj->vi", Vinv, gp + jnp.einsum("vji,j->vi", Wb, dc))
    return dc, dp, cost


def _cost_at(p9, eps, R0, t0, board3, uv, mask):
    """(cost, active measurement count) at the given parameters.

    The count guards the LM accept test: a trial step must not "improve"
    the cost by making projection Newton fail on measurements (w -> 0
    removes their residuals), so steps that shrink the active set are
    rejected by the caller rather than compared on cost alone."""
    r, w = jax.vmap(
        lambda e_v, R_v, t_v, b_v, u_v, m_v:
            _residual_view(p9, e_v, R_v, t_v, b_v, u_v, m_v)
    )(eps, R0, t0, board3, uv, mask)
    return jnp.sum(r * r), jnp.sum(w)


def refine_lm_tpu(params9, poses, grids_uv, grids_board, image_size,
                  n_iters: int = 15, verbose: bool = False):
    """Drop-in API match for calib.intrinsic.refine_lm, on device.

    Returns (params9, poses, rms_px)."""
    V = len(poses)
    K = max(len(g) for g in grids_uv)
    board3 = np.zeros((V, K, 3), np.float32)
    uv = np.zeros((V, K, 2), np.float32)
    mask = np.zeros((V, K), bool)
    for i, (g, b) in enumerate(zip(grids_uv, grids_board)):
        n = len(g)
        board3[i, :n, :2] = np.asarray(b)[:, :2]
        uv[i, :n] = np.asarray(g)
        mask[i, :n] = True
    R0 = jnp.asarray(np.stack([p[0] for p in poses]), jnp.float32)
    t0 = jnp.asarray(np.stack([p[1] for p in poses]), jnp.float32)
    board3 = jnp.asarray(board3)
    uv = jnp.asarray(uv)
    mask = jnp.asarray(mask)
    p9 = jnp.asarray(np.asarray(params9), jnp.float32)
    eps = jnp.zeros((V, 6), jnp.float32)

    step = jax.jit(_lm_step)
    cost_f = jax.jit(_cost_at)

    lam = 1e-3
    n_meas = float(2 * mask.sum())
    c0, n0 = cost_f(p9, eps, R0, t0, board3, uv, mask)
    cost, n_active = float(c0), float(n0)
    for it in range(n_iters):
        accepted = False
        for _ in range(6):
            dc, dp, _ = step(p9, eps, jnp.float32(lam),
                             R0, t0, board3, uv, mask)
            p9_n = p9 + dc
            eps_n = eps + dp
            c_t, n_t = cost_f(p9_n, eps_n, R0, t0, board3, uv, mask)
            c_new, n_new = float(c_t), float(n_t)
            # reject steps that drop measurements from the active set —
            # losing residuals is not an improvement (advisor r2 finding)
            if np.isfinite(c_new) and c_new < cost and n_new >= n_active:
                p9, eps, cost, n_active = p9_n, eps_n, c_new, n_new
                lam = max(lam * 0.3, 1e-9)
                accepted = True
                break
            lam *= 10.0
        if verbose:
            print(f"LM iter {it}: rms {np.sqrt(cost / n_meas):.4f} px "
                  f"lam {lam:.1e} accepted={accepted}")
        if not accepted and lam > 1e8:
            break

    eps_h = np.asarray(eps, np.float64)
    out_poses = []
    for i, (R_i, t_i) in enumerate(poses):
        Rw = np.asarray(_rodrigues_j(jnp.asarray(eps_h[i, :3], jnp.float32)),
                        np.float64)
        out_poses.append((Rw @ np.asarray(R_i), np.asarray(t_i) + eps_h[i, 3:]))
    rms = float(np.sqrt(cost / n_meas))
    return np.asarray(p9, np.float64), out_poses, rms
