"""Batched Levenberg-Marquardt bundle adjustment with Schur elimination.

The TPU-native replacement for the reference's ChainBundle — a g2o
BlockSolverX + CHOLMOD sparse LM over pose chains
(src/ChainBundle.cc:976-1451).  Same problem structure, XLA-shaped:

  * pose chain per measurement: world --pose_a--> base --pose_b--> camera
    (covers BundleAdjusterMulti: pose_a = MKF base movable, pose_b =
    cam-from-base fixed; BundleAdjusterSingle: pose_b = identity; and
    BundleAdjusterCalib: pose_b movable shared extrinsics —
    src/BundleAdjuster{Multi,Single,Calib}.cc);
  * analytic Jacobians via SE3 generator fields + Taylor camera sphere
    derivs (ref EdgeChainMeas::linearizeOplus, src/ChainBundle.cc:449-749),
    batched over all measurements at once;
  * adaptive Huber robustification, sigma re-estimated *every iteration*
    from the median chi2 with a 0.5 px floor (ref RobustKernelAdaptive,
    src/ChainBundle.cc:791-901);
  * measurement noise = LevelScale^2 (ref BundleAdjusterMulti.cc:55-203);
  * reduced camera system by Schur complement on the point diagonal: W
    blocks are scatter-added into a dense (P, L, 6, 3) tensor (P = #poses
    is small), the correction W V^-1 W^T is two einsums (MXU work), and
    the ~P*6-dim reduced system is one dense solve — replacing CHOLMOD;
  * LM lambda with accept/reject, convergence on update-RMS < 1e-10 or
    relative residual change < 1e-10, max 100 iterations
    (ref src/ChainBundle.cc:1132-1136,1305-1366).

The whole LM step is one jitted function; the host runs steps in chunks so
incoming keyframes can preempt optimization exactly like the reference's
abort flag (SURVEY §2.11(2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mcptam_tpu.config import BundleConfig, DEFAULT_BUNDLE
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import (
    CameraModel, project, projection_derivs_sphere, cam_sphere_deriv,
)
from mcptam_tpu.core import mest, linalg


@struct.dataclass
class BundleProblem:
    """Static-capacity bundle problem.

    pose_a: (Pa,) outer poses (X-from-world); pose_b: (Pb,) inner poses
    (cam-from-X).  Measurements reference one of each plus a point and a
    camera model index."""

    pose_a: SE3
    pose_b: SE3
    movable_a: jnp.ndarray   # (Pa,) bool
    movable_b: jnp.ndarray   # (Pb,) bool
    points: jnp.ndarray      # (L,3)
    movable_pt: jnp.ndarray  # (L,) bool
    m_pose_a: jnp.ndarray    # (K,) int32
    m_pose_b: jnp.ndarray    # (K,) int32
    m_point: jnp.ndarray     # (K,) int32
    m_cam: jnp.ndarray       # (K,) int32 camera-model index
    m_uv: jnp.ndarray        # (K,2) measured level-0 position
    m_level: jnp.ndarray     # (K,)
    m_valid: jnp.ndarray     # (K,) bool
    # per-point source-KF chain indices (the reference parameterizes each
    # point relative to its patch-source KF, src/BundleAdjusterMulti.cc:
    # 55-203); used for the marginal depth covariance's radial direction.
    # None (synthetic problems) falls back to chain (0, 0).
    pt_src_a: jnp.ndarray = None   # (L,) int32 index into pose_a
    pt_src_b: jnp.ndarray = None   # (L,) int32 index into pose_b
    # set when the problem was compacted to a smaller static capacity
    # (ba/adjusters.compact_problem): maps back into the original arrays
    pt_index: jnp.ndarray = None    # (L,) int32 original point ids
    pt_index_ok: jnp.ndarray = None  # (L,) bool slot occupied
    m_index: jnp.ndarray = None     # (K,) int32 original measurement ids
    m_index_ok: jnp.ndarray = None   # (K,) bool slot occupied
    # grouped observation table (attach_obs_table): per point, the indices
    # of its measurements.  With it, the normal equations assemble as dense
    # einsums (MXU work) instead of scatter-adds — TPU scatters serialize
    # and dominated the LM step before this layout existed.
    obs_idx: jnp.ndarray = None      # (L, D) int32 into the meas arrays
    obs_valid: jnp.ndarray = None    # (L, D) bool
    # valid measurements beyond a point's D slots (excluded from the
    # normal equations; still in the cost) — see attach_obs_table
    obs_dropped: jnp.ndarray = None  # () int32


@struct.dataclass
class LMState:
    pose_a: SE3
    pose_b: SE3
    points: jnp.ndarray
    lam: jnp.ndarray          # LM lambda
    cost: jnp.ndarray         # robustified cost at current estimate
    sigma_sq: jnp.ndarray     # current robust sigma^2 (level-scaled px^2)
    converged: jnp.ndarray    # bool
    accepted: jnp.ndarray     # int32 count
    iterations: jnp.ndarray   # int32 count
    max_update: jnp.ndarray   # last accepted update RMS


def attach_obs_table(prob: BundleProblem, D: int) -> BundleProblem:
    """Group measurements by point into an (L, D) index table.

    D is the static per-point observation capacity; a point with more than
    D valid measurements keeps an arbitrary D of them in the normal
    equations (residuals/cost still see all of them).  The number of
    measurements dropped that way is recorded in ``obs_dropped`` so
    callers can size D from the data instead of losing Hessian edges
    silently.  The table is what lets the LM step assemble V / W / Hpp
    with dense matmuls instead of scatter-adds — the TPU-native
    replacement for CHOLMOD's sparse structure
    (ref src/ChainBundle.cc:1147-1161)."""
    L = prob.points.shape[0]
    K = prob.m_valid.shape[0]
    BIG = jnp.int32(L + 1)
    key = jnp.where(prob.m_valid, prob.m_point, BIG)
    order = jnp.argsort(key, stable=True)                  # valid grouped
    s = key[order]
    first = jnp.searchsorted(s, s, side="left")
    rank = jnp.arange(K, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (s < BIG) & (rank < D)
    slot = jnp.where(ok, s * D + rank, L * D)
    idx = (
        jnp.full(L * D + 1, K, jnp.int32)
        .at[slot].set(order.astype(jnp.int32), mode="drop")[: L * D]
        .reshape(L, D)
    )
    dropped = jnp.sum(((s < BIG) & (rank >= D)).astype(jnp.int32))
    return prob.replace(obs_idx=idx, obs_valid=idx < K, obs_dropped=dropped)


def max_obs_per_point(prob: BundleProblem) -> jnp.ndarray:
    """Largest per-point valid-measurement count — the D that loses no
    Hessian edges (host-fetch this at problem-build time to size the
    table; ADVICE round 2 #2)."""
    L = prob.points.shape[0]
    counts = jnp.zeros(L, jnp.int32).at[prob.m_point].add(
        prob.m_valid.astype(jnp.int32)
    )
    return jnp.max(counts)


def _pad_tail(x):
    """Append one zero row so index K addresses a null measurement."""
    return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)


def _residuals_and_jacobians(prob: BundleProblem, pose_a: SE3, pose_b: SE3,
                             points, cams: CameraModel):
    """Per-measurement residuals (level-scaled) + Jacobians wrt pose_a (6),
    pose_b (6), point (3)."""
    pa = jax.tree_util.tree_map(lambda x: x[prob.m_pose_a], pose_a)
    pb = jax.tree_util.tree_map(lambda x: x[prob.m_pose_b], pose_b)
    pt = points[prob.m_point]
    cam = jax.tree_util.tree_map(lambda x: x[prob.m_cam], cams)

    p_base = pa.apply(pt)
    p_cam = pb.apply(p_base)
    uv_hat, proj_ok = project(cam, p_cam)
    duv2 = projection_derivs_sphere(cam, p_cam)      # (K,2,2)
    d_th, d_ph = cam_sphere_deriv(p_cam)             # (K,3)
    sph = jnp.stack([d_th, d_ph], axis=-2)           # (K,2,3)
    duv = jnp.einsum("kij,kjl->kil", duv2, sph)      # (K,2,3) d uv/d p_cam

    def gens(p):
        K = p.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
        z = jnp.zeros(K)
        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        rot = jnp.stack(
            [
                jnp.stack([z, -pz, py], -1),
                jnp.stack([pz, z, -px], -1),
                jnp.stack([-py, px, z], -1),
            ],
            axis=1,
        )
        return jnp.concatenate([eye, rot], axis=1)   # (K,6,3)

    # d p_cam / d delta_a = R_b @ gen(p_base); / d delta_b = gen(p_cam)
    dcam_a = jnp.einsum("kij,kgj->kgi", pb.R, gens(p_base))
    dcam_b = gens(p_cam)
    Ja = jnp.einsum("kil,kgl->kig", duv, dcam_a)     # (K,2,6)
    Jb = jnp.einsum("kil,kgl->kig", duv, dcam_b)
    Rba = jnp.einsum("kij,kjl->kil", pb.R, pa.R)
    Jl = jnp.einsum("kil,klm->kim", duv, Rba)        # (K,2,3)

    inv_scale = 1.0 / (2.0 ** prob.m_level.astype(jnp.float32))
    e = (prob.m_uv - uv_hat) * inv_scale[:, None]

    ok = prob.m_valid & proj_ok
    ok = ok & jnp.isfinite(e).all(-1) & jnp.isfinite(Ja).all((-2, -1)) \
        & jnp.isfinite(Jb).all((-2, -1)) & jnp.isfinite(Jl).all((-2, -1))
    zero = lambda x, nd: jnp.where(ok.reshape((-1,) + (1,) * nd), x, 0.0)
    e = zero(e, 1)
    Ja = zero(Ja, 2) * prob.movable_a[prob.m_pose_a][:, None, None]
    Jb = zero(Jb, 2) * prob.movable_b[prob.m_pose_b][:, None, None]
    Jl = zero(Jl, 2) * prob.movable_pt[prob.m_point][:, None, None]
    Ja = Ja * inv_scale[:, None, None]
    Jb = Jb * inv_scale[:, None, None]
    Jl = Jl * inv_scale[:, None, None]
    return e, Ja, Jb, Jl, ok


def _robust(e, ok, bcfg: BundleConfig):
    """Adaptive Huber: sigma = max(sqrt(median chi2), min_sigma)
    (ref RobustKernelAdaptive, src/ChainBundle.cc:871-901)."""
    chi2 = jnp.sum(e * e, axis=-1)
    med = mest.masked_median_hist(chi2, ok)
    sigma_sq = jnp.maximum(med, bcfg.min_sigma_px**2)
    w = mest.weight(mest.HUBER, chi2, sigma_sq) * ok
    cost = jnp.sum(mest.objective_score(mest.HUBER, chi2, sigma_sq) * ok)
    return w, cost, sigma_sq


def _normal_system(prob: BundleProblem, e, Ja, Jb, Jl, w):
    """Accumulate the (undamped) normal equations: pose-pose Hessian
    blocks, point diagonal V, pose-point cross blocks W, gradient terms."""
    Pa = prob.movable_a.shape[0]
    Pb = prob.movable_b.shape[0]
    P = Pa + Pb
    L = prob.points.shape[0]

    # stack pose Jacobians into one pose index space
    ga = prob.m_pose_a                                     # (K,)
    gb = Pa + prob.m_pose_b
    gpose = jnp.concatenate([ga, gb])                      # (2K,)
    Jp2 = jnp.concatenate([Ja, Jb], axis=0)                # (2K,2,6)
    e2 = jnp.concatenate([e, e], axis=0)
    w2 = jnp.concatenate([w, w], axis=0)
    pt2 = jnp.concatenate([prob.m_point, prob.m_point])

    # full pose-pose Hessian blocks: diagonal (a,a)/(b,b) AND the (a,b)
    # cross blocks a measurement's two chain poses share
    Hpp = jnp.zeros((P, P, 6, 6))
    Hpp = Hpp.at[gpose, gpose].add(
        jnp.einsum("k,kiv,kiw->kvw", w2, Jp2, Jp2)
    )
    Hab = jnp.einsum("k,kiv,kiw->kvw", w, Ja, Jb)
    Hpp = Hpp.at[ga, gb].add(Hab)
    Hpp = Hpp.at[gb, ga].add(jnp.swapaxes(Hab, -1, -2))
    b_p = jnp.zeros((P, 6)).at[gpose].add(
        jnp.einsum("k,kiv,ki->kv", w2, Jp2, e2)
    )
    # V (L,3,3), b_l (L,3)
    V = jnp.zeros((L, 3, 3)).at[prob.m_point].add(
        jnp.einsum("k,kiv,kiw->kvw", w, Jl, Jl)
    )
    b_l = jnp.zeros((L, 3)).at[prob.m_point].add(
        jnp.einsum("k,kiv,ki->kv", w, Jl, e)
    )
    # W (P,L,6,3)
    W = jnp.zeros((P, L, 6, 3)).at[gpose, pt2].add(
        jnp.einsum("k,kiv,kiw->kvw", w2, Jp2, jnp.concatenate([Jl, Jl], 0))
    )
    return Hpp, b_p, V, b_l, W


def _assemble_grouped(prob: BundleProblem, e, Ja, Jb, Jl, w):
    """Normal equations via the (L, D) observation table — dense einsums,
    zero scatters.  sqrt(w) is folded into a stacked 6P-space pose
    Jacobian F and the point Jacobian, so Hpp = F^T F picks up the
    diagonal AND the pose-a/pose-b cross blocks in one matmul.
    Returns (Hpp_flat (6P,6P), b_p (6P,), V (L,3,3), b_l (L,3),
    Wl (L,6P,3))."""
    Pa = prob.movable_a.shape[0]
    P = Pa + prob.movable_b.shape[0]
    L, D = prob.obs_idx.shape
    idx = prob.obs_idx
    q = jnp.sqrt(jnp.maximum(_pad_tail(w)[idx], 0.0)) * prob.obs_valid
    eq = _pad_tail(e)[idx] * q[..., None]                  # (L,D,2)
    Jlq = _pad_tail(Jl)[idx] * q[..., None, None]          # (L,D,2,3)
    Jaq = _pad_tail(Ja)[idx] * q[..., None, None]          # (L,D,2,6)
    Jbq = _pad_tail(Jb)[idx] * q[..., None, None]
    ga = _pad_tail(prob.m_pose_a)[idx]
    gb = Pa + _pad_tail(prob.m_pose_b)[idx]
    oha = jax.nn.one_hot(ga, P, dtype=Jaq.dtype)           # (L,D,P)
    ohb = jax.nn.one_hot(gb, P, dtype=Jaq.dtype)
    F = (
        jnp.einsum("ldp,ldiv->ldipv", oha, Jaq)
        + jnp.einsum("ldp,ldiv->ldipv", ohb, Jbq)
    ).reshape(L, D, 2, 6 * P)
    Hf = jnp.einsum("ldix,ldiy->xy", F, F)
    b_p = jnp.einsum("ldix,ldi->x", F, eq)
    V = jnp.einsum("ldiv,ldiw->lvw", Jlq, Jlq)
    b_l = jnp.einsum("ldiv,ldi->lv", Jlq, eq)
    Wl = jnp.einsum("ldix,ldiw->lxw", F, Jlq)
    return Hf, b_p, V, b_l, Wl


def _assemble_flat(prob: BundleProblem, e, Ja, Jb, Jl, w):
    """Flat-space normal equations from either layout: the grouped einsum
    path when an observation table is attached, else the scatter path
    (kept for hand-built problems without a table)."""
    if prob.obs_idx is not None:
        return _assemble_grouped(prob, e, Ja, Jb, Jl, w)
    Pa = prob.movable_a.shape[0]
    P = Pa + prob.movable_b.shape[0]
    Hpp, b_p, V, b_l, W = _normal_system(prob, e, Ja, Jb, Jl, w)
    Hf = Hpp.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
    Wl = W.transpose(1, 0, 2, 3).reshape(-1, 6 * P, 3)
    return Hf, b_p.reshape(-1), V, b_l, Wl


def _solve_delta(prob: BundleProblem, e, Ja, Jb, Jl, w, lam):
    """One damped GN solve via Schur complement.  Returns (delta_a (Pa,6),
    delta_b (Pb,6), delta_pt (L,3))."""
    Pa = prob.movable_a.shape[0]
    Pb = prob.movable_b.shape[0]
    P = Pa + Pb
    Hf, b_p, V, b_l, Wl = _assemble_flat(prob, e, Ja, Jb, Jl, w)

    # LM damping on diagonals
    eyeL = jnp.eye(3)
    hd = jnp.diagonal(Hf)
    Hf = Hf + jnp.diag(lam * hd + 1e-8)
    Vd = V + lam * (V * eyeL) + 1e-8 * eyeL

    Vinv = linalg.inv3(Vd) * prob.movable_pt[:, None, None]

    # Schur: S = Hpp - W Vinv W^T ; b_s = b_p - W Vinv b_l
    T = jnp.einsum("lxw,lwy->lxy", Wl, Vinv)               # (L,6P,3)
    S = Hf - jnp.einsum("lxy,lzy->xz", T, Wl)
    b_s = b_p - jnp.einsum("lxy,ly->x", T, b_l)

    # mask fixed poses
    movable = jnp.concatenate([prob.movable_a, prob.movable_b])
    mvec = jnp.repeat(movable, 6).astype(jnp.float32)       # (6P,)
    Sf = S * mvec[:, None] * mvec[None, :] + jnp.diag(1.0 - mvec)
    bf = b_s * mvec
    delta_f = jnp.linalg.solve(Sf, bf) * mvec
    delta_p = delta_f.reshape(P, 6) * movable[:, None]

    # back-substitute points
    rhs = b_l - jnp.einsum("lxw,x->lw", Wl, delta_f)
    delta_l = jnp.einsum("lxy,ly->lx", Vinv, rhs)
    return delta_p[:Pa], delta_p[Pa:], delta_l


# ---------------------------------------------------------------------------
# SoA fast path
# ---------------------------------------------------------------------------
#
# TPU arrays tile their two minor dims to (8, 128), so the AoS
# per-measurement tensors above ((K,2,6) Jacobians, (K,2,2) derivs, the
# (L,D,2,6P) stacked pose Jacobian) each waste 1-2 orders of magnitude of
# memory bandwidth, and XLA's fusion choices on that layout produced
# multi-second LM iterations on a v5e.  The functions below keep every
# per-measurement quantity as a flat (N,) array (python lists standing in
# for the small fixed dims), assemble the normal equations with a handful
# of (rows, N) x (N, P) matmuls + per-point reshape-reductions, and solve
# the reduced pose system with the single-kernel Pallas Cholesky
# (core/spd.py).  Same math as the reference ChainBundle
# (src/ChainBundle.cc:449-1161) and exactly the scatter path above —
# equivalence-tested in tests/test_bundle.py.

def _soa_prep(prob: BundleProblem):
    """Per-problem constants of the SoA step (computed once per jitted
    lm_run, reused across scan iterations)."""
    L, D = prob.obs_idx.shape
    idx = prob.obs_idx.reshape(-1)                        # (N,)
    ia = _pad_tail(prob.m_pose_a)[idx]
    ib = _pad_tail(prob.m_pose_b)[idx]
    icam = _pad_tail(prob.m_cam)[idx]
    Pa = prob.movable_a.shape[0]
    Pb = prob.movable_b.shape[0]
    oha = jax.nn.one_hot(ia.reshape(L, D), Pa, dtype=jnp.float32)
    ohb = jax.nn.one_hot(ib.reshape(L, D), Pb, dtype=jnp.float32)
    return {"idx": idx, "ia": ia, "ib": ib, "icam": icam,
            "oha": oha, "ohb": ohb}


def _resid_chi2_soa(prob: BundleProblem, pose_a: SE3, pose_b: SE3,
                    points, cams: CameraModel):
    """Residual-only pass over ALL K measurements, SoA.  Returns
    (chi2 (K,), ok (K,)) with chi2 zeroed where ~ok."""
    from mcptam_tpu.core.camera import camera_soa, project_chain_soa
    ia, ib, ipt, icam = prob.m_pose_a, prob.m_pose_b, prob.m_point, prob.m_cam
    Ra = [[pose_a.R[:, i, j][ia] for j in range(3)] for i in range(3)]
    ta = [pose_a.t[:, i][ia] for i in range(3)]
    Rb = [[pose_b.R[:, i, j][ib] for j in range(3)] for i in range(3)]
    tb = [pose_b.t[:, i][ib] for i in range(3)]
    pt = [points[:, i][ipt] for i in range(3)]
    pb_ = [ta[i] + Ra[i][0] * pt[0] + Ra[i][1] * pt[1] + Ra[i][2] * pt[2]
           for i in range(3)]
    pc_ = [tb[i] + Rb[i][0] * pb_[0] + Rb[i][1] * pb_[1] + Rb[i][2] * pb_[2]
           for i in range(3)]
    camf = camera_soa(cams, icam)
    ch = project_chain_soa(camf, pc_[0], pc_[1], pc_[2], with_derivs=False)
    inv_scale = 1.0 / (2.0 ** prob.m_level.astype(jnp.float32))
    e0 = (prob.m_uv[:, 0] - ch["u"]) * inv_scale
    e1 = (prob.m_uv[:, 1] - ch["v"]) * inv_scale
    ok = prob.m_valid & ch["ok"] & jnp.isfinite(e0) & jnp.isfinite(e1)
    chi2 = jnp.where(ok, e0 * e0 + e1 * e1, 0.0)
    return chi2, ok


def _resid_jac_soa(prob: BundleProblem, pose_a: SE3, pose_b: SE3,
                   points, cams: CameraModel, pr: dict,
                   with_b: bool = True):
    """Residuals + analytic Jacobians at the obs-table entries, SoA.

    Returns (e [2 x (N,)], Ja [2][6], Jb [2][6], Jl [2][3], ok (N,)) with
    every component zeroed where ~ok, level-scaled, and the movable masks
    folded in — the SoA twin of _residuals_and_jacobians
    (ref EdgeChainMeas::linearizeOplus, src/ChainBundle.cc:449-749).
    with_b=False (every pose_b fixed, the BundleAdjusterMulti case) skips
    the pose-b Jacobian chains entirely and returns Jb=None."""
    from mcptam_tpu.core.camera import camera_soa, project_chain_soa
    idx, ia, ib, icam = pr["idx"], pr["ia"], pr["ib"], pr["icam"]
    L, D = prob.obs_idx.shape
    ipt = jnp.repeat(jnp.arange(L, dtype=jnp.int32), D)

    Ra = [[pose_a.R[:, i, j][ia] for j in range(3)] for i in range(3)]
    ta = [pose_a.t[:, i][ia] for i in range(3)]
    Rb = [[pose_b.R[:, i, j][ib] for j in range(3)] for i in range(3)]
    tb = [pose_b.t[:, i][ib] for i in range(3)]
    pt = [points[:, i][ipt] for i in range(3)]
    pb_ = [ta[i] + Ra[i][0] * pt[0] + Ra[i][1] * pt[1] + Ra[i][2] * pt[2]
           for i in range(3)]
    pc_ = [tb[i] + Rb[i][0] * pb_[0] + Rb[i][1] * pb_[1] + Rb[i][2] * pb_[2]
           for i in range(3)]

    camf = camera_soa(cams, icam)
    ch = project_chain_soa(camf, pc_[0], pc_[1], pc_[2], with_derivs=True)
    duv = ch["duv"]                                        # [2][3] (N,)

    zero = jnp.zeros_like(pc_[0])

    def skew_rows(p):
        # generator rows for the 3 rotation tangents: d p / d w_r
        return [[zero, -p[2], p[1]], [p[2], zero, -p[0]], [-p[1], p[0], zero]]

    rot_a = skew_rows(pb_)
    # d p_cam / d delta_a: translation g -> column g of Rb; rotation r ->
    # Rb @ rot_a[r]
    dcam_a = [[Rb[i][g] for i in range(3)] for g in range(3)] + [
        [Rb[i][0] * rot_a[r][0] + Rb[i][1] * rot_a[r][1]
         + Rb[i][2] * rot_a[r][2] for i in range(3)]
        for r in range(3)
    ]
    Rba = [[Rb[i][0] * Ra[0][m] + Rb[i][1] * Ra[1][m] + Rb[i][2] * Ra[2][m]
            for m in range(3)] for i in range(3)]

    Ja = [[duv[i][0] * dcam_a[g][0] + duv[i][1] * dcam_a[g][1]
           + duv[i][2] * dcam_a[g][2] for g in range(6)] for i in range(2)]
    Jl = [[duv[i][0] * Rba[0][m] + duv[i][1] * Rba[1][m]
           + duv[i][2] * Rba[2][m] for m in range(3)] for i in range(2)]
    if with_b:
        rot_b = skew_rows(pc_)
        eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        dcam_b = [[jnp.full_like(zero, eye[g][i]) for i in range(3)]
                  for g in range(3)] + [
            [rot_b[r][i] for i in range(3)] for r in range(3)
        ]
        Jb = [[duv[i][0] * dcam_b[g][0] + duv[i][1] * dcam_b[g][1]
               + duv[i][2] * dcam_b[g][2] for g in range(6)]
              for i in range(2)]
    else:
        Jb = None

    lvl = _pad_tail(prob.m_level)[idx].astype(jnp.float32)
    inv_scale = 1.0 / (2.0 ** lvl)
    uv0 = _pad_tail(prob.m_uv[:, 0])[idx]
    uv1 = _pad_tail(prob.m_uv[:, 1])[idx]
    e = [(uv0 - ch["u"]) * inv_scale, (uv1 - ch["v"]) * inv_scale]

    ok = _pad_tail(prob.m_valid)[idx] & ch["ok"]
    for i in range(2):
        ok = ok & jnp.isfinite(e[i])
        for g in range(6):
            ok = ok & jnp.isfinite(Ja[i][g])
            if with_b:
                ok = ok & jnp.isfinite(Jb[i][g])
        for m in range(3):
            ok = ok & jnp.isfinite(Jl[i][m])

    mva = prob.movable_a.astype(jnp.float32)[ia] * inv_scale
    mvl = prob.movable_pt.astype(jnp.float32)[ipt] * inv_scale
    z = lambda x: jnp.where(ok, x, 0.0)
    e = [z(x) for x in e]
    Ja = [[z(Ja[i][g]) * mva for g in range(6)] for i in range(2)]
    if with_b:
        mvb = prob.movable_b.astype(jnp.float32)[ib] * inv_scale
        Jb = [[z(Jb[i][g]) * mvb for g in range(6)] for i in range(2)]
    Jl = [[z(Jl[i][m]) * mvl for m in range(3)] for i in range(2)]
    return e, Ja, Jb, Jl, ok


def _inv3_soa(v00, v01, v02, v11, v12, v22):
    """Closed-form symmetric 3x3 inverse on component arrays."""
    c00 = v11 * v22 - v12 * v12
    c01 = v02 * v12 - v01 * v22
    c02 = v01 * v12 - v02 * v11
    c11 = v00 * v22 - v02 * v02
    c12 = v01 * v02 - v00 * v12
    c22 = v00 * v11 - v01 * v01
    det = v00 * c00 + v01 * c01 + v02 * c02
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    return (c00 * inv_det, c01 * inv_det, c02 * inv_det,
            c11 * inv_det, c12 * inv_det, c22 * inv_det)


_HP = jax.lax.Precision.HIGHEST


def _solve_delta_soa(prob: BundleProblem, pr: dict, pose_a: SE3,
                     pose_b: SE3, points, cams: CameraModel, w, lam,
                     fixed_b: bool = False):
    """One damped GN solve via Schur complement, SoA layout throughout.
    Matches _solve_delta numerically (same damping, pinning, solve).

    fixed_b=True declares every pose_b statically fixed (the live
    BundleAdjusterMulti case: camera-from-base extrinsics never move,
    src/BundleAdjusterMulti.cc:55-203) — the entire pose-b machinery
    (Jb chains, 36*Pb masked Hab rows, Mb, Xb/Wb3) drops out of the
    graph and the reduced system shrinks from 6(Pa+Pb) to 6Pa, which
    also shortens the sequential Cholesky.  Only the caller can know
    this statically (movable_b is a traced array): passing fixed_b=True
    when movable_b contains True silently freezes those poses."""
    from mcptam_tpu.core.spd import spd_solve
    L, D = prob.obs_idx.shape
    Pa = prob.movable_a.shape[0]
    Pb = prob.movable_b.shape[0]
    P = Pa + Pb

    e, Ja, Jb, Jl, okN = _resid_jac_soa(prob, pose_a, pose_b, points,
                                        cams, pr, with_b=not fixed_b)
    q = jnp.sqrt(jnp.maximum(_pad_tail(w)[pr["idx"]], 0.0)) * okN
    A = [[q * Ja[i][g] for g in range(6)] for i in range(2)]
    B = None if fixed_b else [[q * Jb[i][g] for g in range(6)]
                              for i in range(2)]
    Pt = [[q * Jl[i][m] for m in range(3)] for i in range(2)]
    eq = [q * e[0], q * e[1]]
    # materialize the weighted rows once; everything below reads them
    A, B, Pt, eq = jax.lax.optimization_barrier((A, B, Pt, eq))

    pairs = [(v, wc) for v in range(6) for wc in range(v, 6)]     # 21
    gram = lambda X, v, wc: X[0][v] * X[0][wc] + X[1][v] * X[1][wc]
    rows_a = [gram(A, v, wc) for v, wc in pairs]
    rows_a += [A[0][v] * eq[0] + A[1][v] * eq[1] for v in range(6)]
    if not fixed_b:
        hab = [[gram2 for gram2 in
                (A[0][v] * B[0][wc] + A[1][v] * B[1][wc]
                 for wc in range(6))]
               for v in range(6)]
        ibf = pr["ib"]
        for c in range(Pb):
            mask_c = (ibf == c).astype(jnp.float32)
            rows_a += [hab[v][wc] * mask_c
                       for v in range(6) for wc in range(6)]
    Ma = jax.lax.dot_general(
        jnp.stack(rows_a, 0), pr["oha"].reshape(-1, Pa),
        (((1,), (0,)), ((), ())), precision=_HP,
    )
    if not fixed_b:
        rows_b = [gram(B, v, wc) for v, wc in pairs]
        rows_b += [B[0][v] * eq[0] + B[1][v] * eq[1] for v in range(6)]
        Mb = jax.lax.dot_general(
            jnp.stack(rows_b, 0), pr["ohb"].reshape(-1, Pb),
            (((1,), (0,)), ((), ())), precision=_HP,
        )

    def sym_blocks(rows21, Pn):
        Hb = jnp.zeros((6, 6, Pn))
        for k, (v, wc) in enumerate(pairs):
            Hb = Hb.at[v, wc].set(rows21[k])
            if v != wc:
                Hb = Hb.at[wc, v].set(rows21[k])
        return Hb.transpose(2, 0, 1)                               # (Pn,6,6)

    Haa = sym_blocks(Ma[:21], Pa)
    b_pa = Ma[21:27].T                                             # (Pa,6)
    ja = jnp.arange(Pa)
    TL = jnp.zeros((Pa, 6, Pa, 6)).at[ja, :, ja, :].set(Haa)
    if fixed_b:
        PS = Pa          # poses in the reduced system
        Hf = TL.reshape(6 * Pa, 6 * Pa)
        b_p = b_pa.reshape(-1)
        movable = prob.movable_a
    else:
        PS = P
        Hbb = sym_blocks(Mb[:21], Pb)
        b_pb = Mb[21:27].T
        Hab = Ma[27:].reshape(Pb, 6, 6, Pa).transpose(3, 1, 0, 2)  # (Pa,6,Pb,6)
        jb = jnp.arange(Pb)
        BR = jnp.zeros((Pb, 6, Pb, 6)).at[jb, :, jb, :].set(Hbb)
        top = jnp.concatenate([TL, Hab], axis=2)
        bot = jnp.concatenate([Hab.transpose(2, 3, 0, 1), BR], axis=2)
        Hf = jnp.concatenate([top, bot], axis=0).reshape(6 * P, 6 * P)
        b_p = jnp.concatenate([b_pa, b_pb], axis=0).reshape(-1)
        movable = jnp.concatenate([prob.movable_a, prob.movable_b])

    # point side
    dsum = lambda x: x.reshape(L, D).sum(axis=1)
    V6 = [dsum(gram(Pt, v, wc)) for v, wc in
          [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]]
    b_l = [dsum(Pt[0][m] * eq[0] + Pt[1][m] * eq[1]) for m in range(3)]
    scale = 1.0 + lam
    mvp = prob.movable_pt.astype(jnp.float32)
    Vi = _inv3_soa(V6[0] * scale + 1e-8, V6[1], V6[2],
                   V6[3] * scale + 1e-8, V6[4],
                   V6[5] * scale + 1e-8)
    Vinv = [[Vi[0] * mvp, Vi[1] * mvp, Vi[2] * mvp],
            [Vi[1] * mvp, Vi[3] * mvp, Vi[4] * mvp],
            [Vi[2] * mvp, Vi[4] * mvp, Vi[5] * mvp]]

    # cross blocks W: per-obs 6x3 products -> (L, D, 18) -> one batched
    # matmul against the one-hot pose table
    Xa = jnp.stack(
        [A[0][v] * Pt[0][m] + A[1][v] * Pt[1][m]
         for v in range(6) for m in range(3)], axis=-1,
    ).reshape(L, D, 18)
    Wa3 = jax.lax.dot_general(pr["oha"], Xa, (((1,), (1,)), ((0,), (0,))),
                              precision=_HP)                # (L, Pa, 18)
    if fixed_b:
        Wcat = Wa3
    else:
        Xb = jnp.stack(
            [B[0][v] * Pt[0][m] + B[1][v] * Pt[1][m]
             for v in range(6) for m in range(3)], axis=-1,
        ).reshape(L, D, 18)
        Wb3 = jax.lax.dot_general(pr["ohb"], Xb,
                                  (((1,), (1,)), ((0,), (0,))),
                                  precision=_HP)
        Wcat = jnp.concatenate([Wa3, Wb3], axis=1)          # (L, P, 18)
    W = [Wcat[:, :, m::3].reshape(L, 6 * PS) for m in range(3)]
    W = jax.lax.optimization_barrier(W)

    T = [Vinv[0][y][:, None] * W[0] + Vinv[1][y][:, None] * W[1]
         + Vinv[2][y][:, None] * W[2] for y in range(3)]    # 3 x (L, 6PS)

    mm = lambda X, Y: jax.lax.dot_general(
        X, Y, (((0,), (0,)), ((), ())), precision=_HP)      # X^T @ Y
    S_corr = mm(T[0], W[0]) + mm(T[1], W[1]) + mm(T[2], W[2])
    b_s = b_p - (T[0].T @ b_l[0] + T[1].T @ b_l[1] + T[2].T @ b_l[2])

    hd = jnp.diagonal(Hf)
    S = Hf + jnp.diag(lam * hd + 1e-8) - S_corr

    mvec = jnp.repeat(movable, 6).astype(jnp.float32)
    Sf = S * mvec[:, None] * mvec[None, :] + jnp.diag(1.0 - mvec)
    delta_f = spd_solve(Sf, b_s * mvec) * mvec
    delta_p = delta_f.reshape(PS, 6) * movable[:, None]

    r = [b_l[m] - W[m] @ delta_f for m in range(3)]
    dl = jnp.stack(
        [Vinv[y][0] * r[0] + Vinv[y][1] * r[1] + Vinv[y][2] * r[2]
         for y in range(3)], axis=-1,
    )
    if fixed_b:
        return delta_p, jnp.zeros((Pb, 6), delta_p.dtype), dl
    return delta_p[:Pa], delta_p[Pa:], dl


def _lm_step_soa_carried(prob: BundleProblem, st: LMState, chi2, ok,
                         cams: CameraModel, bcfg: BundleConfig, pr: dict,
                         fixed_b: bool = False):
    """One LM iteration, SoA fast path, with the CURRENT-estimate chi2
    carried in (and out) so a scanned lm_run evaluates residuals over the
    full measurement set once per iteration (the trial pass) instead of
    twice.  Returns (st', chi2', ok') where chi2'/ok' are at st'.params."""
    med = mest.masked_median_hist(chi2, ok)
    sigma_sq = jnp.maximum(med, bcfg.min_sigma_px**2)
    w = mest.weight(mest.HUBER, chi2, sigma_sq) * ok
    cost0 = jnp.sum(mest.objective_score(mest.HUBER, chi2, sigma_sq) * ok)

    da, db, dl = _solve_delta_soa(
        prob, pr, st.pose_a, st.pose_b, st.points, cams, w, st.lam,
        fixed_b=fixed_b,
    )

    new_pose_a = SE3.exp(da) @ st.pose_a
    new_pose_b = st.pose_b if fixed_b else SE3.exp(db) @ st.pose_b
    new_points = st.points + dl

    chi2_1, ok1 = _resid_chi2_soa(prob, new_pose_a, new_pose_b,
                                  new_points, cams)
    cost1 = jnp.sum(mest.objective_score(mest.HUBER, chi2_1, sigma_sq) * ok1)

    # a trial whose valid-measurement count collapses scores a spuriously
    # low cost (invalid residuals are masked out of the sum) — a NaN/inf
    # step from a near-singular solve would otherwise be "accepted" at
    # cost 0.  Guard like g2o's chi2 validity: the step must keep at
    # least half the currently valid measurements valid.
    n_ok0 = jnp.sum(ok)
    keeps_valid = jnp.sum(ok1) * 2 >= n_ok0
    accept = (cost1 < cost0) & keeps_valid
    n_upd = jnp.sum(da * da) + jnp.sum(db * db) + jnp.sum(dl * dl)
    n_params = (
        6.0 * (jnp.sum(prob.movable_a) + jnp.sum(prob.movable_b))
        + 3.0 * jnp.sum(prob.movable_pt)
    )
    upd_rms = jnp.sqrt(n_upd / jnp.maximum(n_params, 1.0))
    rel_delta = jnp.abs(cost0 - cost1) / jnp.maximum(cost0, 1e-20)
    converged = (
        (upd_rms < bcfg.update_rms_conv) | (rel_delta < bcfg.residual_delta_conv)
    )

    act = accept & ~st.converged
    sel = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(act, x, y), a, b
    )
    st_new = st.replace(
        pose_a=sel(new_pose_a, st.pose_a),
        pose_b=sel(new_pose_b, st.pose_b),
        points=jnp.where(act, new_points, st.points),
        lam=jnp.clip(
            jnp.where(
                st.converged, st.lam,
                jnp.where(accept, st.lam * bcfg.lambda_down, st.lam * bcfg.lambda_up),
            ),
            1e-10, 1e8,
        ),
        cost=jnp.where(act, cost1, cost0),
        sigma_sq=sigma_sq,
        converged=st.converged | converged,
        accepted=st.accepted + act.astype(jnp.int32),
        iterations=st.iterations + (~st.converged).astype(jnp.int32),
        max_update=jnp.where(act, upd_rms, st.max_update),
    )
    chi2_new = jnp.where(act, chi2_1, chi2)
    ok_new = jnp.where(act, ok1, ok)
    return st_new, chi2_new, ok_new


def _lm_step_soa(prob: BundleProblem, st: LMState, cams: CameraModel,
                 bcfg: BundleConfig, pr: dict, fixed_b: bool = False):
    """One LM iteration, SoA fast path (obs table attached)."""
    chi2, ok = _resid_chi2_soa(prob, st.pose_a, st.pose_b, st.points, cams)
    st_new, _, _ = _lm_step_soa_carried(prob, st, chi2, ok, cams, bcfg, pr,
                                        fixed_b=fixed_b)
    return st_new


def lm_step(prob: BundleProblem, st: LMState, cams: CameraModel,
            bcfg: BundleConfig = DEFAULT_BUNDLE, fixed_b: bool = False):
    """One LM iteration with accept/reject.  Frozen once converged."""
    if prob.obs_idx is not None:
        return _lm_step_soa(prob, st, cams, bcfg, _soa_prep(prob),
                            fixed_b=fixed_b)
    e, Ja, Jb, Jl, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    w, cost0, sigma_sq = _robust(e, ok, bcfg)
    da, db, dl = _solve_delta(prob, e, Ja, Jb, Jl, w, st.lam)

    new_pose_a = SE3.exp(da) @ st.pose_a
    new_pose_b = SE3.exp(db) @ st.pose_b
    new_points = st.points + dl

    e1, _, _, _, ok1 = _residuals_and_jacobians(
        prob, new_pose_a, new_pose_b, new_points, cams
    )
    # evaluate new cost under the SAME sigma for a fair comparison
    chi2_1 = jnp.sum(e1 * e1, axis=-1)
    cost1 = jnp.sum(mest.objective_score(mest.HUBER, chi2_1, sigma_sq) * ok1)

    # reject trials that invalidate the measurement set (masked residuals
    # make a NaN step score ~0 cost; see _lm_step_soa_carried)
    accept = (cost1 < cost0) & (jnp.sum(ok1) * 2 >= jnp.sum(ok))
    n_upd = (
        jnp.sum(da * da) + jnp.sum(db * db) + jnp.sum(dl * dl)
    )
    n_params = (
        6.0 * (jnp.sum(prob.movable_a) + jnp.sum(prob.movable_b))
        + 3.0 * jnp.sum(prob.movable_pt)
    )
    upd_rms = jnp.sqrt(n_upd / jnp.maximum(n_params, 1.0))
    rel_delta = jnp.abs(cost0 - cost1) / jnp.maximum(cost0, 1e-20)
    # converged when the (attempted) update or the residual change is below
    # threshold — whether or not the step was accepted; a stalled reject
    # loop at machine precision must latch too
    converged = (
        (upd_rms < bcfg.update_rms_conv) | (rel_delta < bcfg.residual_delta_conv)
    )

    act = accept & ~st.converged
    sel = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(act, x, y), a, b
    )
    return st.replace(
        pose_a=sel(new_pose_a, st.pose_a),
        pose_b=sel(new_pose_b, st.pose_b),
        points=jnp.where(act, new_points, st.points),
        lam=jnp.clip(
            jnp.where(
                st.converged, st.lam,
                jnp.where(accept, st.lam * bcfg.lambda_down, st.lam * bcfg.lambda_up),
            ),
            1e-10, 1e8,
        ),
        cost=jnp.where(act, cost1, cost0),
        sigma_sq=sigma_sq,
        converged=st.converged | converged,
        accepted=st.accepted + act.astype(jnp.int32),
        iterations=st.iterations + (~st.converged).astype(jnp.int32),
        max_update=jnp.where(act, upd_rms, st.max_update),
    )


def create_lm_state(prob: BundleProblem,
                    bcfg: BundleConfig = DEFAULT_BUNDLE) -> LMState:
    # NOTE: scalars must be STRONG-typed (explicit dtype).  Weak-typed
    # scalars (jnp.asarray of a python float) give the fresh state a
    # different abstract signature than the state lm_step returns, so a
    # jitted lm_run recompiles on its second call — the round-2 benchmark
    # measured XLA compile time (2 LM iters/s) instead of LM speed.  The
    # dtype follows the problem data so the f64 oracle path stays f64.
    dt = prob.points.dtype
    return LMState(
        pose_a=prob.pose_a,
        pose_b=prob.pose_b,
        points=prob.points,
        lam=jnp.asarray(bcfg.lambda_init, dtype=dt),
        cost=jnp.asarray(jnp.inf, dtype=dt),
        sigma_sq=jnp.asarray(1.0, dtype=dt),
        converged=jnp.zeros((), bool),
        accepted=jnp.zeros((), jnp.int32),
        iterations=jnp.zeros((), jnp.int32),
        max_update=jnp.asarray(jnp.inf, dtype=dt),
    )


def lm_run(prob: BundleProblem, st: LMState, cams: CameraModel,
           n_steps: int, bcfg: BundleConfig = DEFAULT_BUNDLE,
           fixed_b: bool = False) -> LMState:
    """Run up to n_steps LM iterations (jit this; host chunks calls so
    map-maker preemption can abort between chunks like the reference's
    setForceStopFlag polling, src/ChainBundle.cc:1309).

    SoA path: the current-estimate chi2 is computed once and carried
    through the scan, so each iteration pays one full-K residual pass
    (the trial), not two.  fixed_b=True (static promise that every
    pose_b is fixed — the live map-maker BA) elides the pose-b system:
    see _solve_delta_soa."""
    if prob.obs_idx is not None:
        pr = _soa_prep(prob)
        chi2, ok = _resid_chi2_soa(prob, st.pose_a, st.pose_b,
                                   st.points, cams)

        def body(carry, _):
            s, c2, okc = carry
            s, c2, okc = _lm_step_soa_carried(prob, s, c2, okc, cams,
                                              bcfg, pr, fixed_b=fixed_b)
            return (s, c2, okc), None

        (st, _, _), _ = jax.lax.scan(
            body, (st, chi2, ok), None, length=n_steps
        )
        return st

    def body(s, _):
        return lm_step(prob, s, cams, bcfg), None

    st, _ = jax.lax.scan(body, st, None, length=n_steps)
    return st


def tukey_outlier_pass(prob: BundleProblem, st: LMState, cams: CameraModel):
    """Post-optimization Tukey scan flagging outlier measurements
    (ref ChainBundle::Compute post-run, src/ChainBundle.cc:1368-1410).
    Returns (K,) bool outlier mask."""
    e, _, _, _, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    chi2 = jnp.sum(e * e, axis=-1)
    sigma_sq = jnp.maximum(
        mest.find_sigma_squared(chi2, ok), DEFAULT_BUNDLE.min_sigma_px**2
    )
    w = mest.weight(mest.TUKEY, chi2, sigma_sq)
    return ok & (w <= 0.0)


def point_depth_covariance(prob: BundleProblem, st: LMState,
                           cams: CameraModel):
    """Exact marginal inverse-depth variance per point, poses free.

    The reference computes the true marginal point covariance via CHOLMOD
    computeMarginals and reports the median (2,2) entry
    (src/ChainBundle.cc:1414-1448).  Its points are parameterized as
    (bearing beta, bearing alpha, inverse depth rho) in a frame rotated so
    the point lies on the source camera's +z (VertexRelPoint,
    src/ChainBundle.cc:222-349), so entry (2,2) is the VARIANCE OF THE
    INVERSE DEPTH about the point's actual source-KF camera.  In world-XYZ
    parameterization that is rho^4 * r^T Sigma_xyz r, with r the unit
    radial from the source camera center to the point and Sigma_xyz the
    marginal obtained by the Schur identity

        Sigma_pt = V^-1 + V^-1 W^T S^-1 W V^-1

    (S the reduced pose system, so pose uncertainty is propagated into the
    points — NOT the poses-held-fixed proxy V^-1 alone).  Returns
    (median scalar, per-point cov (L,))."""
    e, Ja, Jb, Jl, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    w, _, _ = _robust(e, ok, DEFAULT_BUNDLE)
    L = prob.points.shape[0]
    Hf, _, V, _, Wl = _assemble_flat(prob, e, Ja, Jb, Jl, w)

    Vinv = linalg.inv3(V + 1e-9 * jnp.eye(3)) * prob.movable_pt[:, None, None]
    # reduced pose system S = Hpp - W Vinv W^T, fixed poses pinned to I
    T = jnp.einsum("lxw,lwy->lxy", Wl, Vinv)               # (L,6P,3)
    S = Hf - jnp.einsum("lxy,lzy->xz", T, Wl)
    movable = jnp.concatenate([prob.movable_a, prob.movable_b])
    mvec = jnp.repeat(movable, 6).astype(jnp.float32)
    Sf = S * mvec[:, None] * mvec[None, :] + jnp.diag(1.0 - mvec)
    Sinv = jnp.linalg.inv(Sf) * mvec[:, None] * mvec[None, :]
    corr = jnp.einsum("lxv,xy,lyw->lvw", T, Sinv, T)       # (L,3,3)
    Sigma = Vinv + corr

    # radial direction + inverse depth about each point's ACTUAL source KF
    ia = (
        jnp.zeros(L, jnp.int32) if prob.pt_src_a is None else prob.pt_src_a
    )
    ib = (
        jnp.zeros(L, jnp.int32) if prob.pt_src_b is None else prob.pt_src_b
    )
    src_a = jax.tree_util.tree_map(lambda x: x[ia], st.pose_a)
    src_b = jax.tree_util.tree_map(lambda x: x[ib], st.pose_b)
    cam_from_world = src_b @ src_a                          # (L,) SE3
    center_w = cam_from_world.inv().t                       # (L,3)
    d = st.points - center_w
    dist = jnp.linalg.norm(d, axis=-1)
    r = d / jnp.maximum(dist, 1e-9)[:, None]
    cov = jnp.einsum("li,lij,lj->l", r, Sigma, r) / jnp.maximum(
        dist, 1e-9
    ) ** 4
    has_obs = jnp.zeros(L, bool).at[prob.m_point].max(ok) & prob.movable_pt
    med = mest.masked_median_hist(cov, has_obs)
    return med, cov
