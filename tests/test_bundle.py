"""Bundle adjustment tests on synthetic problems with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import project
from mcptam_tpu.io.synthetic import make_rig
from mcptam_tpu.ba.bundle import (
    BundleProblem, create_lm_state, lm_run, lm_step, tukey_outlier_pass,
    point_depth_covariance, _residuals_and_jacobians,
)
from mcptam_tpu.config import BundleConfig

H, W = 240, 320


def build_problem(rng, n_poses=4, n_points=120, n_cams=2, noise_px=0.0,
                  perturb=0.02, movable_b=False, outlier_frac=0.0):
    """Ground-truth multi-camera bundle problem: points on a shell around
    the rig, every point measured in every (pose, cam)."""
    cams, cam_from_base = make_rig(n_cams, H, W, spread_deg=25.0)

    # ground-truth MKF poses: small motions
    gt_tangents = rng.normal(size=(n_poses, 6)) * np.array(
        [0.1, 0.1, 0.1, 0.03, 0.03, 0.03]
    )
    gt_tangents[0] = 0
    pose_a_gt = SE3.exp(jnp.asarray(gt_tangents, jnp.float32))

    # points in front of the rig at 3-8m
    dirs = rng.normal(size=(n_points, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.8
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    depth = rng.uniform(3.0, 8.0, (n_points, 1))
    pts_gt = jnp.asarray(dirs * depth, jnp.float32)

    # measurements
    m_pose_a, m_pose_b, m_point, m_cam, m_uv, m_level, m_valid = [], [], [], [], [], [], []
    for p in range(n_poses):
        for c in range(n_cams):
            pose = cam_from_base[c] @ pose_a_gt[p]
            uv, ok = project(cams[c], pose.apply(pts_gt))
            uv = np.asarray(uv)
            ok = np.asarray(ok)
            if noise_px > 0:
                uv = uv + rng.normal(size=uv.shape) * noise_px
            m_pose_a.append(np.full(n_points, p))
            m_pose_b.append(np.full(n_points, c))
            m_point.append(np.arange(n_points))
            m_cam.append(np.full(n_points, c))
            m_uv.append(uv)
            m_level.append(np.zeros(n_points))
            m_valid.append(ok)
    K = n_poses * n_cams * n_points
    m_uv = np.concatenate(m_uv).astype(np.float32)
    m_valid = np.concatenate(m_valid)
    out_mask = np.zeros(K, bool)
    if outlier_frac > 0:
        n_out = int(K * outlier_frac)
        idx = rng.choice(K, n_out, replace=False)
        m_uv[idx] += rng.uniform(10, 30, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        out_mask[idx] = True

    # perturb initial estimate
    pert = rng.normal(size=(n_poses, 6)) * perturb
    pert[0] = 0
    pose_a_init = SE3.exp(jnp.asarray(pert, jnp.float32)) @ pose_a_gt
    pts_init = pts_gt + jnp.asarray(rng.normal(size=(n_points, 3)) * perturb * 2, jnp.float32)

    movable_a = jnp.asarray([False] + [True] * (n_poses - 1))
    prob = BundleProblem(
        pose_a=pose_a_init,
        pose_b=cam_from_base,
        movable_a=movable_a,
        movable_b=jnp.asarray([False] * n_cams) if not movable_b
        else jnp.asarray([False] + [True] * (n_cams - 1)),
        points=pts_init,
        movable_pt=jnp.ones(n_points, bool),
        m_pose_a=jnp.asarray(np.concatenate(m_pose_a), jnp.int32),
        m_pose_b=jnp.asarray(np.concatenate(m_pose_b), jnp.int32),
        m_point=jnp.asarray(np.concatenate(m_point), jnp.int32),
        m_cam=jnp.asarray(np.concatenate(m_cam), jnp.int32),
        m_uv=jnp.asarray(m_uv),
        m_level=jnp.asarray(np.concatenate(m_level), jnp.int32),
        m_valid=jnp.asarray(m_valid),
    )
    return prob, cams, pose_a_gt, pts_gt, out_mask


def rms_reproj(prob, st, cams):
    e, _, _, _, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    chi2 = jnp.sum(e * e, -1)
    return float(jnp.sqrt(jnp.sum(jnp.where(ok, chi2, 0)) / jnp.sum(ok)))


def test_perfect_data_converges_to_zero(rng):
    prob, cams, pose_gt, pts_gt, _ = build_problem(rng, noise_px=0.0)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 30)
    assert rms_reproj(prob, st, cams) < 2e-3
    # poses recovered
    for p in range(1, 4):
        err = np.asarray((st.pose_a[p] @ pose_gt[p].inv()).ln())
        assert np.linalg.norm(err) < 2e-3, (p, err)
    # points recovered
    perr = np.linalg.norm(np.asarray(st.points - pts_gt), axis=-1)
    assert np.median(perr) < 5e-3


def test_fixed_pose_stays_fixed(rng):
    prob, cams, pose_gt, pts_gt, _ = build_problem(rng)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 10)
    err = np.asarray((st.pose_a[0] @ prob.pose_a[0].inv()).ln())
    assert np.linalg.norm(err) == 0.0


def test_noisy_data_reasonable(rng):
    prob, cams, pose_gt, pts_gt, _ = build_problem(rng, noise_px=0.3)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 40)
    rms = rms_reproj(prob, st, cams)
    assert rms < 0.5, rms  # should settle near the noise floor
    assert int(st.accepted) > 3


def test_convergence_flag(rng):
    prob, cams, *_ = build_problem(rng, noise_px=0.0)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 60)
    assert bool(st.converged)


def test_outlier_pass(rng):
    prob, cams, pose_gt, pts_gt, out_mask = build_problem(
        rng, noise_px=0.2, outlier_frac=0.05
    )
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 40)
    flagged = np.asarray(tukey_outlier_pass(prob, st, cams))
    planted = out_mask & np.asarray(prob.m_valid)
    # most planted outliers get flagged; few inliers falsely flagged
    recall = flagged[planted].mean()
    fp = flagged[~planted].mean()
    assert recall > 0.8, recall
    assert fp < 0.1, fp


def test_calib_variant_recovers_extrinsics(rng):
    """BundleAdjusterCalib analogue: perturb camera 1's extrinsic, mark it
    movable, and verify BA recovers the true cam-from-base."""
    prob, cams, pose_gt, pts_gt, _ = build_problem(
        rng, n_poses=5, movable_b=True, perturb=0.0
    )
    true_b = prob.pose_b
    # small perturbation: the adaptive-Huber kernel (sigma from median chi2,
    # as in the reference) heavily downweights grossly wrong cameras, so
    # large extrinsic errors converge only over many repeated runs — the
    # reference drives this via repeated CalibOneStep calls too
    # (src/MapMakerCalib.cc:495-528)
    pert = jnp.zeros((2, 6)).at[1].set(
        jnp.asarray([0.004, -0.002, 0.003, 0.002, -0.0016, 0.0024])
    )
    prob = prob.replace(pose_b=SE3.exp(pert) @ prob.pose_b)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 60)
    err = np.asarray((st.pose_b[1] @ true_b[1].inv()).ln())
    assert np.linalg.norm(err) < 5e-4, err
    assert rms_reproj(prob, st, cams) < 1e-2


def test_point_depth_covariance(rng):
    prob, cams, *_ = build_problem(rng, noise_px=0.2)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 20)
    med, cov = point_depth_covariance(prob, st, cams)
    assert float(med) > 0
    assert np.isfinite(float(med))


def test_lm_step_jits(rng):
    prob, cams, *_ = build_problem(rng, n_points=40, n_poses=2)
    st = create_lm_state(prob)
    f = jax.jit(lambda p, s: lm_step(p, s, cams))
    st2 = f(prob, st)
    assert np.isfinite(float(st2.cost))


def test_marginal_covariance_matches_dense_oracle(rng):
    """The Schur-identity marginal (point_depth_covariance) must equal the
    point marginal of the full dense inverse — the quantity the reference
    obtains from CHOLMOD computeMarginals (src/ChainBundle.cc:1414-1448),
    expressed as inverse-depth variance about the source camera."""
    from mcptam_tpu.ba.bundle import _robust, _normal_system
    from mcptam_tpu.config import DEFAULT_BUNDLE

    prob, cams, *_ = build_problem(rng, n_poses=2, n_points=24, n_cams=2,
                                   noise_px=0.3)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, 15)
    med, cov = point_depth_covariance(prob, st, cams)

    # dense oracle: assemble H over [movable pose coords | point coords],
    # invert, read off per-point 3x3 marginals
    e, Ja, Jb, Jl, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    w, _, _ = _robust(e, ok, DEFAULT_BUNDLE)
    K = e.shape[0]
    L = prob.points.shape[0]
    n_pose = 6  # one movable pose (pose 0 fixed, cams fixed)
    J = np.zeros((2 * K, n_pose + 3 * L))
    Ja_n, Jl_n = np.asarray(Ja), np.asarray(Jl)
    wn = np.sqrt(np.asarray(w))
    pa = np.asarray(prob.m_pose_a)
    pt = np.asarray(prob.m_point)
    for k in range(K):
        if pa[k] == 1:
            J[2 * k:2 * k + 2, :6] = Ja_n[k] * wn[k]
        J[2 * k:2 * k + 2, n_pose + 3 * pt[k]:n_pose + 3 * pt[k] + 3] = (
            Jl_n[k] * wn[k]
        )
    Hfull = J.T @ J
    Sigma_full = np.linalg.inv(Hfull + 1e-9 * np.eye(Hfull.shape[0]))

    pts = np.asarray(st.points)
    c0 = np.asarray(st.pose_b[0].inv().t + 0.0)  # src chain (0,0): cam0@pose0
    src = np.asarray((st.pose_b[0] @ st.pose_a[0]).inv().t)
    oracle = np.zeros(L)
    for l in range(L):
        S3 = Sigma_full[n_pose + 3 * l:n_pose + 3 * l + 3,
                        n_pose + 3 * l:n_pose + 3 * l + 3]
        d = pts[l] - src
        dist = np.linalg.norm(d)
        r = d / dist
        oracle[l] = r @ S3 @ r / dist ** 4
    got = np.asarray(cov)
    rel = np.abs(got - oracle) / np.maximum(oracle, 1e-20)
    assert np.median(rel) < 0.02, (np.median(rel), got[:4], oracle[:4])
    # and the exact marginal must exceed the poses-fixed lower bound
    assert float(med) > 0


def test_compact_problem_equivalent(rng):
    """Compacting a problem to smaller static capacities must not change
    the problem (same edges, remapped indices): identical robust cost /
    sigma at the same state, and LM converges to the same optimum.  (LM
    *trajectories* can differ bitwise — f32 reduction order across the
    reindexed scatter-adds shifts accept/reject decisions — so the
    trajectory itself is not asserted.)"""
    from mcptam_tpu.ba.adjusters import compact_problem
    from mcptam_tpu.ba.bundle import _robust
    from mcptam_tpu.config import DEFAULT_BUNDLE

    prob, cams, pose_gt, pts_gt, _ = build_problem(
        rng, n_poses=3, n_points=50, n_cams=2, noise_px=0.0, perturb=0.01
    )
    small = compact_problem(prob, max_points=64, max_meas=512)
    assert small.points.shape[0] == 64
    assert int(jnp.sum(small.m_valid)) == int(jnp.sum(prob.m_valid))

    # deterministic equivalence at the initial state: same residual set
    # => same robust cost and adaptive-Huber sigma
    for p in (prob, small):
        st0 = create_lm_state(p)
        e, _, _, _, ok = _residuals_and_jacobians(
            p, st0.pose_a, st0.pose_b, st0.points, cams
        )
        _, cost, sig = _robust(e, ok, DEFAULT_BUNDLE)
        if p is prob:
            cost_full, sig_full = float(cost), float(sig)
        else:
            assert abs(float(cost) - cost_full) / cost_full < 1e-5
            assert abs(float(sig) - sig_full) / sig_full < 1e-5

    # both reach the (noiseless) global optimum: ground-truth poses/points
    st_small = lm_run(small, create_lm_state(small), cams, 40)
    for p in range(1, 3):
        err = np.asarray((st_small.pose_a[p] @ pose_gt[p].inv()).ln())
        assert np.linalg.norm(err) < 5e-3, (p, err)
    idx = np.asarray(small.pt_index)
    okp = np.asarray(small.pt_index_ok) & np.asarray(small.movable_pt)
    perr = np.linalg.norm(
        np.asarray(st_small.points)[okp] - np.asarray(pts_gt)[idx[okp]],
        axis=-1,
    )
    assert np.median(perr) < 1e-2


def test_grouped_layout_matches_scatter(rng):
    """The (L,D) observation-table normal equations (dense einsums, the
    TPU-fast path) must reproduce the scatter path exactly: same LM
    trajectory, same depth covariance."""
    from mcptam_tpu.ba.bundle import attach_obs_table, point_depth_covariance

    prob, cams, _, _, _ = build_problem(
        rng, n_poses=4, n_points=96, n_cams=2, noise_px=0.3, movable_b=False
    )
    # knock out a few measurements so segment lengths vary
    mv = np.asarray(prob.m_valid).copy()
    mv[rng.choice(len(mv), len(mv) // 5, replace=False)] = False
    prob = prob.replace(m_valid=jnp.asarray(mv))
    g = attach_obs_table(prob, D=4 * 2 + 2)   # capacity > max obs count

    st0 = create_lm_state(prob)
    st_flat = lm_run(prob, st0, cams, 8)
    st_grp = lm_run(g, create_lm_state(g), cams, 8)
    # float32 accumulation order differs (einsum vs scatter); the LM
    # trajectory amplifies ~1e-7 assembly noise over iterations
    np.testing.assert_allclose(
        np.asarray(st_grp.points), np.asarray(st_flat.points),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(st_grp.pose_a.t), np.asarray(st_flat.pose_a.t),
        rtol=1e-3, atol=1e-3,
    )
    # accept/convergence latching can flip on 1e-7 assembly noise near
    # the 1e-10 convergence thresholds — require equivalent final costs
    assert abs(rms_reproj(prob, st_grp, cams)
               - rms_reproj(prob, st_flat, cams)) < 1e-3

    med_f, cov_f = point_depth_covariance(prob, st_flat, cams)
    med_g, cov_g = point_depth_covariance(g, st_grp, cams)
    np.testing.assert_allclose(
        float(med_g), float(med_f), rtol=1e-3, atol=1e-9
    )


def test_fixed_b_path_matches_general_soa(rng):
    """The static fixed_b fast path (pose-b system elided from the graph,
    the production map-maker case) must reproduce the general SoA path
    exactly on a problem whose movable_b is all-False."""
    from mcptam_tpu.ba.bundle import attach_obs_table

    prob, cams, _, _, _ = build_problem(
        rng, n_poses=4, n_points=96, n_cams=2, noise_px=0.3,
        movable_b=False,
    )
    g = attach_obs_table(prob, D=4 * 2 + 2)
    st_gen = lm_run(g, create_lm_state(g), cams, 8)
    st_fix = lm_run(g, create_lm_state(g), cams, 8, fixed_b=True)
    # the two graphs drop different zero-contribution ops, so f32
    # reduction order differs and the LM trajectory amplifies ~1e-7
    # assembly noise over iterations (same as the scatter-vs-grouped test)
    np.testing.assert_allclose(
        np.asarray(st_fix.points), np.asarray(st_gen.points),
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(st_fix.pose_a.t), np.asarray(st_gen.pose_a.t),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(st_fix.pose_b.t), np.asarray(g.pose_b.t)
    )


def test_soa_movable_b_matches_scatter_solve(rng):
    """The SoA pose-b cross-block (Hab) and Mb assembly — exercised in
    production by the calib BA (pose_calib.py attaches an obs table with
    movable cam-from-base poses) — must reproduce the scatter path's GN
    solve.  Asserted at the single-solve level (delta_a/delta_b/delta_pt)
    plus end-state cost: the calib problem's near-scale-gauge conditioning
    amplifies f32 assembly noise over an LM *trajectory*, so bitwise
    trajectory equality is not a valid oracle here (verified: Jacobians
    and one-step deltas agree to f32 eps; trajectories drift ~1e-2)."""
    from mcptam_tpu.ba.bundle import (
        attach_obs_table, _residuals_and_jacobians, _robust,
        _solve_delta, _solve_delta_soa, _soa_prep,
    )
    from mcptam_tpu.config import DEFAULT_BUNDLE

    prob, cams, _, _, _ = build_problem(
        rng, n_poses=4, n_points=96, n_cams=2, noise_px=0.3, movable_b=True
    )
    mv = np.asarray(prob.m_valid).copy()
    mv[rng.choice(len(mv), len(mv) // 5, replace=False)] = False
    prob = prob.replace(m_valid=jnp.asarray(mv))
    g = attach_obs_table(prob, D=4 * 2 + 2)

    st = create_lm_state(prob)
    e, Ja, Jb, Jl, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    w, _, _ = _robust(e, ok, DEFAULT_BUNDLE)
    da1, db1, dl1 = _solve_delta(prob, e, Ja, Jb, Jl, w, st.lam)
    da2, db2, dl2 = _solve_delta_soa(
        g, _soa_prep(g), st.pose_a, st.pose_b, st.points, cams, w, st.lam
    )
    np.testing.assert_allclose(np.asarray(da2), np.asarray(da1),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(db2), np.asarray(db1),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dl2), np.asarray(dl1),
                               rtol=2e-3, atol=1e-3)

    # both engines settle at the same optimum cost
    st_flat = lm_run(prob, create_lm_state(prob), cams, 12)
    st_grp = lm_run(g, create_lm_state(g), cams, 12)
    assert abs(rms_reproj(prob, st_grp, cams)
               - rms_reproj(prob, st_flat, cams)) < 2e-3


def test_obs_table_overflow_keeps_capacity(rng):
    """A point with more valid measurements than D keeps exactly D in the
    table; the table never indexes an invalid measurement."""
    from mcptam_tpu.ba.bundle import attach_obs_table

    prob, cams, _, _, _ = build_problem(
        rng, n_poses=4, n_points=32, n_cams=2
    )
    D = 3  # every point has up to 8 valid measurements
    g = attach_obs_table(prob, D)
    idx = np.asarray(g.obs_idx)
    tv = np.asarray(g.obs_valid)
    K = len(np.asarray(prob.m_valid))
    assert idx.shape == (32, D)
    assert np.all(idx[tv] < K)
    assert np.all(np.asarray(prob.m_valid)[idx[tv]])
    # each point's tabled measurements really belong to it
    mp = np.asarray(prob.m_point)
    for l in range(32):
        assert np.all(mp[idx[l][tv[l]]] == l)
