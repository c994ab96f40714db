"""Epipolar map-point creation: the AddPointEpipolar kernel.

Re-implements the reference's epipolar search
(src/MapMakerServerBase.cc:604-914) as a batched, static-shape kernel:

  * depth range on the source ray from min/max epipolar angles;
  * the epipolar *arc* on the target camera's unit sphere (these are >180
    degree fisheyes — the epipolar "line" is a great-circle arc) sampled at
    NH static hypotheses (the reference steps at ~3 px via OnePixelAngle);
  * at each hypothesis: warp + search level + warped template from the
    source keyframe, ZMSSD corner search (radius 3) in the target keyframe;
  * ambiguity rejection: matches within 10% of the best must be adjacent
    hypotheses, at most 3 of them;
  * subpixel convergence required, then midpoint triangulation
    (ReprojectPoint analogue, src/MapMakerServerBase.cc:123-143).

Everything vmaps over Q candidates at once — the reference's

    for each candidate: for each hypothesis: SSE ZMSSD over corners

triple loop becomes one (Q, NH, window) tensor program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import (
    CameraModel, project, unproject, projection_derivs_sphere, cam_sphere_deriv,
)
from mcptam_tpu.core.levels import level_zero_pos
from mcptam_tpu.map.state import MapState, kf_cam_from_world, SRC_EPIPOLAR
from mcptam_tpu.ops.patch import (
    warp_and_search_level, make_warped_template_w, find_patch_w,
    subpix_refine_w, make_window_fn4, MAX_SSD,
)

N_HYPOTHESES = 32
MIN_EPI_ANGLE = 0.05
MAX_EPI_ANGLE = jnp.pi / 3


def auto_hypothesis_budget(cams: CameraModel, cam_from_base: SE3,
                           finest_level: int = 0,
                           kf_baseline: float = 0.0,
                           buckets: tuple = (32, 64, 128)) -> int:
    """Rig-static arc-sampling budget approximating the reference's
    adaptive ~3 px stepping (dAngleStep = OnePixelAngle * LevelScale * 3,
    src/MapMakerServerBase.cc:700-714): its hypothesis count GROWS with
    arc length, while the XLA kernel samples a STATIC ``n_hypotheses``
    uniformly.  This helper closes the gap without dynamic shapes — it
    reproduces the kernel's arc construction for every ordered camera
    pair at the central source ray, measures each arc in source-level
    pixels, and returns the smallest bucket that samples the longest arc
    at <= 3 px (the last bucket if none suffices).  Resolved ONCE per
    rig (host side, at map-maker setup), so the compiled program count
    is unchanged.

    kf_baseline > 0 additionally checks a same-camera pair displaced by
    that distance — the "other"-MKF region's typical inter-keyframe
    baseline (max_scaled_mkf_dist x scene depth).

    Close rigs resolve to the 32 floor (a blanket 64 was measured to add
    marginal triangulations on the close-rig scene, see config.py); wide
    baselines bucket up toward reference density.
    """
    import numpy as np
    C = int(cam_from_base.t.shape[0])
    scale = 2.0 ** finest_level

    def _host(x):
        return np.asarray(jax.device_get(x), np.float64)

    pairs = [(s, t, None) for s in range(C) for t in range(C) if s != t]
    if kf_baseline > 0.0:
        pairs += [(c, c, kf_baseline) for c in range(C)]

    needed = 1
    for s, t, shift in pairs:
        cam_s = jax.tree_util.tree_map(lambda a: a[s], cams)
        pose_s = jax.tree_util.tree_map(lambda a: a[s], cam_from_base)
        pose_t = jax.tree_util.tree_map(lambda a: a[t], cam_from_base)
        if shift is not None:
            pose_t = SE3(R=pose_t.R,
                         t=pose_t.t + jnp.asarray([shift, 0.0, 0.0]))
        center = jnp.asarray([float(cam_s.center[0]),
                              float(cam_s.center[1])])
        ray_sc = _host(unproject(cam_s, center))
        step_px = _host(unproject(cam_s, center + jnp.asarray([scale, 0.0])))
        one_px = np.arccos(np.clip(
            np.dot(ray_sc, step_px / max(np.linalg.norm(step_px), 1e-12)),
            -1.0, 1.0))
        if one_px <= 1e-9:
            continue
        # kernel geometry (epipolar_match.one) at the central ray
        Rs, ts_ = _host(pose_s.R), _host(pose_s.t)
        Rt, tt = _host(pose_t.R), _host(pose_t.t)
        R_rel = Rt @ Rs.T                      # target <- source rotation
        t_rel = tt - R_rel @ ts_
        line_dir_tc = R_rel @ ray_sc
        cam_center_sc = Rs @ (-Rt.T @ tt) + ts_
        sep = np.linalg.norm(cam_center_sc)
        if sep <= 1e-6:
            continue
        src_angle = np.arccos(np.clip(
            np.dot(cam_center_sc, ray_sc) / sep, -1.0, 1.0))
        min_tgt = np.pi - src_angle - float(MAX_EPI_ANGLE)
        start_depth = max(sep * np.sin(min_tgt) / np.sin(float(MAX_EPI_ANGLE)),
                          0.2)
        max_tgt = np.pi - src_angle - MIN_EPI_ANGLE
        end_depth = max(sep * np.sin(max_tgt) / np.sin(MIN_EPI_ANGLE),
                        start_depth * 1.01)
        vA = t_rel + start_depth * line_dir_tc
        vB = t_rel + end_depth * line_dir_tc
        vA = vA / max(np.linalg.norm(vA), 1e-9)
        vB = vB / max(np.linalg.norm(vB), 1e-9)
        arc = np.arccos(np.clip(np.dot(vA, vB), -1.0, 1.0))
        needed = max(needed, int(np.ceil(arc / (3.0 * one_px))) + 1)
    for b in buckets:
        if needed <= b:
            return int(b)
    return int(buckets[-1])


def triangulate_midpoint(o1, d1, o2, d2):
    """World point closest to both rays (origin o, unit direction d).
    Solves the 2x2 system for ray parameters; replaces the reference's
    homogeneous SVD ReprojectPoint with the equivalent midpoint method."""
    r = o2 - o1
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    e = jnp.sum(d1 * r, -1)
    f = jnp.sum(d2 * r, -1)
    den = a * c - b * b
    den_safe = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    t1 = (c * e - b * f) / den_safe
    t2 = (b * e - a * f) / den_safe
    p1 = o1 + t1[..., None] * d1
    p2 = o2 + t2[..., None] * d2
    ok = (jnp.abs(den) > 1e-12) & (t1 > 0) & (t2 > 0)
    return 0.5 * (p1 + p2), ok


def epipolar_match(ms: MapState, cams: CameraModel,
                   src_mkf, src_cam, tgt_mkf, tgt_cam,
                   level, xy_level, want,
                   max_ssd: float = MAX_SSD,
                   n_hypotheses: int = N_HYPOTHESES,
                   corner_ambiguity: bool = False):
    """Batched epipolar candidate matching.

    All index args are (Q,) arrays; xy_level is (Q,2) source-level coords.
    n_hypotheses: static arc sample count (the mm_epi_max_hypotheses knob —
    the reference instead steps the arc at ~3 px via OnePixelAngle).
    Returns dict with per-candidate: ok, world position pos_w (Q,3), the
    target subpixel measurement uv_tgt (Q,2), target search level.
    """
    NH = n_hypotheses
    kcw = kf_cam_from_world(ms)  # (M,C) SE3

    def one(src_mkf, src_cam, tgt_mkf, tgt_cam, level, xy, want):
        cam_s = jax.tree_util.tree_map(lambda a: a[src_cam], cams)
        cam_t = jax.tree_util.tree_map(lambda a: a[tgt_cam], cams)
        pose_s = jax.tree_util.tree_map(lambda a: a[src_mkf, src_cam], SE3(R=kcw.R, t=kcw.t))
        pose_t = jax.tree_util.tree_map(lambda a: a[tgt_mkf, tgt_cam], SE3(R=kcw.R, t=kcw.t))

        scale = 2.0 ** level.astype(jnp.float32)
        root = level_zero_pos(xy, level.astype(jnp.float32))
        ray_sc = unproject(cam_s, root)                     # source-cam ray
        # geometry in target frame (ref :620-622)
        rel_ts = pose_t @ pose_s.inv()                      # target<-source
        line_dir_tc = rel_ts.rotate(ray_sc)
        cam_center_tc = rel_ts.t                            # src center in tgt
        cam_center_sc = (pose_s @ pose_t.inv()).t           # tgt center in src

        sep = jnp.linalg.norm(cam_center_sc)
        sep_safe = jnp.maximum(sep, 1e-9)
        src_angle = jnp.arccos(
            jnp.clip(jnp.dot(cam_center_sc, ray_sc) / sep_safe, -1.0, 1.0)
        )
        min_tgt_angle = jnp.pi - src_angle - MAX_EPI_ANGLE
        start_depth = jnp.maximum(
            sep * jnp.sin(min_tgt_angle) / jnp.sin(MAX_EPI_ANGLE), 0.2
        )
        max_tgt_angle = jnp.pi - src_angle - MIN_EPI_ANGLE
        end_depth = sep * jnp.sin(max_tgt_angle) / jnp.sin(MIN_EPI_ANGLE)
        end_depth = jnp.maximum(end_depth, start_depth * 1.01)

        ray_start_tc = cam_center_tc + start_depth * line_dir_tc
        ray_end_tc = cam_center_tc + end_depth * line_dir_tc
        vA = ray_start_tc / jnp.maximum(jnp.linalg.norm(ray_start_tc), 1e-9)
        vB = ray_end_tc / jnp.maximum(jnp.linalg.norm(ray_end_tc), 1e-9)
        arc_ok = jnp.sum((vA - vB) ** 2) > 1e-8

        normal = jnp.cross(vA, vB)
        normal = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-9)
        plane_i = vA
        plane_j = jnp.cross(normal, plane_i)
        to_plane = jnp.stack([plane_i, plane_j, normal])
        pB = (to_plane @ vB)[:2]
        max_angle = jnp.arccos(jnp.clip(pB[0], -1.0, 1.0))

        ray_start_p = (to_plane @ ray_start_tc)[:2]
        ray_end_p = (to_plane @ ray_end_tc)[:2]
        ray_dir_p = ray_end_p - ray_start_p
        ray_dir_p = ray_dir_p / jnp.maximum(jnp.linalg.norm(ray_dir_p), 1e-9)

        # source-pixel footprint rays (also used for the warp pixel
        # vectors below)
        right_nc = unproject(cam_s, root + jnp.stack([scale, jnp.zeros(())]))
        down_nc = unproject(cam_s, root + jnp.stack([jnp.zeros(()), scale]))

        # NH static hypotheses uniformly over the arc.  The reference
        # steps at ~3 source pixels (dAngleStep = OnePixelAngle() *
        # LevelScale * 3, src/MapMakerServerBase.cc:700-702), i.e. its
        # count GROWS with arc length; with XLA's static shapes the
        # equivalent is a hypothesis budget (mm_epi_max_hypotheses,
        # default 32): arcs up to (NH-1) x 3px sample at >= reference
        # density, longer arcs degrade to uniform spread — raise the
        # budget for very wide-baseline rigs.  Short arcs sample DENSER
        # than the reference (the spare budget is free coverage, not
        # masked away: redistributing a fixed NH to a 3-px step and
        # masking the tail measurably loses matches on short arcs).
        angles = (
            jnp.arange(NH, dtype=jnp.float32)
            / (NH - 1.0) * max_angle
        )
        cpt = jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1)  # (NH,2)
        alpha_den = ray_dir_p[1] * cpt[:, 0] - ray_dir_p[0] * cpt[:, 1]
        alpha_den = jnp.where(jnp.abs(alpha_den) < 1e-12, 1e-12, alpha_den)
        alpha = (
            ray_start_p[0] * cpt[:, 1] - ray_start_p[1] * cpt[:, 0]
        ) / alpha_den
        p_tc = ray_start_tc[None, :] + alpha[:, None] * line_dir_tc[None, :]
        p_w = pose_t.inv().apply(p_tc)                      # (NH,3)

        # hypothesis pixel vectors (RefreshPixelVectors inline, with the
        # fronto-parallel normal (0,0,-1)): footprints in world frame
        p_sc = pose_s.apply(p_w)                            # (NH,3)
        cam_height = jnp.abs(p_sc[:, 2])

        def on_plane(ray):
            rate = jnp.maximum(jnp.abs(ray[2]), 1e-9)
            return ray[None, :] * (cam_height / rate)[:, None]

        cen_pl = on_plane(ray_sc)
        r_pl = on_plane(right_nc)
        d_pl = on_plane(down_nc)
        Rt = pose_s.R.T
        pix_right_w = jnp.einsum("ij,nj->ni", Rt, r_pl - cen_pl)
        pix_down_w = jnp.einsum("ij,nj->ni", Rt, d_pl - cen_pl)

        # project hypotheses into target + warp/search-level + template +
        # corner search (radius 3)
        uv_t, proj_ok = project(cam_t, p_tc)                # (NH,2)
        duv = projection_derivs_sphere(cam_t, p_tc)
        d_th, d_ph = cam_sphere_deriv(p_tc)

        src_fn = make_window_fn4(ms.mkfs.atlas, src_mkf, src_cam)
        tgt_fn = make_window_fn4(ms.mkfs.atlas, tgt_mkf, tgt_cam)
        crn_fn = make_window_fn4(ms.mkfs.corner_atlas, tgt_mkf, tgt_cam)

        def per_hyp(uv, ok_h, duv_h, dth_h, dph_h, prw, pdw):
            warp, slvl, w_ok = warp_and_search_level(
                duv_h, dth_h, dph_h, pose_t.R, prw, pdw
            )
            tmpl, t_ok = make_warped_template_w(
                src_fn, level, xy.astype(jnp.float32), warp, slvl
            )
            found, pos, ssd = find_patch_w(
                tgt_fn, crn_fn, slvl, tmpl, uv, 3, max_ssd=max_ssd
            )
            good = found & ok_h & w_ok & t_ok
            return good, pos, jnp.where(good, ssd, jnp.inf), slvl, tmpl

        hyp_ok, hyp_pos, hyp_ssd, hyp_lvl, hyp_tmpl = jax.vmap(per_hyp)(
            uv_t, proj_ok, duv, d_th, d_ph, pix_right_w, pix_down_w
        )

        best = jnp.argmin(hyp_ssd)
        best_ssd = hyp_ssd[best]
        any_found = jnp.isfinite(best_ssd)
        # ambiguity (ref :798-825): every match within 10% of the best
        # must sit near it, few in number.  TWO formulations:
        #
        # corner_ambiguity=False (default, reference-faithful): the
        # index-adjacency rule — close matches within min(step, 3 src px)
        # of the best, at most 3 close.  On short arcs (step < 3 px) this
        # is the historical +-1-index strictness, which measurably
        # filters marginal matches the zero-overlap calibration scene's
        # tracker quality depends on (round 5 re-confirmed: swapping it
        # out collapsed camera-2 tracking in that drive).
        #
        # corner_ambiguity=True (dense budgets): the index proxy breaks
        # when sampling is denser than the reference's 3 px stepping — a
        # dense budget puts many hypotheses on the SAME corner and the
        # +-1-index rule rejects it as "ambiguous" (measured 58 -> 22
        # matches from NH=32 -> 128).  Evaluated in corner space the rule
        # is density-invariant: a close score at a DIFFERENT corner is
        # ambiguous; same-corner overlap is tolerated within the
        # level-scaled radius-3 search reach plus one step (beyond that
        # the match is depth-unconstrained).  auto_hypothesis_budget
        # rigs that bucket above 32 switch to this rule (see
        # system/mapmaker.py::_resolve_epi_budget).
        #
        # right_nc sits one LEVEL pixel (`scale` root px) from the root
        # ray, so this angle already carries the LevelScale factor.
        one_px_lvl_angle = jnp.arccos(jnp.clip(
            jnp.dot(ray_sc, right_nc)
            / jnp.maximum(jnp.linalg.norm(right_nc), 1e-12),
            -1.0, 1.0,
        ))
        step = max_angle / (NH - 1.0)
        close = hyp_ok & (hyp_ssd <= best_ssd * 1.1 + 1e-6)
        if corner_ambiguity:
            pos_l0 = level_zero_pos(hyp_pos,
                                    hyp_lvl.astype(jnp.float32)[:, None])
            d_corner = jnp.max(jnp.abs(pos_l0 - pos_l0[best]), axis=-1)
            same_corner = d_corner <= 2.0 * (2.0 ** hyp_lvl[best])
            rival = close & ~same_corner
            # radius-3 search reach is 3 px at the TARGET SEARCH level;
            # the per-source-level pixel angle scales by 2^(slvl - level)
            lvl_gap = jnp.maximum(
                2.0 ** (hyp_lvl[best].astype(jnp.float32)
                        - level.astype(jnp.float32)), 1.0,
            )
            overlap = 3.0 * one_px_lvl_angle * lvl_gap + step
            depth_wide = close & same_corner & (
                jnp.abs(angles - angles[best]) > overlap * (1.0 + 1e-5)
            )
            unambiguous = (jnp.sum(rival) == 0) & (jnp.sum(depth_wide) == 0)
        else:
            window = jnp.minimum(step, 3.0 * one_px_lvl_angle)
            far_close = close & (
                jnp.abs(angles - angles[best]) > window * (1.0 + 1e-5)
            )
            unambiguous = (jnp.sum(far_close) == 0) & (jnp.sum(close) <= 3)

        # subpixel on the best match in the target keyframe
        pos_sub, conv = subpix_refine_w(
            tgt_fn, hyp_lvl[best], hyp_tmpl[best], hyp_pos[best], 10
        )

        # triangulate source root ray against refined target ray
        ray_t = unproject(cam_t, pos_sub)
        o_s = pose_s.inv().t
        d_s = pose_s.inv().rotate(ray_sc)
        o_t = pose_t.inv().t
        d_t = pose_t.inv().rotate(ray_t)
        pos_w, tri_ok = triangulate_midpoint(o_s, d_s, o_t, d_t)

        ok = (
            want & arc_ok & any_found & unambiguous & conv & tri_ok
            & (sep > 1e-6)
        )
        return ok, pos_w, pos_sub, hyp_lvl[best]

    return jax.vmap(one)(src_mkf, src_cam, tgt_mkf, tgt_cam, level, xy_level, want)


def create_epipolar_points(ms: MapState, cams: CameraModel,
                           src_mkf, src_cam, tgt_mkf, tgt_cam,
                           level, xy_level, want, max_ssd: float = MAX_SSD,
                           n_hypotheses: int = N_HYPOTHESES,
                           corner_ambiguity: bool = False):
    """Run epipolar matching and commit the successful candidates as map
    points with ROOT(source) + EPIPOLAR(target) measurements."""
    from mcptam_tpu.map.builder import add_points, add_measurements

    ok, pos_w, uv_tgt, tgt_level = epipolar_match(
        ms, cams, src_mkf, src_cam, tgt_mkf, tgt_cam, level, xy_level, want,
        max_ssd, n_hypotheses, corner_ambiguity,
    )
    ms, slots, created = add_points(
        ms, cams,
        mkf_idx=src_mkf,
        cam_idx=src_cam,
        level=level,
        xy_level=xy_level.astype(jnp.float32),
        pos_w=pos_w,
        want=ok,
    )
    Q = want.shape[0]
    ms = add_measurements(
        ms,
        mkf=tgt_mkf,
        cam=tgt_cam,
        point=slots,
        level=level,
        uv_l0=uv_tgt,
        want=created,
        source=jnp.full((Q,), SRC_EPIPOLAR, jnp.int32),
        subpix=jnp.ones(Q, bool),
    )
    return ms, created
