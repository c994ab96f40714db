"""Data-association refinds: re-search existing points in keyframes that
lack a measurement of them.

Re-implements ReFind_Common / ReFindInSingleKeyFrame / ReFindNewlyMade
(src/MapMakerServerBase.cc:921-1060): project each candidate (point, KF)
pair, make the warped template from the point's source patch, ZMSSD-search
the *stored keyframe* image (small radius), require subpixel convergence,
then record a SRC_REFIND measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import (
    CameraModel, project, projection_derivs_sphere, cam_sphere_deriv,
)
from mcptam_tpu.map.state import MapState, kf_cam_from_world, SRC_REFIND
from mcptam_tpu.map.builder import add_measurements
from mcptam_tpu.ops.patch import (
    warp_and_search_level, make_warped_template_w, find_patch_w,
    subpix_refine_w, make_window_fn4, MAX_SSD,
)

REFIND_RANGE = 7  # level-0 px search radius around the projection
MAX_REFINDS = 512  # per invocation


def measurement_table(ms: MapState):
    """(M,C,N) bool: does (mkf,cam) already measure point n?"""
    M = ms.mkfs.capacity
    C = ms.cam_from_base.t.shape[0]
    N = ms.points.capacity
    tab = jnp.zeros((M, C, N), bool)
    ok = ms.meas.valid
    return tab.at[ms.meas.mkf, ms.meas.cam, ms.meas.point].max(ok)


def refind_in_keyframes(ms: MapState, cams: CameraModel,
                        target_mkf_mask=None,
                        max_refinds: int = MAX_REFINDS,
                        pair_mask=None) -> tuple:
    """Attempt refinds of all points in all KFs missing them (optionally
    restricted to MKFs in target_mkf_mask, or to explicit (KF, point)
    pairs via pair_mask (M,C,N) — the failure-queue retry path,
    ReFindFromFailureQueue, src/MapMakerServerBase.cc:1063-1080).

    Pairs that are attempted and FAIL are marked never-retry, exactly as
    every ReFind_Common failure path inserts into spNeverRetryKFs
    (src/MapMakerServerBase.cc:921-1003); attempted pairs leave the
    failure queue either way.  Returns (ms, n_added)."""
    M = ms.mkfs.capacity
    C = ms.cam_from_base.t.shape[0]
    N = ms.points.capacity
    if target_mkf_mask is None:
        target_mkf_mask = ms.mkfs.valid

    kcw = kf_cam_from_world(ms)
    # project all points into all KFs: (M,C,N)
    p_c = (
        jnp.einsum("mcij,nj->mcni", kcw.R, ms.points.pos_w)
        + kcw.t[:, :, None, :]
    )
    uv, proj_ok = jax.vmap(lambda pc: jax.vmap(project)(cams, pc))(p_c)

    has = measurement_table(ms)
    live = ms.points.valid & ~ms.points.bad
    cand = (
        proj_ok & ~has & live[None, None, :]
        & ~ms.no_retry
        & target_mkf_mask[:, None, None]
        & ms.mkfs.kf_valid[:, :, None]
        & ms.mkfs.valid[:, None, None]
    )
    if pair_mask is not None:
        cand = cand & pair_mask
    # pairs whose projection already failed go straight to never-retry
    # (ReFind_Common: invalid projection -> spNeverRetryKFs insert)
    proj_dead = (
        ~proj_ok & ~has & live[None, None, :]
        & target_mkf_mask[:, None, None]
        & ms.mkfs.kf_valid[:, :, None] & ms.mkfs.valid[:, None, None]
        & (pair_mask if pair_mask is not None else True)
    )

    # pick up to max_refinds pairs
    flat = cand.reshape(-1)
    pri = jnp.where(flat, 1.0, -jnp.inf)
    _, idx = jax.lax.top_k(pri, max_refinds)
    sel_ok = flat[idx]
    mkf = (idx // (C * N)).astype(jnp.int32)
    cam = ((idx // N) % C).astype(jnp.int32)
    pt = (idx % N).astype(jnp.int32)
    uv_pred = uv.reshape(-1, 2)[idx]

    def per_pair(m, c, n, uvp, okp):
        pose = jax.tree_util.tree_map(lambda a: a[m, c], SE3(R=kcw.R, t=kcw.t))
        cam_c = jax.tree_util.tree_map(lambda a: a[c], cams)
        pc = pose.apply(ms.points.pos_w[n])
        duv = projection_derivs_sphere(cam_c, pc)
        d_th, d_ph = cam_sphere_deriv(pc)
        warp, slvl, w_ok = warp_and_search_level(
            duv, d_th, d_ph, pose.R,
            ms.points.pixel_right_w[n], ms.points.pixel_down_w[n],
        )
        src_fn = make_window_fn4(
            ms.mkfs.atlas, ms.points.src_mkf[n], ms.points.src_cam[n]
        )
        tmpl, t_ok = make_warped_template_w(
            src_fn, ms.points.src_level[n], ms.points.center_xy[n], warp, slvl
        )
        tgt_fn = make_window_fn4(ms.mkfs.atlas, m, c)
        crn_fn = make_window_fn4(ms.mkfs.corner_atlas, m, c)
        found, pos, ssd = find_patch_w(
            tgt_fn, crn_fn, slvl, tmpl, uvp, REFIND_RANGE
        )
        found = found & okp & w_ok & t_ok
        pos_sub, conv = subpix_refine_w(tgt_fn, slvl, tmpl, pos, 10)
        return found & conv, jnp.where(conv, pos_sub, pos), slvl

    got, pos, slvl = jax.vmap(per_pair)(mkf, cam, pt, uv_pred, sel_ok)
    K = max_refinds
    ms = add_measurements(
        ms, mkf=mkf, cam=cam, point=pt, level=slvl, uv_l0=pos, want=got,
        source=jnp.full((K,), SRC_REFIND, jnp.int32),
        subpix=jnp.ones(K, bool),
    )
    # bookkeeping: attempted-and-failed pairs never retry; every attempted
    # pair (and every projection-dead pair) leaves the failure queue
    failed = sel_ok & ~got
    no_retry = ms.no_retry.at[mkf, cam, pt].max(failed) | proj_dead
    attempted_tab = jnp.zeros((M, C, N), bool).at[mkf, cam, pt].max(sel_ok)
    retry_q = ms.retry_queue & ~attempted_tab & ~proj_dead
    ms = ms.replace(no_retry=no_retry, retry_queue=retry_q)
    return ms, jnp.sum(got)
