"""Warped-patch template matching: the PatchFinder, TPU-style.

Re-implements the reference's PatchFinder (src/PatchFinder.cc) as pure
per-point functions designed to be vmapped over (points x cameras):

  * :func:`warp_and_search_level` — affine warp from the source patch's
    world pixel-footprint vectors + search-level selection by determinant
    quartering (src/PatchFinder.cc:69-122);
  * :func:`make_warped_template` — 8x8 template by inverse-warp bilinear
    sampling of the source keyframe level (CVD::transform analogue,
    src/PatchFinder.cc:135-182);
  * :func:`find_patch` — coarse search.  Where the reference scans FAST
    corners in a radius with a hand-rolled SSE 8x8 ZMSSD kernel
    (src/PatchFinder.cc:229-355,491-658), we gather a static window around
    the prediction and evaluate the ZMSSD at *every* offset as one dense
    tensor contraction (VPU/MXU-friendly), masking non-corner positions
    with the dense corner map — same accept/reject semantics, no lists;
  * :func:`subpix_refine` — 3-DOF (x, y, mean-diff) inverse-composition
    Gauss-Newton with bilinear sampling (src/PatchFinder.cc:362-470).

Image access is abstracted through *window functions* built by
:func:`make_window_fn` and friends: ``window_fn(level, y0, x0, size) ->
(window, no_clamp_ok)`` gathers a static-size window in level coords from a
pyramid atlas, whether the atlas lives standalone (2D), per camera (3D), or
in the keyframe store (4D with dynamic mkf/cam indices).  This lets one
vmapped search kernel serve the tracker (current frame) and the map maker
(refinds/epipolar in stored keyframes).

Positions follow the reference conventions: "L0 coords" are level-0 pixels;
level-N coords relate via LevelNPos/LevelZeroPos (half-pixel aware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import LEVELS, PATCH_SIZE
from mcptam_tpu.core.levels import level_n_pos, level_zero_pos
from mcptam_tpu.ops.atlas import (
    level_xoff_array, level_size_arrays, _level0_width_from_atlas,
)

HALF = PATCH_SIZE // 2  # patch center offset (4,4), ref PatchFinder.cc:60
MAX_SSD_PER_PIXEL = 250.0  # ref src/PatchFinder.cc:44 (tracking); 500 calib
MAX_SSD = PATCH_SIZE * PATCH_SIZE * MAX_SSD_PER_PIXEL

# Template-generation source window half-size (level px).  Warp column norms
# are bounded by the det<=3 acceptance, so |warp @ patch_offset| stays well
# inside this; samples outside flag the template bad.
_SRC_HALF = 12


# ---------------------------------------------------------------------------
# Window accessors over atlases of different ranks
# ---------------------------------------------------------------------------

def _atlas_l0_dims(atlas):
    return atlas.shape[-2], _level0_width_from_atlas(atlas.shape[-1])


def make_window_fn(atlas2d):
    """Window accessor for a standalone (H,AW) atlas."""
    H, W0 = _atlas_l0_dims(atlas2d)
    AW = atlas2d.shape[-1]
    xoffs = level_xoff_array(W0)

    def fn(level, y0, x0, size):
        ax0 = x0 + xoffs[level]
        win = jax.lax.dynamic_slice(atlas2d, (y0, ax0), size)
        ok = (y0 >= 0) & (ax0 >= 0) & (y0 + size[0] <= H) & (ax0 + size[1] <= AW)
        return win.astype(jnp.float32), ok

    fn.level_hw = level_size_arrays(H, W0)
    return fn


def make_window_fn3(atlas3, cam):
    """Accessor into a (C,H,AW) per-camera atlas at (traced) camera cam."""
    H, W0 = _atlas_l0_dims(atlas3)
    AW = atlas3.shape[-1]
    xoffs = level_xoff_array(W0)

    def fn(level, y0, x0, size):
        ax0 = x0 + xoffs[level]
        win = jax.lax.dynamic_slice(atlas3, (cam, y0, ax0), (1,) + tuple(size))[0]
        ok = (y0 >= 0) & (ax0 >= 0) & (y0 + size[0] <= H) & (ax0 + size[1] <= AW)
        return win.astype(jnp.float32), ok

    fn.level_hw = level_size_arrays(H, W0)
    return fn


def make_window_fn4(atlas4, mkf, cam):
    """Accessor into the keyframe store (M,C,H,AW) at (mkf, cam)."""
    H, W0 = _atlas_l0_dims(atlas4)
    AW = atlas4.shape[-1]
    xoffs = level_xoff_array(W0)

    def fn(level, y0, x0, size):
        ax0 = x0 + xoffs[level]
        win = jax.lax.dynamic_slice(
            atlas4, (mkf, cam, y0, ax0), (1, 1) + tuple(size)
        )[0, 0]
        ok = (y0 >= 0) & (ax0 >= 0) & (y0 + size[0] <= H) & (ax0 + size[1] <= AW)
        return win.astype(jnp.float32), ok

    fn.level_hw = level_size_arrays(H, W0)
    return fn


# ---------------------------------------------------------------------------
# Warp + search level
# ---------------------------------------------------------------------------

def warp_and_search_level(cam_derivs, d_theta, d_phi, R_cam_from_world,
                          pixel_right_w, pixel_down_w):
    """Compute the patch warp and search level for one (point, camera).

    Args: cam_derivs (2,2) d(uv)/d(theta,phi) at the projected point;
    d_theta/d_phi (3,) sphere derivs; R_cam_from_world (3,3); the point's
    world-frame one-pixel footprint vectors (3,).

    Returns (warp_inv (2,2), search_level int32, ok bool).  warp_inv maps
    source-level pixel steps to current level-0 pixel steps.
    """
    mr = R_cam_from_world @ pixel_right_w
    md = R_cam_from_world @ pixel_down_w
    sph_r = jnp.stack([d_theta @ mr, d_phi @ mr])
    sph_d = jnp.stack([d_theta @ md, d_phi @ md])
    col_r = cam_derivs @ sph_r
    col_d = cam_derivs @ sph_d
    A = jnp.stack([col_r, col_d], axis=1)  # columns
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]

    # quarter the det until <=3 (or run out of levels)
    lvl = jnp.zeros((), jnp.int32)
    d = det
    for _ in range(LEVELS - 1):
        step = (d > 3.0)
        lvl = lvl + step.astype(jnp.int32)
        d = jnp.where(step, d * 0.25, d)
    ok = (d <= 3.0) & (d >= 0.5) & jnp.isfinite(det)
    return A, lvl, ok


# ---------------------------------------------------------------------------
# Templates
# ---------------------------------------------------------------------------

def _bilinear(img, ys, xs):
    """Bilinear sample of a 2D array at float coords (broadcasting)."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    H, W = img.shape
    y0c = jnp.clip(y0, 0, H - 2)
    x0c = jnp.clip(x0, 0, W - 2)
    tl = img[y0c, x0c]
    tr = img[y0c, x0c + 1]
    bl = img[y0c + 1, x0c]
    br = img[y0c + 1, x0c + 1]
    return (
        tl * (1 - wy) * (1 - wx)
        + tr * (1 - wy) * wx
        + bl * wy * (1 - wx)
        + br * wy * wx
    )


def make_warped_template_w(window_fn, src_level, src_center_xy, warp_inv,
                           search_level):
    """Generate the 8x8 warped template for one point (window_fn indexes
    the *source keyframe* atlas).  The sampling matrix is
    ``m2 = inv(warp_inv) * 2^search_level`` — source-level pixels per
    template (search-level) pixel (ref src/PatchFinder.cc:135-143).

    Returns (template (8,8) f32, ok bool).
    """
    det = warp_inv[0, 0] * warp_inv[1, 1] - warp_inv[0, 1] * warp_inv[1, 0]
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = (
        jnp.array([[warp_inv[1, 1], -warp_inv[0, 1]],
                   [-warp_inv[1, 0], warp_inv[0, 0]]])
        / det_safe
    )
    m2 = inv * (2.0 ** search_level.astype(jnp.float32))

    cx = src_center_xy[0]
    cy = src_center_xy[1]
    cyi = jnp.floor(cy).astype(jnp.int32)
    cxi = jnp.floor(cx).astype(jnp.int32)
    S = 2 * _SRC_HALF + 2
    win, win_ok = window_fn(src_level, cyi - _SRC_HALF, cxi - _SRC_HALF, (S, S))

    oy = (jnp.arange(PATCH_SIZE, dtype=jnp.float32) - HALF)[:, None]
    ox = (jnp.arange(PATCH_SIZE, dtype=jnp.float32) - HALF)[None, :]
    sx = m2[0, 0] * ox + m2[0, 1] * oy + (cx - cxi) + _SRC_HALF
    sy = m2[1, 0] * ox + m2[1, 1] * oy + (cy - cyi) + _SRC_HALF

    inside = (sx >= 0) & (sx <= S - 2) & (sy >= 0) & (sy <= S - 2)
    tmpl = _bilinear(win, sy, sx)

    hs, ws = window_fn.level_hw
    h_l = hs[src_level]
    w_l = ws[src_level]
    lx = sx - _SRC_HALF + cxi
    ly = sy - _SRC_HALF + cyi
    in_level = (lx >= 0) & (lx <= w_l - 2) & (ly >= 0) & (ly <= h_l - 2)
    ok = jnp.all(inside & in_level) & win_ok & (jnp.abs(det) > 1e-12)
    return tmpl, ok


def unwarped_template_w(window_fn, src_level, src_center_xy):
    """8x8 template copied straight from the source level (no warp) — used
    by epipolar search (ref MakeTemplateCoarseNoWarp,
    src/PatchFinder.cc:187-199).  Integer-aligned copy."""
    cyi = jnp.round(src_center_xy[1]).astype(jnp.int32)
    cxi = jnp.round(src_center_xy[0]).astype(jnp.int32)
    win, win_ok = window_fn(
        src_level, cyi - HALF, cxi - HALF, (PATCH_SIZE, PATCH_SIZE)
    )
    hs, ws = window_fn.level_hw
    ok = (
        (cxi - HALF >= 0) & (cyi - HALF >= 0)
        & (cxi + HALF < ws[src_level]) & (cyi + HALF < hs[src_level])
        & win_ok
    )
    return win, ok


# ---------------------------------------------------------------------------
# ZMSSD + coarse search
# ---------------------------------------------------------------------------

def zmssd(template, patches):
    """Zero-mean SSD between one (8,8) template and (...,8,8) patches."""
    n = PATCH_SIZE * PATCH_SIZE
    t = template.reshape(-1)
    p = patches.reshape(patches.shape[:-2] + (n,))
    sum_t = jnp.sum(t)
    sum_p = jnp.sum(p, axis=-1)
    ssd = jnp.sum((p - t) ** 2, axis=-1)
    return ssd - (sum_p - sum_t) ** 2 / n


PACK_CORNER = 1024.0  # corner flag packed above the 8-bit pixel range


def pack_corner_atlas(atlas, corner_atlas):
    """img + 1024*corner: one fused plane so the search needs a single
    window gather (gathers dominate the search cost on TPU)."""
    return atlas + PACK_CORNER * corner_atlas


def find_patch_w(window_fn, corner_window_fn, search_level, template,
                 pred_pos_l0, range_l0: int, max_range_l0=None,
                 exhaustive: bool = False, max_ssd: float = MAX_SSD):
    """Coarse patch search for one point (ref FindPatchCoarse,
    src/PatchFinder.cc:229-355).

    range_l0: static int — the level-0 search radius that sizes the window;
    max_range_l0: optional traced radius (<= range_l0) actually enforced.
    corner_window_fn=None means window_fn reads a pack_corner_atlas plane
    (pixel + corner flag in one gather).

    Returns (found bool, pos_l0 (2,) f32, best_ssd f32).
    """
    if max_range_l0 is None:
        max_range_l0 = jnp.asarray(float(range_l0))
    scale = 2.0 ** search_level.astype(jnp.float32)
    pos_lev = level_n_pos(pred_pos_l0, search_level.astype(jnp.float32))
    r_lev = jnp.ceil(max_range_l0 / scale)

    R = range_l0  # static worst-case (level-0) radius
    S = 2 * R + 1
    cyi = jnp.round(pos_lev[1]).astype(jnp.int32)
    cxi = jnp.round(pos_lev[0]).astype(jnp.int32)
    y0 = cyi - R - HALF
    x0 = cxi - R - HALF
    G = S + PATCH_SIZE  # gathered region edge
    region, region_ok = window_fn(search_level, y0, x0, (G, G))
    if corner_window_fn is None:
        flag = region >= PACK_CORNER / 2
        region = region - PACK_CORNER * flag.astype(region.dtype)
        corner_w = flag[HALF : HALF + S, HALF : HALF + S].astype(region.dtype)
    else:
        corner_w, _ = corner_window_fn(search_level, y0 + HALF, x0 + HALF, (S, S))

    hs, ws = window_fn.level_hw
    h_l, w_l = hs[search_level], ws[search_level]

    dy = jnp.arange(S, dtype=jnp.float32) - R
    dx = jnp.arange(S, dtype=jnp.float32) - R
    oy = dy[:, None] + jnp.zeros((1, S))
    ox = dx[None, :] + jnp.zeros((S, 1))
    yy = cyi + oy
    xx = cxi + ox
    dist_ok = (
        (yy - pos_lev[1]) ** 2 + (xx - pos_lev[0]) ** 2
    ) <= r_lev * r_lev + 1e-6
    in_bounds = (
        (xx >= HALF) & (yy >= HALF) & (xx < w_l - HALF) & (yy < h_l - HALF)
    )
    is_corner = corner_w > 0.5
    valid = dist_ok & in_bounds & (is_corner | exhaustive)
    valid = valid & jnp.broadcast_to(region_ok, valid.shape)

    # ZMSSD at every offset WITHOUT materializing an (S,S,8,8) patch
    # tensor:  zmssd = sum(p^2) - 2 sum(p*t) + sum(t^2) - (sum(p)-sum(t))^2/64.
    # sum(p) / sum(p^2) are separable 8-tap box sums; the cross term is an
    # accumulate over the 64 template taps of shifted region views — all
    # reads hit the small VMEM-resident region, and XLA fuses the
    # accumulation into one kernel.
    n = PATCH_SIZE * PATCH_SIZE

    def box8(a):  # (G,G) -> (S,S) 8x8 window sums
        rows = sum(a[:, px : px + S] for px in range(PATCH_SIZE))   # (G,S)
        return sum(rows[py : py + S, :] for py in range(PATCH_SIZE))

    sum_p = box8(region)
    sum_p2 = box8(region * region)
    cross = sum(
        region[py : py + S, px : px + S] * template[py, px]
        for py in range(PATCH_SIZE)
        for px in range(PATCH_SIZE)
    )
    sum_t = jnp.sum(template)
    sum_t2 = jnp.sum(template * template)
    scores = sum_p2 - 2.0 * cross + sum_t2 - (sum_p - sum_t) ** 2 / n
    scores = jnp.where(valid, scores, jnp.inf)
    best = jnp.argmin(scores.reshape(-1))
    by = best // S
    bx = best % S
    best_ssd = scores.reshape(-1)[best]
    found = best_ssd < max_ssd
    pos_lev_best = jnp.stack(
        [(cxi + bx - R).astype(jnp.float32), (cyi + by - R).astype(jnp.float32)]
    )
    pos_l0 = level_zero_pos(pos_lev_best, search_level.astype(jnp.float32))
    return found, pos_l0, best_ssd


# ---------------------------------------------------------------------------
# Sub-pixel refinement
# ---------------------------------------------------------------------------

def subpix_template_hessian(template):
    """Inner 6x6 gradients + inverse 3x3 JTJ of the inverse-composition
    template (ref MakeSubPixTemplate, src/PatchFinder.cc:362-391)."""
    gx = 0.5 * (template[1:-1, 2:] - template[1:-1, :-2])
    gy = 0.5 * (template[2:, 1:-1] - template[:-2, 1:-1])
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)
    H = J.T @ J
    Hinv = jnp.linalg.inv(H + 1e-6 * jnp.eye(3))
    return gx, gy, Hinv


# Max drift (search-level px) the single gathered subpix window allows.
# Inverse-composition updates from a correct coarse match are sub-pixel per
# iteration and total well under this; drifting out of the window marks the
# point unconverged (the reference's off-image check plays the same role).
_SUBPIX_PAD = 3


def subpix_refine_w(window_fn, search_level, template, pos_l0,
                    n_its: int = 10, conv_limit: float = 0.03):
    """Iterate inverse composition to convergence for one point
    (ref IterateSubPixToConvergence/IterateSubPix,
    src/PatchFinder.cc:396-470).

    The window around the coarse match is gathered ONCE; the fixed-count
    iteration then resamples inside it (the per-iteration dynamic gathers
    were the tracker's hottest memory pattern).  Returns (pos_l0,
    converged)."""
    gx, gy, Hinv = subpix_template_hessian(template)
    lvl_f = search_level.astype(jnp.float32)
    scale = 2.0 ** lvl_f
    hs, ws = window_fn.level_hw
    h_l = hs[search_level].astype(jnp.float32)
    w_l = ws[search_level].astype(jnp.float32)

    P = _SUBPIX_PAD
    WSZ = PATCH_SIZE + 1 + 2 * P
    NS = WSZ - PATCH_SIZE + 1  # integer anchor positions per axis
    center0 = level_n_pos(pos_l0.astype(jnp.float32), lvl_f)
    base0 = center0 - HALF
    byi0 = jnp.floor(base0[1]).astype(jnp.int32) - P
    bxi0 = jnp.floor(base0[0]).astype(jnp.int32) - P
    win, win_ok = window_fn(search_level, byi0, bxi0, (WSZ, WSZ))

    # all integer-anchored PATCHxPATCH blocks, stacked statically: bilinear
    # sampling at fractional (wy, wx) becomes a separable hat-weighted sum
    # over this stack — no dynamic slicing in the loop (batched
    # dynamic_slice lowers to TPU gather, the old hot spot)
    SP = PATCH_SIZE
    wstack = jnp.stack(
        [jnp.stack([win[a : a + SP, b : b + SP] for b in range(NS)])
         for a in range(NS)]
    )  # (NS, NS, SP, SP)
    anchors = jnp.arange(NS, dtype=jnp.float32)

    def body(_, carry):
        pos, mean_diff, done, ok = carry
        center = level_n_pos(pos, lvl_f)
        base = center - HALF
        # window coords of the (PATCH+1)^2 sample block
        wy = base[1] - byi0.astype(jnp.float32)
        wx = base[0] - bxi0.astype(jnp.float32)
        off_edge = (
            (center[0] < HALF + 1) | (center[1] < HALF + 1)
            | (center[0] > w_l - HALF - 2) | (center[1] > h_l - HALF - 2)
            | (wy < 0) | (wx < 0)
            | (wy > WSZ - PATCH_SIZE - 2) | (wx > WSZ - PATCH_SIZE - 2)
        )
        # hat-function weights == bilinear interpolation over the stack
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(wy - anchors))  # (NS,)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(wx - anchors))
        tgt = jnp.einsum("a,b,abij->ij", hy, hx, wstack)
        diff = tgt[1:-1, 1:-1] - template[1:-1, 1:-1] + mean_diff
        accum = jnp.stack(
            [jnp.sum(diff * gx), jnp.sum(diff * gy), jnp.sum(diff)]
        )
        upd = Hinv @ accum
        new_pos = pos - upd[:2] * scale
        new_mean = mean_diff - upd[2]
        upd_sq = upd[0] ** 2 + upd[1] ** 2
        conv = upd_sq < conv_limit * conv_limit
        active = ~(done | off_edge)
        pos = jnp.where(active, new_pos, pos)
        mean_diff = jnp.where(active, new_mean, mean_diff)
        done = done | conv
        ok = ok & ~off_edge
        return pos, mean_diff, done, ok

    init = (
        pos_l0.astype(jnp.float32),
        jnp.zeros(()),
        jnp.zeros((), bool),
        win_ok,
    )
    pos, _, done, ok = jax.lax.fori_loop(0, n_its, body, init)
    return pos, done & ok


# ---------------------------------------------------------------------------
# 2D-atlas convenience wrappers (tests, calibration tools)
# ---------------------------------------------------------------------------

def make_warped_template(src_atlas, src_level, src_center_xy, warp_inv,
                         search_level):
    return make_warped_template_w(
        make_window_fn(src_atlas), src_level, src_center_xy, warp_inv,
        search_level,
    )


def unwarped_template(src_atlas, src_level, src_center_xy):
    return unwarped_template_w(make_window_fn(src_atlas), src_level, src_center_xy)


def find_patch(cur_atlas, corner_atlas, search_level, template, pred_pos_l0,
               range_l0: int, max_range_l0=None, exhaustive: bool = False,
               max_ssd: float = MAX_SSD):
    return find_patch_w(
        make_window_fn(cur_atlas), make_window_fn(corner_atlas), search_level,
        template, pred_pos_l0, range_l0, max_range_l0, exhaustive, max_ssd,
    )


def subpix_refine(cur_atlas, search_level, template, pos_l0,
                  n_its: int = 10, conv_limit: float = 0.03):
    return subpix_refine_w(
        make_window_fn(cur_atlas), search_level, template, pos_l0, n_its,
        conv_limit,
    )
