"""Batched, lane-aligned patch search: the tracker's hot path.

The per-pair formulation in ops/patch.py (vmapped scalar program) leaves
the VPU lanes mostly idle: every intermediate is (K, S, S) with S≈21-29 in
the lane (last) dimension, so at most S of 128 lanes are active.  This
module restructures the search with the PAIR axis last — (S, S, K) — so
every elementwise/reduction op runs K-wide (K is 1000+ in the fine
stage), and replaces all in-window interpolation gathers with
hat-function-weighted contractions (TPU gathers are the slow path).

Stages (reference: src/PatchFinder.cc):
  * warped 8x8 template via separable hat sampling of the source window
    (MakeTemplateCoarseCont, :135-182);
  * dense ZMSSD over every offset of a (G,G) window using 8-tap box sums
    + a 64-tap cross-correlation accumulate (FindPatchCoarse + the SSE
    ZMSSD kernel, :229-355, :491-658);
  * inverse-composition subpixel refinement on a once-gathered window
    with hat-weight resampling (IterateSubPixToConvergence, :396-470).

Window *gathers* stay (K, G, G) batched dynamic slices — measured optimal
on TPU — and only the compute is transposed to K-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import PATCH_SIZE
from mcptam_tpu.core.levels import level_n_pos, level_zero_pos
from mcptam_tpu.core.linalg import inv3
from mcptam_tpu.ops.atlas import level_xoff_array, level_size_arrays, _level0_width_from_atlas
from mcptam_tpu.ops.patch import MAX_SSD, PACK_CORNER, HALF, _SUBPIX_PAD

_SRC_HALF = 12  # template source window half-size (ops/patch.py)


# ---------------------------------------------------------------------------
# Batched window gathers
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    from mcptam_tpu.backend import use_pallas
    return use_pallas()


def _gather_plane(plane2d, rows, cols, G: int):
    """(HH,AW) plane + (K,) window starts -> (K,G,G).  DMA-pipelined
    Pallas kernel on TPU (XLA's per-slice gather costs ~2.5us/window);
    batched dynamic_slice elsewhere.  The kernel's scratch/roll path is
    f32-tiled, so non-f32 planes (uint8 keyframe atlases) take the slice
    path."""
    if _use_pallas() and plane2d.dtype == jnp.float32:
        from mcptam_tpu.ops.pallas_gather import gather_windows_pallas
        K = rows.shape[0]
        block = 128 if K >= 128 else 64
        pad = (-K) % block
        if pad:  # e.g. the 1000-pair fine stage: pad, gather, slice back
            rows = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)])
            cols = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
        return gather_windows_pallas(plane2d, rows, cols, G, block)[:K]

    def per(r, c):
        return jax.lax.dynamic_slice(plane2d, (r, c), (G, G))

    return jax.vmap(per)(rows, cols)


def gather_windows3(atlas3, cam_idx, level, y0, x0, G: int):
    """(K,) indices into a (C,H,AW) atlas -> ((K,G,G) f32, (K,) ok).
    y0/x0 are level-local coords; the level x-offset is added here."""
    C, H, AW = atlas3.shape
    xoffs = level_xoff_array(_level0_width_from_atlas(AW))
    ax0 = x0 + xoffs[level]
    ok = (y0 >= 0) & (ax0 >= 0) & (y0 + G <= H) & (ax0 + G <= AW)
    rows = cam_idx * H + jnp.clip(y0, 0, H - G)
    cols = jnp.clip(ax0, 0, AW - G)
    win = _gather_plane(atlas3.reshape(C * H, AW), rows, cols, G)
    return win.astype(jnp.float32), ok


def gather_windows4(atlas4, mkf_idx, cam_idx, level, y0, x0, G: int):
    """(K,) indices into the (M,C,H,AW) keyframe store."""
    M, C, H, AW = atlas4.shape
    xoffs = level_xoff_array(_level0_width_from_atlas(AW))
    ax0 = x0 + xoffs[level]
    ok = (y0 >= 0) & (ax0 >= 0) & (y0 + G <= H) & (ax0 + G <= AW)
    rows = (mkf_idx * C + cam_idx) * H + jnp.clip(y0, 0, H - G)
    cols = jnp.clip(ax0, 0, AW - G)
    win = _gather_plane(atlas4.reshape(M * C * H, AW), rows, cols, G)
    return win.astype(jnp.float32), ok


# ---------------------------------------------------------------------------
# Hat-weight sampling helpers
# ---------------------------------------------------------------------------

def _hat(x, n):
    """(...,) coords -> (..., n) triangle (bilinear) weights over 0..n-1."""
    anchors = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - anchors))


# ---------------------------------------------------------------------------
# Warped templates (batched)
# ---------------------------------------------------------------------------

def make_warped_templates(src_win, win_ok, level_hw, src_level,
                          src_center_xy, warp_inv, search_level):
    """(K,...) inputs -> (templates (K,8,8), ok (K,)).

    src_win: (K, 2*_SRC_HALF+2, 2*_SRC_HALF+2) source patch windows (the
    per-point snapshots stored at point creation, map.state
    PointArrays.src_window) with win_ok their validity.  Sampling matrix
    m2 = inv(warp_inv) * 2^search_level (source-level px per template px);
    samples via separable hat contraction instead of a bilinear gather."""
    K = src_level.shape[0]
    det = (warp_inv[:, 0, 0] * warp_inv[:, 1, 1]
           - warp_inv[:, 0, 1] * warp_inv[:, 1, 0])
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = jnp.stack([
        jnp.stack([warp_inv[:, 1, 1], -warp_inv[:, 0, 1]], -1),
        jnp.stack([-warp_inv[:, 1, 0], warp_inv[:, 0, 0]], -1),
    ], axis=1) / det_safe[:, None, None]
    m2 = inv * (2.0 ** search_level.astype(jnp.float32))[:, None, None]

    cx = src_center_xy[:, 0]
    cy = src_center_xy[:, 1]
    cxi = jnp.floor(cx).astype(jnp.int32)
    cyi = jnp.floor(cy).astype(jnp.int32)
    S = 2 * _SRC_HALF + 2
    win = src_win.astype(jnp.float32)

    off = jnp.arange(PATCH_SIZE, dtype=jnp.float32) - HALF
    oy = off[:, None]
    ox = off[None, :]
    sx = (m2[:, 0, 0, None, None] * ox + m2[:, 0, 1, None, None] * oy
          + (cx - cxi)[:, None, None] + _SRC_HALF)           # (K,8,8)
    sy = (m2[:, 1, 0, None, None] * ox + m2[:, 1, 1, None, None] * oy
          + (cy - cyi)[:, None, None] + _SRC_HALF)

    inside = (sx >= 0) & (sx <= S - 2) & (sy >= 0) & (sy <= S - 2)
    sxc = jnp.clip(sx, 0.0, S - 1.0)
    syc = jnp.clip(sy, 0.0, S - 1.0)
    # separable hat contraction: t[k,i,j] = hy[k,i,j,:] @ win[k] @ hx[k,i,j,:]
    hy = _hat(syc.reshape(K, -1), S)                          # (K,64,S)
    hx = _hat(sxc.reshape(K, -1), S)
    z = jnp.einsum("ksa,kab->ksb", hy, win)                   # (K,64,S)
    tmpl = jnp.einsum("ksb,ksb->ks", z, hx).reshape(K, PATCH_SIZE, PATCH_SIZE)

    hs, ws = level_hw
    h_l = hs[src_level].astype(jnp.float32)[:, None, None]
    w_l = ws[src_level].astype(jnp.float32)[:, None, None]
    lx = sx - _SRC_HALF + cxi[:, None, None].astype(jnp.float32)
    ly = sy - _SRC_HALF + cyi[:, None, None].astype(jnp.float32)
    in_level = (lx >= 0) & (lx <= w_l - 2) & (ly >= 0) & (ly <= h_l - 2)
    ok = jnp.all(inside & in_level, axis=(1, 2)) & win_ok & (jnp.abs(det) > 1e-12)
    return tmpl, ok


# ---------------------------------------------------------------------------
# Dense ZMSSD search (K-last)
# ---------------------------------------------------------------------------

def find_patches(packed_atlas3, level_hw, cam_idx, search_level, templates,
                 pred_pos_l0, range_l0: int, max_range_l0,
                 exhaustive: bool = False, max_ssd: float = MAX_SSD):
    """Batched FindPatchCoarse over K pairs.

    packed_atlas3: pack_corner_atlas(atlas, corner_atlas) plane (C,H,AW).
    Returns (found (K,), pos_l0 (K,2), best_ssd (K,), aux) where aux
    carries the gathered region + best offsets so the subpixel stage can
    resample WITHOUT its own gather (subpix_refine_region)."""
    K = cam_idx.shape[0]
    lvl_f = search_level.astype(jnp.float32)
    scale = 2.0 ** lvl_f
    pos_lev = level_n_pos(pred_pos_l0, lvl_f[:, None])
    r_lev = jnp.ceil(max_range_l0 / scale)

    R = range_l0
    S = 2 * R + 1
    G = S + PATCH_SIZE
    P = _SUBPIX_PAD
    G2 = G + 2 * P  # padded so the subpix window is inside the region
    cxi = jnp.round(pos_lev[:, 0]).astype(jnp.int32)
    cyi = jnp.round(pos_lev[:, 1]).astype(jnp.int32)
    y0 = cyi - R - HALF
    x0 = cxi - R - HALF
    region_raw, region_ok = gather_windows3(
        packed_atlas3, cam_idx, search_level, y0 - P, x0 - P, G2
    )
    flag2 = region_raw >= PACK_CORNER / 2
    region2 = region_raw - PACK_CORNER * flag2.astype(region_raw.dtype)
    region = region2[:, P : P + G, P : P + G]
    flag = flag2[:, P : P + G, P : P + G]

    # ---- K-last from here on
    reg = jnp.transpose(region, (1, 2, 0))                    # (G,G,K)
    is_corner = jnp.transpose(
        flag[:, HALF : HALF + S, HALF : HALF + S], (1, 2, 0)
    )

    n = PATCH_SIZE * PATCH_SIZE
    t = templates                                              # (K,8,8)
    sum_t = jnp.sum(t, axis=(1, 2))                            # (K,)
    sum_t2 = jnp.sum(t * t, axis=(1, 2))

    def box8(a):  # (G,G,K) -> (S,S,K)
        rows = sum(a[:, px : px + S, :] for px in range(PATCH_SIZE))
        return sum(rows[py : py + S, :, :] for py in range(PATCH_SIZE))

    sum_p = box8(reg)
    sum_p2 = box8(reg * reg)
    # cross-correlation as ONE depthwise conv (K feature groups) instead of
    # 64 shifted multiply-adds — exact, and ~35% faster end-to-end on v5e
    filt = jnp.transpose(t, (1, 2, 0))[:, :, None, :]          # (8,8,1,K)
    cross = jax.lax.conv_general_dilated(
        reg[None], filt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=t.shape[0],
        precision=jax.lax.Precision.HIGHEST,
    )[0][:S, :S]
    scores = sum_p2 - 2.0 * cross + sum_t2 - (sum_p - sum_t) ** 2 / n

    hs, ws = level_hw
    h_l = hs[search_level]
    w_l = ws[search_level]
    d = jnp.arange(S, dtype=jnp.float32) - R
    oy = d[:, None, None]
    ox = d[None, :, None]
    yy = cyi[None, None, :].astype(jnp.float32) + oy           # (S,S,K)
    xx = cxi[None, None, :].astype(jnp.float32) + ox
    dist_ok = (
        (yy - pos_lev[:, 1]) ** 2 + (xx - pos_lev[:, 0]) ** 2
    ) <= (r_lev * r_lev + 1e-6)
    in_bounds = (
        (xx >= HALF) & (yy >= HALF)
        & (xx < w_l.astype(jnp.float32) - HALF)
        & (yy < h_l.astype(jnp.float32) - HALF)
    )
    valid = dist_ok & in_bounds & ((is_corner > 0.5) | exhaustive)
    valid = valid & region_ok[None, None, :]
    scores = jnp.where(valid, scores, jnp.inf)

    flat = scores.reshape(S * S, K)
    best = jnp.argmin(flat, axis=0)                            # (K,)
    best_ssd = jnp.min(flat, axis=0)
    by = best // S
    bx = best % S
    found = best_ssd < max_ssd
    pos_lev_best = jnp.stack(
        [(cxi + bx - R).astype(jnp.float32), (cyi + by - R).astype(jnp.float32)],
        axis=-1,
    )
    pos_l0 = level_zero_pos(pos_lev_best, lvl_f[:, None])
    aux = dict(region2=region2, region_ok=region_ok, by=by, bx=bx, S=S)
    return found, pos_l0, best_ssd, aux


# ---------------------------------------------------------------------------
# Subpixel refinement (batched, gather-once + hat resampling)
# ---------------------------------------------------------------------------

def subpix_refine_region(aux, level_hw, search_level, templates, pos_l0,
                         n_its: int = 10, conv_limit: float = 0.03):
    """Subpixel refinement resampling from the ALREADY-GATHERED search
    region (find_patches aux) — no extra window gather.  The (15,15)
    iteration window is pulled out of the padded region with a separable
    one-hot contraction (gather-free)."""
    region2 = aux["region2"]            # (K, G2, G2) decoded image values
    by, bx, S = aux["by"], aux["bx"], aux["S"]
    WSZ = PATCH_SIZE + 1 + 2 * _SUBPIX_PAD
    reg2T = jnp.transpose(region2, (1, 2, 0))                  # (G2,G2,K)
    ohy = jax.nn.one_hot(by, S, axis=-1)                       # (K,S)
    ohx = jax.nn.one_hot(bx, S, axis=-1)
    rows15 = sum(
        ohy[:, p] * reg2T[p : p + WSZ, :, :] for p in range(S)
    )                                                          # (WSZ,G2,K)
    winT = sum(
        ohx[:, q] * rows15[:, q : q + WSZ, :] for q in range(S)
    )                                                          # (WSZ,WSZ,K)
    return _subpix_iterate(
        winT, aux["region_ok"], level_hw, search_level, templates, pos_l0,
        n_its, conv_limit,
    )


def subpix_refine(atlas3, level_hw, cam_idx, search_level, templates, pos_l0,
                  n_its: int = 10, conv_limit: float = 0.03):
    """Batched inverse-composition refinement with its own window gather.
    Returns (pos_l0 (K,2), converged (K,))."""
    P = _SUBPIX_PAD
    WSZ = PATCH_SIZE + 1 + 2 * P
    lvl_f = search_level.astype(jnp.float32)
    center0 = level_n_pos(pos_l0, lvl_f[:, None])
    base0 = center0 - HALF
    byi0 = jnp.floor(base0[:, 1]).astype(jnp.int32) - P
    bxi0 = jnp.floor(base0[:, 0]).astype(jnp.int32) - P
    win, win_ok = gather_windows3(atlas3, cam_idx, search_level, byi0, bxi0, WSZ)
    winT = jnp.transpose(win, (1, 2, 0))                       # (WSZ,WSZ,K)
    return _subpix_iterate(
        winT, win_ok, level_hw, search_level, templates, pos_l0, n_its,
        conv_limit,
    )


def _subpix_iterate(winT, win_ok, level_hw, search_level, templates, pos_l0,
                    n_its: int, conv_limit: float):
    """Shared inverse-composition loop over a (WSZ,WSZ,K) window stack."""
    K = templates.shape[0]
    lvl_f = search_level.astype(jnp.float32)
    scale = 2.0 ** lvl_f
    hs, ws = level_hw
    h_l = hs[search_level].astype(jnp.float32)
    w_l = ws[search_level].astype(jnp.float32)

    # template gradients + 3x3 inverse Hessians
    gx = 0.5 * (templates[:, 1:-1, 2:] - templates[:, 1:-1, :-2])  # (K,6,6)
    gy = 0.5 * (templates[:, 2:, 1:-1] - templates[:, :-2, 1:-1])
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1).reshape(K, -1, 3)
    Hm = jnp.einsum("kni,knj->kij", J, J) + 1e-6 * jnp.eye(3)
    Hinv = inv3(Hm)

    P = _SUBPIX_PAD
    WSZ = PATCH_SIZE + 1 + 2 * P
    center0 = level_n_pos(pos_l0, lvl_f[:, None])
    base0 = center0 - HALF
    byi0 = jnp.floor(base0[:, 1]).astype(jnp.int32) - P
    bxi0 = jnp.floor(base0[:, 0]).astype(jnp.int32) - P

    SP = PATCH_SIZE
    tmplT = jnp.transpose(templates, (1, 2, 0))                # (SP,SP,K)
    gxT = jnp.transpose(gx, (1, 2, 0))
    gyT = jnp.transpose(gy, (1, 2, 0))
    # hat anchors over window rows/cols: the resample below contracts the
    # (WSZ,WSZ,K) window with per-axis bilinear hat weights directly —
    # an (NS,NS,SP,SP,K) shifted-window stack materializes ~130 MB per
    # solve and dominated the tracker's HBM traffic
    sp_ids = jnp.arange(SP, dtype=jnp.float32)
    w_ids = jnp.arange(WSZ, dtype=jnp.float32)

    def body(_, carry):
        pos, mean_diff, done, ok = carry                       # pos (K,2)
        center = level_n_pos(pos, lvl_f[:, None])
        base = center - HALF
        wy = base[:, 1] - byi0.astype(jnp.float32)
        wx = base[:, 0] - bxi0.astype(jnp.float32)
        off_edge = (
            (center[:, 0] < HALF + 1) | (center[:, 1] < HALF + 1)
            | (center[:, 0] > w_l - HALF - 2) | (center[:, 1] > h_l - HALF - 2)
            | (wy < 0) | (wx < 0)
            | (wy > WSZ - PATCH_SIZE - 2) | (wx > WSZ - PATCH_SIZE - 2)
        )
        # hy2[k,i,r] = hat((wy+i) - r): row weights of template row i over
        # window row r (2 nonzeros per (k,i)); same for columns
        hy2 = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                wy[:, None, None] + sp_ids[None, :, None] - w_ids[None, None, :]
            ),
        )                                                      # (K,SP,WSZ)
        hx2 = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                wx[:, None, None] + sp_ids[None, :, None] - w_ids[None, None, :]
            ),
        )
        z = jnp.einsum("kir,rck->ick", hy2, winT)              # (SP,WSZ,K)
        tgt = jnp.einsum("kjc,ick->ijk", hx2, z)               # (SP,SP,K)
        diff = tgt[1:-1, 1:-1, :] - tmplT[1:-1, 1:-1, :] + mean_diff
        accum = jnp.stack([
            jnp.sum(diff * gxT, axis=(0, 1)),
            jnp.sum(diff * gyT, axis=(0, 1)),
            jnp.sum(diff, axis=(0, 1)),
        ], axis=-1)                                            # (K,3)
        upd = jnp.einsum("kij,kj->ki", Hinv, accum)            # (K,3)
        new_pos = pos - upd[:, :2] * scale[:, None]
        new_mean = mean_diff - upd[:, 2]
        conv = (upd[:, 0] ** 2 + upd[:, 1] ** 2) < conv_limit * conv_limit
        active = ~(done | off_edge)
        pos = jnp.where(active[:, None], new_pos, pos)
        mean_diff = jnp.where(active, new_mean, mean_diff)
        done = done | conv
        ok = ok & ~off_edge
        return pos, mean_diff, done, ok

    init = (
        pos_l0.astype(jnp.float32),
        jnp.zeros(K),
        jnp.zeros(K, bool),
        win_ok,
    )
    pos, _, done, ok = jax.lax.fori_loop(0, n_its, body, init)
    return pos, done & ok
