"""MiniPatch: unwarped 9x9 SSD patch search + temporal candidate
stability filtering.

Re-implements the reference MiniPatch (src/MiniPatch.cc:61-127 — plain
SSD over a radius, max SSD 9999) and its main consumer, the candidate
stability test in MakeKeyFrame_Rest (src/KeyFrame.cc:456-529): each
candidate corner is tracked into the previous frame and back; survivors
must return within 2 px.  Both are dense, fixed-shape window searches
(no corner lists), vmapped over candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import LEVELS

MINI_HALF = 4                  # 9x9 patch (ref MiniPatch.h mnHalfPatchSize)
MINI_SIZE = 2 * MINI_HALF + 1
MAX_SSD = 9999.0               # ref src/MiniPatch.cc:124-127
STABILITY_RADIUS = 10          # search radius (level px)
RETURN_TOL = 2.0               # round-trip acceptance (ref KeyFrame.cc:456-529)


def _window(img, y0, x0, size):
    win = jax.lax.dynamic_slice(img, (y0, x0), size)
    H, W = img.shape
    ok = (y0 >= 0) & (x0 >= 0) & (y0 + size[0] <= H) & (x0 + size[1] <= W)
    return win, ok


def mini_template(img, xy):
    """9x9 template centered at integer xy = (x, y)."""
    xi = jnp.round(xy[0]).astype(jnp.int32)
    yi = jnp.round(xy[1]).astype(jnp.int32)
    return _window(img, yi - MINI_HALF, xi - MINI_HALF, (MINI_SIZE, MINI_SIZE))


def mini_search(img, template, pred_xy, radius: int = STABILITY_RADIUS,
                max_ssd: float = MAX_SSD):
    """Plain-SSD search of `template` around pred_xy (ref FindPatch,
    src/MiniPatch.cc:61-113).  Dense window (every offset), fixed shapes.

    Returns (found bool, xy (2,) f32, ssd f32)."""
    S = 2 * radius + 1
    G = S + MINI_SIZE - 1
    cxi = jnp.round(pred_xy[0]).astype(jnp.int32)
    cyi = jnp.round(pred_xy[1]).astype(jnp.int32)
    y0 = cyi - radius - MINI_HALF
    x0 = cxi - radius - MINI_HALF
    region, rok = _window(img, y0, x0, (G, G))

    ssd = sum(
        (region[py : py + S, px : px + S] - template[py, px]) ** 2
        for py in range(MINI_SIZE)
        for px in range(MINI_SIZE)
    )
    H, W = img.shape
    d = jnp.arange(S) - radius
    yy = cyi + d[:, None]
    xx = cxi + d[None, :]
    in_b = (
        (yy >= MINI_HALF) & (yy < H - MINI_HALF)
        & (xx >= MINI_HALF) & (xx < W - MINI_HALF)
    )
    ssd = jnp.where(in_b & rok, ssd, jnp.inf)
    best = jnp.argmin(ssd.reshape(-1))
    by, bx = best // S, best % S
    best_ssd = ssd.reshape(-1)[best]
    found = best_ssd < max_ssd
    xy = jnp.stack([
        (cxi + bx - radius).astype(jnp.float32),
        (cyi + by - radius).astype(jnp.float32),
    ])
    return found, xy, best_ssd


def stability_filter(prev_img, cur_img, cand_xy, cand_valid,
                     radius: int = STABILITY_RADIUS,
                     tol: float = RETURN_TOL):
    """Temporal round-trip stability of candidates (ref KeyFrame.cc:456-529):
    track cur->prev->cur with MiniPatch; keep candidates returning within
    `tol` px.  prev_img/cur_img: (h,w) same level; cand_xy (K,2) level
    coords.  Returns the pruned validity mask (K,)."""

    def per_cand(xy, ok):
        t_cur, t_ok = mini_template(cur_img, xy.astype(jnp.float32))
        f1, xy_prev, _ = mini_search(prev_img, t_cur, xy.astype(jnp.float32), radius)
        t_prev, tp_ok = mini_template(prev_img, xy_prev)
        f2, xy_back, _ = mini_search(cur_img, t_prev, xy_prev, radius)
        err = jnp.linalg.norm(xy_back - xy.astype(jnp.float32))
        return ok & t_ok & tp_ok & f1 & f2 & (err <= tol)

    return jax.vmap(per_cand)(cand_xy, cand_valid)


def filter_frame_candidates(prev_feats, feats):
    """Apply the stability filter to every level/camera of a FrameFeatures
    pair (prev frame, current frame).  Returns feats with pruned
    cand_valid.  Uses the atlas planes directly."""
    from mcptam_tpu.ops.atlas import atlas_xoff, _level0_width_from_atlas
    from mcptam_tpu.config import LEVELS

    C, H, AW = feats.atlas.shape
    W0 = _level0_width_from_atlas(AW)
    xoffs = atlas_xoff(W0)  # static python ints
    new_valid = []
    for l in range(LEVELS):
        h, w = H >> l, W0 >> l
        xo = int(xoffs[l])
        prev_l = prev_feats.atlas[:, :h, xo : xo + w]
        cur_l = feats.atlas[:, :h, xo : xo + w]
        nv = jax.vmap(stability_filter)(
            prev_l, cur_l, feats.cand_xy[l].astype(jnp.float32),
            feats.cand_valid[l],
        )
        new_valid.append(nv)
    return feats.replace(cand_valid=tuple(new_valid))
