"""Per-frame feature preparation: the MakeKeyFrame_Lite/_Rest analogue.

One jitted, camera-batched computation produces everything the tracker and
map-maker need from a frame (reference: src/KeyFrame.cc:145-537):

  * 4-level pyramid packed as an atlas (ops/atlas.py);
  * FAST-10 score images -> adaptive per-level thresholds -> dense corner
    indicator atlas (replaces vCorners + row LUT);
  * nonmax-suppressed, mask- and border-filtered candidate lists per level
    (fixed capacity top-k, replaces vCandidates);
  * glare + static masks;
  * SmallBlurryImage template + gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mcptam_tpu.config import (
    LEVELS, MAX_CANDIDATES_PER_LEVEL, FeatureConfig, DEFAULT_FEATURES,
)
from mcptam_tpu.ops.pyramid import build_pyramid
from mcptam_tpu.ops.fast import (
    adaptive_threshold_from_freq, select_corners_cutoff, cutoff_from_freq,
)
from mcptam_tpu.ops.fast_pallas import fast_frontend_auto
from mcptam_tpu.ops.atlas import build_atlas
from mcptam_tpu.ops.sbi import make_sbi, sbi_gradients

CANDIDATE_BORDER = 10  # ref KeyFrame.cc:402 in_image_with_border(ir, 10)


@struct.dataclass
class FrameFeatures:
    atlas: jnp.ndarray          # (C,H,AW) f32 pyramid atlas
    corner_atlas: jnp.ndarray   # (C,H,AW) f32 0/1 thresholded FAST corners
    thresholds: jnp.ndarray     # (C,LEVELS) chosen FAST thresholds
    corner_counts: jnp.ndarray  # (C,LEVELS) number of corners per level
    cand_xy: tuple              # per level: (C,K_l,2) int32 level coords
    cand_score: tuple           # per level: (C,K_l)
    cand_valid: tuple           # per level: (C,K_l) bool
    sbi: jnp.ndarray            # (C,ROWS,COLS)
    sbi_gx: jnp.ndarray
    sbi_gy: jnp.ndarray


def glare_mask(img: jnp.ndarray, radius: int = 2, iters: int = 5,
               thresh: float = 245.0) -> jnp.ndarray:
    """True where usable (not glare).  Mirrors the reference's 5x5-ellipse
    dilate x5 then threshold>245 inverted (src/KeyFrame.cc:214-220)."""
    d = img
    for _ in range(iters):
        m = d
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dy == 0 and dx == 0:
                    continue
                if abs(dy) + abs(dx) > radius + 1:  # rough ellipse
                    continue
                m = jnp.maximum(m, jnp.roll(d, (dy, dx), axis=(-2, -1)))
        d = m
    return d <= thresh


def _border_mask(H, W, border):
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )


def make_frame_features(
    images: jnp.ndarray,
    static_masks: jnp.ndarray | None = None,
    fcfg: FeatureConfig = DEFAULT_FEATURES,
    glare_masking: bool = False,
) -> FrameFeatures:
    """images: (C,H,W) float32 [0,255].  static_masks: (C,H,W) bool or None.

    Fully jit-compatible; all caps static.
    """
    C, H, W = images.shape
    # accept uint8 camera frames directly (4x less host->device traffic
    # than f32; the reference's CVD::Image<byte> is likewise byte-valued)
    images = images.astype(jnp.float32)
    pyr = build_pyramid(images)  # tuple of (C,h,w)

    # masks per level: static mask downsampled + glare
    masks = []
    for l in range(LEVELS):
        m = jnp.ones_like(pyr[l], bool)
        if static_masks is not None:
            sm = static_masks
            for _ in range(l):
                sm = sm[..., ::2, ::2]
            m = m & sm
        if glare_masking:
            m = m & glare_mask(pyr[l])
        masks.append(m)

    # fused Pallas front-end (ops/fast_pallas.py): FAST score + 3x3 nonmax
    # + cumulative threshold histogram in ONE read-once pass per level
    # (the separate score/threshold/nonmax ops cost ~13 GB of HBM/frame)
    fronts = [fast_frontend_auto(pyr[l]) for l in range(LEVELS)]
    scores = [f[0] for f in fronts]

    thresholds = []
    corner_maps = []
    counts = []
    for l in range(LEVELS):
        if fcfg.adaptive_thresh:
            h, w = scores[l].shape[-2:]
            t = adaptive_threshold_from_freq(
                fronts[l][2], h * w, fcfg.min_fast_thresh,
                fcfg.max_fast_thresh, fcfg.adapt_target_divisor,
            )  # (C,)
        else:
            t = jnp.full((C,), float(fcfg.fixed_thresholds[l]))
        cm = (scores[l] > t[:, None, None] - 1e-6) & masks[l]
        thresholds.append(t)
        corner_maps.append(cm)
        counts.append(jnp.sum(cm, axis=(-2, -1)))

    atlas = build_atlas(pyr)
    corner_atlas = build_atlas([m.astype(jnp.float32) for m in corner_maps])

    # candidates: nonmax-suppressed corners above a capacity-adapted score
    # cutoff (the reference's "thresh" candidate criterion,
    # src/KeyFrame.cc:363-452).  The cutoff comes from the fused kernel's
    # nonmax histogram so the survivor count provably fits the static
    # capacity, and the selection is a raster-order cumsum compaction —
    # no runtime sort anywhere in the front-end.  (The reference masks
    # before nonmax; masking after only differs when a masked-out pixel
    # would have suppressed a kept corner at a mask boundary.)
    cand_xy, cand_score, cand_valid = [], [], []
    for l in range(LEVELS):
        k = min(MAX_CANDIDATES_PER_LEVEL[l], (H >> l) * (W >> l))
        h, w = scores[l].shape[-2:]
        border = _border_mask(h, w, CANDIDATE_BORDER)
        cutoff = cutoff_from_freq(fronts[l][3], thresholds[l], k)  # (C,)
        xy, vals, valid = jax.vmap(
            lambda nm_c, m_c, cut_c, t_c: select_corners_cutoff(
                nm_c, m_c, cut_c, k, floor=t_c
            )
        )(fronts[l][1], masks[l] & border, cutoff, thresholds[l])
        cand_xy.append(xy)
        cand_score.append(vals)
        cand_valid.append(valid)

    sbi = make_sbi(images)
    gx, gy = sbi_gradients(sbi)

    return FrameFeatures(
        atlas=atlas,
        corner_atlas=corner_atlas,
        thresholds=jnp.stack(thresholds, axis=-1),
        corner_counts=jnp.stack(counts, axis=-1),
        cand_xy=tuple(cand_xy),
        cand_score=tuple(cand_score),
        cand_valid=tuple(cand_valid),
        sbi=sbi,
        sbi_gx=gx,
        sbi_gy=gy,
    )
