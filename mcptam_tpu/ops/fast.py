"""Vectorized FAST-10 corner detection, scoring, nonmax, Shi-Tomasi.

TPU-native replacement for libCVD's SSE ``fast_corner_detect_10`` /
``fast_corner_score_10`` / ``fast_nonmax`` used by the reference's keyframe
pipeline (src/KeyFrame.cc:259-342,386-421) and for
``FindShiTomasiScoreAtPoint`` (src/ShiTomasi.cc:34-63).

The segment test ("are >=10 contiguous of the 16 ring pixels all brighter
than center+t / darker than center-t") is branch-free here: for every pixel
we compute the ring differences, then the max-over-16-arcs of the
min-over-10-contiguous differences via a log-composed sliding circular
minimum.  The resulting *score image*

    score(p) = max( max_arc min_i (ring_i - c),  max_arc min_i (c - ring_i) )

satisfies ``is_corner(p, t) == score(p) > t`` — the same max-threshold score
semantics as ``fast_corner_score_10`` — and one score image serves
detection at any threshold, the adaptive-threshold histogram, and nonmax
suppression, with no per-corner lists on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from 12 o'clock, in (dy, dx)
# (same ring as libCVD's FAST-10; y axis points down).
RING_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 10
BORDER = 3


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so out[y, x] = img[y+dy, x+dx]; out-of-range filled with 0.
    Works on (...,H,W)."""
    out = jnp.roll(img, shift=(-dy, -dx), axis=(-2, -1))
    return out  # callers zero the border anyway


def _circular_window_min(d: jnp.ndarray) -> jnp.ndarray:
    """d: (...,16) ring values -> (...,16) where out[...,a] = min over the
    10 contiguous entries starting at a (circular).  Log-composed rolls."""
    m1 = d
    m2 = jnp.minimum(m1, jnp.roll(m1, -1, axis=-1))
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=-1))
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=-1))
    # window of 10 = window8 at a, window2 at a+8
    return jnp.minimum(m8, jnp.roll(m2, -8, axis=-1))


def fast_score_image(img: jnp.ndarray) -> jnp.ndarray:
    """FAST-10 max-threshold score for every pixel of (...,H,W) float image.

    score > t  <=>  pixel passes the FAST-10 segment test at threshold t.
    Border (3 px) scores are 0.
    """
    rings = jnp.stack(
        [_shift2d(img, dy, dx) for (dy, dx) in RING_OFFSETS], axis=-1
    )  # (...,H,W,16)
    d = rings - img[..., None]
    bright = _circular_window_min(d)            # min over arc of (ring - c)
    dark = _circular_window_min(-d)             # min over arc of (c - ring)
    score = jnp.maximum(
        jnp.max(bright, axis=-1), jnp.max(dark, axis=-1)
    )
    score = jnp.maximum(score, 0.0)
    # zero the border where the ring wraps garbage
    H, W = img.shape[-2], img.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (
        (ys >= BORDER) & (ys < H - BORDER) & (xs >= BORDER) & (xs < W - BORDER)
    )
    return jnp.where(inb, score, 0.0)


def adaptive_threshold(
    score: jnp.ndarray,
    min_thresh: int = 5,
    max_thresh: int = 60,
    target_divisor: float = 500.0,
) -> jnp.ndarray:
    """Knee-point adaptive FAST threshold (src/KeyFrame.cc:247-316).

    freq[t] = number of pixels with score >= t for t in [min, max]; walk up
    from min_thresh and stop at the first t whose (central-difference)
    derivative exceeds ``-H*W/target_divisor``.  Returns a scalar float
    threshold (traced).
    """
    H, W = score.shape[-2], score.shape[-1]
    ts = jnp.arange(min_thresh, max_thresh + 1, dtype=score.dtype)
    # corner at thresh t <=> score > t - matching detect semantics; the
    # reference's histogram uses score >= t with integer scores, identical
    # for integer-valued images.
    flat = score.reshape(score.shape[:-2] + (H * W,))
    freq = jnp.sum(flat[..., None, :] > ts[:, None] - 1e-6, axis=-1).astype(
        score.dtype
    )  # (...,T)
    n = ts.shape[0]
    deriv = jnp.concatenate(
        [
            (freq[..., 1:2] - freq[..., 0:1]),
            (freq[..., 2:] - freq[..., :-2]) * 0.5,
            (freq[..., -1:] - freq[..., -2:-1]),
        ],
        axis=-1,
    )
    target = -(H * W) / target_divisor
    exceeded = deriv > target  # stop condition per threshold
    # first index where exceeded; if none, use the last
    idx = jnp.argmax(exceeded, axis=-1)
    idx = jnp.where(jnp.any(exceeded, axis=-1), idx, n - 1)
    return ts[idx]


def adaptive_threshold_from_freq(
    freq: jnp.ndarray,
    n_pixels: int,
    min_thresh: int = 5,
    max_thresh: int = 60,
    target_divisor: float = 500.0,
) -> jnp.ndarray:
    """Knee-point threshold from a precomputed cumulative histogram.

    freq: (..., NBINS) with freq[..., t] = #(score > t) (as produced by
    ops/fast_pallas.fast_frontend) — the bandwidth-lean replacement for
    ``adaptive_threshold``'s (T, H*W) broadcast compare.  Same knee walk
    as src/KeyFrame.cc:247-316.
    """
    f = freq[..., min_thresh : max_thresh + 1].astype(jnp.float32)
    n = f.shape[-1]
    deriv = jnp.concatenate(
        [
            (f[..., 1:2] - f[..., 0:1]),
            (f[..., 2:] - f[..., :-2]) * 0.5,
            (f[..., -1:] - f[..., -2:-1]),
        ],
        axis=-1,
    )
    target = -n_pixels / target_divisor
    exceeded = deriv > target
    idx = jnp.argmax(exceeded, axis=-1)
    idx = jnp.where(jnp.any(exceeded, axis=-1), idx, n - 1)
    return (min_thresh + idx).astype(jnp.float32)


def nonmax_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep scores that are strict maxima of their 3x3 neighborhood (ties
    broken towards the raster-first pixel), zero elsewhere.  Replaces
    CVD::fast_nonmax."""
    H, W = score.shape[-2], score.shape[-1]
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append((_shift2d(score, dy, dx), dy, dx))
    keep = jnp.ones(score.shape, bool)
    for s, dy, dx in neigh:
        earlier = (dy < 0) or (dy == 0 and dx < 0)
        if earlier:  # earlier pixel wins ties
            keep &= score > s
        else:
            keep &= score >= s
    return jnp.where(keep, score, 0.0)


def shi_tomasi_image(img: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Min-eigenvalue corner score at every pixel over a (2r+1)^2 box
    (src/ShiTomasi.cc:34-63: gradients are central differences of
    half-pixel steps, score normalized by 2*box area)."""
    gx = 0.5 * (_shift2d(img, 0, 1) - _shift2d(img, 0, -1))
    gy = 0.5 * (_shift2d(img, 1, 0) - _shift2d(img, -1, 0))
    gxx, gyy, gxy = gx * gx, gy * gy, gx * gy

    def box(a):
        # separable box sum over (2r+1)
        for axis in (-2, -1):
            acc = a
            for s in range(1, radius + 1):
                acc = acc + jnp.roll(a, s, axis=axis) + jnp.roll(a, -s, axis=axis)
            a = acc
        return a

    sxx, syy, sxy = box(gxx), box(gyy), box(gxy)
    n = (2 * radius + 1) ** 2
    tr = sxx + syy
    det_part = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det_part) / (2.0 * n)


def select_corners_cutoff(nm: jnp.ndarray, mask: jnp.ndarray, cutoff,
                          k: int, floor=None):
    """Sort-free candidate selection: all nonmax corners with score above
    ``cutoff`` (chosen from the freq_nm histogram so the count fits the
    static capacity k), compacted in raster order.

    This is the reference's "thresh" candidate criterion
    (src/KeyFrame.cc:363-452) with the threshold adapted to the capacity —
    a TPU top_k instantiates ~3 MB of unrolled sort code per call site and
    dominates both executable size and slow-path dispatch; the cumsum
    compaction here is a handful of vector ops.

    nm: (H,W) nonmax-suppressed scores; mask: (H,W) candidate mask
    (border/static/glare); cutoff: scalar score threshold; floor: scalar
    hard minimum (the detection threshold) the boundary-bin fill may not
    dip below.
    Returns (xy (k,2) int32, scores (k,), valid (k,)).
    """
    H, W = nm.shape
    if floor is None:
        floor = cutoff - 1.0
    # two tiers: everything above the cutoff (provably <= k of them), then
    # corners in the boundary bin (max(cutoff-1, floor), cutoff] to fill
    # the remaining capacity — top-k parity down to integer-bin
    # granularity, never admitting sub-threshold corners
    m1 = (nm > cutoff - 1e-6).reshape(-1) & mask.reshape(-1)
    m2 = (nm > jnp.maximum(cutoff - 1.0, floor) - 1e-6).reshape(-1) \
        & mask.reshape(-1) & ~m1
    rank1 = jnp.cumsum(m1.astype(jnp.int32)) - 1
    n1 = jnp.sum(m1.astype(jnp.int32))
    rank2 = n1 + jnp.cumsum(m2.astype(jnp.int32)) - 1
    rank = jnp.where(m1, rank1, rank2)
    sel = (m1 | m2) & (rank < k)
    tgt = jnp.where(sel, rank, k)
    idx = jnp.zeros((k + 1,), jnp.int32).at[tgt].set(
        jnp.arange(H * W, dtype=jnp.int32), mode="drop"
    )[:k]
    n_sel = jnp.minimum(n1 + jnp.sum(m2.astype(jnp.int32)), k)
    valid = jnp.arange(k) < n_sel
    xy = jnp.stack([idx % W, idx // W], axis=-1)
    score = nm.reshape(-1)[idx] * valid
    return xy, score, valid


def cutoff_from_freq(freq_nm: jnp.ndarray, thresholds: jnp.ndarray, k: int):
    """Smallest integer cutoff >= threshold whose surviving-corner count
    (from the cumulative nonmax histogram freq_nm (...,NBINS)) fits k.

    Masks only ever REMOVE corners, so #survivors <= freq_nm[cutoff] <= k
    guarantees the compaction never overflows capacity."""
    nbins = freq_nm.shape[-1]
    t_axis = jnp.arange(nbins, dtype=jnp.float32)
    fits = (freq_nm <= k) & (t_axis >= jnp.ceil(thresholds)[..., None])
    has = jnp.any(fits, axis=-1)
    first = jnp.argmax(fits, axis=-1)
    cut = jnp.where(has, first, nbins - 1).astype(jnp.float32)
    return jnp.maximum(cut, thresholds)


def topk_corners_blocked(score: jnp.ndarray, k: int,
                         min_score: jnp.ndarray | float = 0.0,
                         block: int = 8):
    """Top-k corner extraction with block-local reduction: the image is
    tiled into `block`x`block` cells, each cell contributes at most its max
    pixel, and top_k runs over cells only.

    A full-image jax.lax.top_k over H*W elements is a sort — one of the
    slowest ops on TPU.  The cell reduction is a pure VPU reshape+max and
    shrinks the sort by block^2 while *improving* spatial spread (the
    reference thins candidates near each other anyway,
    src/MapMakerServerBase.cc:411-447).

    Returns (xy (k,2) int32, scores (k,), valid (k,)).
    """
    H, W = score.shape[-2], score.shape[-1]
    Hb, Wb = H // block, W // block
    s = score[..., : Hb * block, : Wb * block]
    cells = s.reshape(Hb, block, Wb, block).transpose(0, 2, 1, 3).reshape(
        Hb, Wb, block * block
    )
    cell_max = jnp.max(cells, axis=-1)                    # (Hb,Wb)
    cell_arg = jnp.argmax(cells, axis=-1).astype(jnp.int32)
    k_eff = min(k, Hb * Wb)
    vals, idx = jax.lax.top_k(cell_max.reshape(-1), k_eff)
    by = idx // Wb
    bx = idx % Wb
    sub = cell_arg.reshape(-1)[idx]
    ys = by * block + sub // block
    xs = bx * block + sub % block
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.int32)
    valid = vals > jnp.asarray(min_score, score.dtype)
    if k_eff < k:  # pad to the static capacity
        pad = k - k_eff
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return xy, vals, valid


def topk_corners(score: jnp.ndarray, k: int, min_score: jnp.ndarray | float = 0.0):
    """Extract the top-k scoring pixels of an (H,W) score image as a
    fixed-capacity corner list.

    Returns (xy (k,2) int32, scores (k,), valid (k,)) — the masked-array
    replacement for the reference's per-level std::vector<ImageRef> +
    row LUT (src/KeyFrame.cc:348-355).  Exact top-k: approximate variants
    (approx_max_k, block-local maxima) measurably degrade epipolar map
    quality — they drop locally-clustered strong corners.
    """
    H, W = score.shape[-2], score.shape[-1]
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    ys = idx // W
    xs = idx % W
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.int32)
    valid = vals > jnp.asarray(min_score, score.dtype)
    return xy, vals, valid
