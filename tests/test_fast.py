"""Feature-detection golden tests: vectorized FAST-10 vs a naive reference
implementation, pyramid, nonmax, Shi-Tomasi, adaptive threshold."""

import numpy as np
import jax.numpy as jnp

from mcptam_tpu.ops.fast import (
    RING_OFFSETS, fast_score_image, nonmax_3x3, shi_tomasi_image,
    adaptive_threshold, topk_corners,
)
from mcptam_tpu.ops.pyramid import half_sample, build_pyramid


def naive_fast10_is_corner(img, y, x, t):
    """Textbook FAST-10 segment test (the definition libCVD implements)."""
    c = img[y, x]
    ring = np.array([img[y + dy, x + dx] for dy, dx in RING_OFFSETS])
    for start in range(16):
        idx = [(start + i) % 16 for i in range(10)]
        if np.all(ring[idx] > c + t):
            return True
        if np.all(ring[idx] < c - t):
            return True
    return False


def naive_fast10_score(img, y, x):
    """Max t such that the segment test passes (score semantics: corner
    at threshold t iff score > t)."""
    c = img[y, x]
    ring = np.array([img[y + dy, x + dx] for dy, dx in RING_OFFSETS])
    best = 0.0
    for start in range(16):
        idx = [(start + i) % 16 for i in range(10)]
        best = max(best, np.min(ring[idx] - c), np.min(c - ring[idx]))
    return max(best, 0.0)


def test_ring_offsets_radius3():
    assert len(RING_OFFSETS) == 16
    assert len(set(RING_OFFSETS)) == 16
    for dy, dx in RING_OFFSETS:
        r = np.hypot(dy, dx)
        assert 2.8 <= r <= 3.2


def test_fast_score_matches_naive(rng):
    img = rng.uniform(0, 255, (32, 40)).astype(np.float32)
    score = np.asarray(fast_score_image(jnp.asarray(img)))
    for y in range(3, 29):
        for x in range(3, 37):
            expected = naive_fast10_score(img, y, x)
            assert abs(score[y, x] - expected) < 1e-3, (y, x, score[y, x], expected)


def test_fast_detects_synthetic_corner():
    img = np.zeros((24, 24), np.float32)
    img[8:16, 8:16] = 200.0  # bright square: corners at its 4 corners
    score = np.asarray(fast_score_image(jnp.asarray(img)))
    assert score[8, 8] > 10
    # center of a flat region is not a corner
    assert score[12, 12] == 0
    # edge midpoint is not a FAST-10 corner (only ~8 contiguous differ)
    assert score[8, 12] == 0


def test_fast_border_zero(rng):
    img = rng.uniform(0, 255, (16, 16)).astype(np.float32)
    score = np.asarray(fast_score_image(jnp.asarray(img)))
    assert np.all(score[:3, :] == 0)
    assert np.all(score[:, -3:] == 0)


def test_nonmax(rng):
    img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    score = fast_score_image(jnp.asarray(img))
    nm = np.asarray(nonmax_3x3(score))
    s = np.asarray(score)
    ys, xs = np.nonzero(nm)
    for y, x in zip(ys, xs):
        window = s[y - 1 : y + 2, x - 1 : x + 2]
        assert nm[y, x] == window.max()
    # every pixel that strictly dominates its neighborhood is kept
    for y in range(4, 28):
        for x in range(4, 28):
            w = s[y - 1 : y + 2, x - 1 : x + 2].copy()
            center = w[1, 1]
            w[1, 1] = -1
            if center > 0 and center > w.max():
                assert nm[y, x] == center


def test_shi_tomasi_flat_vs_corner():
    img = np.zeros((32, 32), np.float32)
    img[10:22, 10:22] = 100.0
    st = np.asarray(shi_tomasi_image(jnp.asarray(img), radius=3))
    assert st[10, 10] > st[10, 16]  # corner beats edge
    assert st[10, 16] >= st[16, 16]  # edge beats flat
    assert st[5, 5] < 1e-3  # flat region ~0


def test_adaptive_threshold_range(rng):
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    score = fast_score_image(jnp.asarray(img))
    t = float(adaptive_threshold(score, 5, 60))
    assert 5 <= t <= 60


def test_adaptive_threshold_knee_monotone(rng):
    """Threshold should be higher on noisy images than on clean ones."""
    clean = np.zeros((64, 64), np.float32)
    clean[20:40, 20:40] = 150.0
    noisy = clean + rng.uniform(0, 80, clean.shape).astype(np.float32)
    t_clean = float(adaptive_threshold(fast_score_image(jnp.asarray(clean)), 5, 60))
    t_noisy = float(adaptive_threshold(fast_score_image(jnp.asarray(noisy)), 5, 60))
    assert t_noisy >= t_clean


def test_topk_corners(rng):
    img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    score = fast_score_image(jnp.asarray(img))
    xy, vals, valid = topk_corners(score, 16, min_score=5.0)
    s = np.asarray(score)
    assert np.all(np.diff(np.asarray(vals)) <= 1e-6)  # descending
    for i in range(16):
        if valid[i]:
            x, y = np.asarray(xy)[i]
            assert s[y, x] == float(vals[i])
            assert s[y, x] > 5.0


def test_half_sample():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    hs = np.asarray(half_sample(img))
    assert hs.shape == (2, 2)
    assert hs[0, 0] == (0 + 1 + 4 + 5) / 4.0


def test_build_pyramid_shapes(rng):
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
    pyr = build_pyramid(img)
    assert [p.shape for p in pyr] == [(480, 640), (240, 320), (120, 160), (60, 80)]
    # batched
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 480, 640)), jnp.float32)
    pyr = build_pyramid(imgs)
    assert pyr[3].shape == (4, 60, 80)
