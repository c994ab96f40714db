"""Patch-search golden tests: atlas packing, ZMSSD, coarse find, subpixel."""

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.config import PATCH_SIZE
from mcptam_tpu.ops.pyramid import build_pyramid
from mcptam_tpu.ops.atlas import build_atlas, atlas_xoff, dynamic_window
from mcptam_tpu.ops.patch import (
    zmssd, find_patch, make_warped_template, unwarped_template,
    subpix_refine, warp_and_search_level, MAX_SSD,
)


def make_textured(rng, H=96, W=128):
    """Random smooth-ish texture with plenty of corners."""
    img = rng.uniform(0, 255, (H // 4, W // 4)).astype(np.float32)
    img = np.kron(img, np.ones((4, 4), np.float32))
    img += rng.uniform(0, 30, (H, W)).astype(np.float32)
    return np.clip(img, 0, 255)


def test_atlas_roundtrip(rng):
    img = jnp.asarray(make_textured(rng))
    pyr = build_pyramid(img)
    atlas = build_atlas(pyr)
    offs = atlas_xoff(img.shape[1])
    for l, p in enumerate(pyr):
        h, w = p.shape
        sub = atlas[:h, offs[l] : offs[l] + w]
        assert np.allclose(sub, p)


def test_dynamic_window(rng):
    img = jnp.asarray(make_textured(rng, 160, 192))  # level3 = 20x24
    pyr = build_pyramid(img)
    atlas = build_atlas(pyr)
    for l in range(4):
        win = dynamic_window(atlas, jnp.asarray(l), jnp.asarray(5), jnp.asarray(7), (8, 8))
        assert np.allclose(win, pyr[l][5:13, 7:15])


def test_zmssd_exact_match_zero(rng):
    t = jnp.asarray(rng.uniform(0, 255, (8, 8)), jnp.float32)
    assert abs(float(zmssd(t, t))) < 1e-2


def test_zmssd_brightness_invariant(rng):
    t = jnp.asarray(rng.uniform(0, 255, (8, 8)), jnp.float32)
    assert abs(float(zmssd(t, t + 37.0))) < 1e-2


def test_zmssd_batched(rng):
    t = jnp.asarray(rng.uniform(0, 255, (8, 8)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 255, (5, 8, 8)), jnp.float32)
    out = zmssd(t, p)
    assert out.shape == (5,)
    for i in range(5):
        ti = np.asarray(t) - np.asarray(t).mean()
        pi = np.asarray(p[i]) - np.asarray(p[i]).mean()
        assert np.allclose(out[i], np.sum((pi - ti) ** 2), rtol=1e-4, atol=0.5)


def test_find_patch_recovers_offset(rng):
    img = make_textured(rng)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    # template = actual content at (40, 50) level 0
    true_xy = np.array([50, 40])
    tmpl = jnp.asarray(img[36:44, 46:54])  # center (50,40): rows 40-4..40+3
    corner_atlas = jnp.ones_like(atlas)  # exhaustive-ish: every pixel a corner
    pred = jnp.asarray([50 - 6.0, 40 + 5.0])  # predict 6px off
    found, pos, ssd = find_patch(
        atlas, corner_atlas, jnp.asarray(0, jnp.int32), tmpl, pred, range_l0=10
    )
    assert bool(found)
    assert np.allclose(np.asarray(pos), true_xy, atol=0.6), pos
    assert float(ssd) < 10.0


def test_find_patch_respects_corner_mask(rng):
    img = make_textured(rng)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    tmpl = jnp.asarray(img[36:44, 46:54])
    corner_atlas = jnp.zeros_like(atlas)  # no corners anywhere -> no match
    pred = jnp.asarray([50.0, 40.0])
    found, pos, ssd = find_patch(
        atlas, corner_atlas, jnp.asarray(0, jnp.int32), tmpl, pred, range_l0=10
    )
    assert not bool(found)


def test_find_patch_at_level(rng):
    img = make_textured(rng, 128, 160)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    lvl = 1
    l1 = np.asarray(pyr[1])
    tmpl = jnp.asarray(l1[20 - 4 : 20 + 4, 30 - 4 : 30 + 4])
    corner_atlas = jnp.ones_like(atlas)
    # level-1 (30,20) in L0 coords: (30+0.5)*2-0.5 = 60.5, (20.5)*2-.5=40.5
    pred = jnp.asarray([60.5 - 4.0, 40.5 + 4.0])
    found, pos, ssd = find_patch(
        atlas, corner_atlas, jnp.asarray(lvl, jnp.int32), tmpl, pred, range_l0=10
    )
    assert bool(found)
    assert np.allclose(np.asarray(pos), [60.5, 40.5], atol=1.1), pos


def test_unwarped_template(rng):
    img = make_textured(rng)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    t, ok = unwarped_template(atlas, jnp.asarray(0, jnp.int32), jnp.asarray([50.0, 40.0]))
    assert bool(ok)
    assert np.allclose(np.asarray(t), img[36:44, 46:54])


def test_warped_template_identity(rng):
    img = make_textured(rng)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    warp_inv = jnp.eye(2)
    t, ok = make_warped_template(
        atlas, jnp.asarray(0, jnp.int32), jnp.asarray([50.0, 40.0]), warp_inv,
        jnp.asarray(0, jnp.int32),
    )
    assert bool(ok)
    assert np.allclose(np.asarray(t), img[36:44, 46:54], atol=1e-3)


def test_warp_and_search_level():
    """A patch seen from 2x farther away projects 2x smaller: warp det 4 ->
    wait, seen from the *same* distance det=1 -> level 0; det large -> higher
    level; det>3*64 -> rejected."""
    cam_derivs = jnp.eye(2) * 180.0  # px per radian
    d_theta = jnp.asarray([1.0, 0.0, 0.0])
    d_phi = jnp.asarray([0.0, 1.0, 0.0])
    R = jnp.eye(3)
    # footprint vectors sized so image motion is exactly 1 px -> det 1
    pr = jnp.asarray([1.0 / 180.0, 0.0, 0.0])
    pd = jnp.asarray([0.0, 1.0 / 180.0, 0.0])
    A, lvl, ok = warp_and_search_level(cam_derivs, d_theta, d_phi, R, pr, pd)
    assert bool(ok) and int(lvl) == 0
    # 4x bigger footprint: det 16 -> quartered twice -> level 2
    A, lvl, ok = warp_and_search_level(cam_derivs, d_theta, d_phi, R, pr * 4, pd * 4)
    assert bool(ok) and int(lvl) == 2
    # 16x bigger: det 256 -> 256/64 = 4 > 3 at level 3 -> reject
    A, lvl, ok = warp_and_search_level(cam_derivs, d_theta, d_phi, R, pr * 16, pd * 16)
    assert not bool(ok)
    # tiny footprint: det << 0.5 -> reject
    A, lvl, ok = warp_and_search_level(cam_derivs, d_theta, d_phi, R, pr * 0.1, pd * 0.1)
    assert not bool(ok)


def test_subpix_refine_recovers_shift(rng):
    """Target image is the source shifted by a known subpixel amount."""
    H, W = 96, 128
    src = make_textured(rng, H, W)
    # smooth the texture so bilinear shifting is well-behaved
    from mcptam_tpu.ops.pyramid import gaussian_blur_3
    src = np.asarray(gaussian_blur_3(jnp.asarray(src), sigma=1.5, radius=3))
    shift = np.array([0.4, -0.3])  # (x, y)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    from scipy.ndimage import map_coordinates
    tgt = map_coordinates(src, [ys + shift[1], xs + shift[0]], order=1)

    pyr_t = build_pyramid(jnp.asarray(tgt))
    atlas_t = build_atlas(pyr_t)
    center = jnp.asarray([50.0, 40.0])
    tmpl = jnp.asarray(src[36:44, 46:54])
    pos, conv = subpix_refine(
        atlas_t, jnp.asarray(0, jnp.int32), tmpl, center, n_its=12
    )
    assert bool(conv)
    # the template content now lives at center - shift in the target
    expected = np.asarray(center) - shift
    # bilinear-of-bilinear resampling carries ~0.1px bias; sub-pixel is enough
    assert np.allclose(np.asarray(pos), expected, atol=0.15), (pos, expected)


def test_vmapped_find_patch(rng):
    """find_patch must vmap over points with per-point levels."""
    img = make_textured(rng, 128, 160)
    pyr = build_pyramid(jnp.asarray(img))
    atlas = build_atlas(pyr)
    corner_atlas = jnp.ones_like(atlas)
    centers = jnp.asarray([[50.0, 40.0], [80.0, 60.0], [100.0, 90.0]])
    tmpls = jnp.stack([
        unwarped_template(atlas, jnp.asarray(0, jnp.int32), c)[0] for c in centers
    ])
    levels = jnp.zeros(3, jnp.int32)
    f = jax.vmap(
        lambda lvl, t, p: find_patch(atlas, corner_atlas, lvl, t, p, range_l0=8)
    )
    found, pos, ssd = f(levels, tmpls, centers + jnp.asarray([3.0, -2.0]))
    assert np.all(np.asarray(found))
    assert np.allclose(np.asarray(pos), np.asarray(centers), atol=0.6)
