"""Mipmap atlas: a whole image pyramid packed into one 2D array.

The tracker's patch search must gather windows at a *per-point dynamic*
pyramid level (reference: PatchFinder picks mnSearchLevel per point,
src/PatchFinder.cc:102-122).  Under vmap/jit, per-level Python branching
would compute every level for every point; instead we pack all LEVELS
images side by side in one (H, AW) array with a zero gap between levels,
so a window gather at (level, x, y) is a single ``lax.dynamic_slice`` at
``(y, x + xoff[level])`` — uniform for every point regardless of level.

Layout (level widths W, W/2, W/4, W/8 separated by GAP columns):

    +--------------+-+------+-+---+-+--+
    |   level 0    | | lvl1 | |l2 | |l3|   height H (smaller levels
    |   H x W      | |      | |   | |  |    top-aligned, rest zero)
    +--------------+-+------+-+---+-+--+
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.config import LEVELS

GAP = 16  # columns of zeros between levels; > any window half-width used


def atlas_xoff(W: int) -> tuple:
    """Static per-level x offsets into the atlas for level-0 width W."""
    offs = []
    x = 0
    for l in range(LEVELS):
        offs.append(x)
        x += (W >> l) + GAP
    return tuple(offs)


def atlas_width(W: int) -> int:
    return atlas_xoff(W)[-1] + (W >> (LEVELS - 1))


def level_dims(H: int, W: int, level: int) -> tuple:
    return (H >> level, W >> level)


def build_atlas(pyramid) -> jnp.ndarray:
    """Pack a tuple of pyramid levels (level 0 first, each (...,H_l,W_l))
    into one (...,H, atlas_width) array."""
    H, W = pyramid[0].shape[-2], pyramid[0].shape[-1]
    offs = atlas_xoff(W)
    out = jnp.zeros(pyramid[0].shape[:-2] + (H, atlas_width(W)), pyramid[0].dtype)
    for l, img in enumerate(pyramid):
        h, w = img.shape[-2], img.shape[-1]
        out = out.at[..., :h, offs[l] : offs[l] + w].set(img)
    return out


def level_xoff_array(W: int) -> jnp.ndarray:
    return jnp.asarray(atlas_xoff(W), jnp.int32)


def level_size_arrays(H: int, W: int):
    """(LEVELS,) arrays of level heights and widths."""
    hs = jnp.asarray([H >> l for l in range(LEVELS)], jnp.int32)
    ws = jnp.asarray([W >> l for l in range(LEVELS)], jnp.int32)
    return hs, ws


def dynamic_window(atlas2d: jnp.ndarray, level, y0, x0, size: tuple):
    """Gather a static-size window whose top-left (in level coords) is
    (y0, x0) at ``level``.  Returns the window; caller is responsible for
    validity wrt level bounds (slice clamps at atlas edges)."""
    W = _level0_width_from_atlas(atlas2d.shape[-1])
    xoff = level_xoff_array(W)[level]
    return jax.lax.dynamic_slice(
        atlas2d, (y0, x0 + xoff), size
    )


_ATLAS_W_CACHE = {}


def _level0_width_from_atlas(aw: int) -> int:
    """Invert atlas_width (static python-int computation, memoized)."""
    if aw not in _ATLAS_W_CACHE:
        # atlas_width(W) is monotonic in W; widths are multiples of 8
        W = 8
        while atlas_width(W) < aw:
            W += 8
        if atlas_width(W) != aw:
            raise ValueError(f"not a valid atlas width: {aw}")
        _ATLAS_W_CACHE[aw] = W
    return _ATLAS_W_CACHE[aw]
