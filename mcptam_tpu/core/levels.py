"""Pyramid-level coordinate helpers (include/mcptam/LevelHelpers.h).

Level-N pixel centers sit at ``(p0 + 0.5) / 2^n - 0.5`` in level-0 coords'
inverse; the half-pixel-aware transforms below mirror LevelHelpers.h:55-97.
"""

from __future__ import annotations

import jax.numpy as jnp


def level_scale(level) -> jnp.ndarray:
    """2**level; accepts traced integer arrays."""
    return jnp.asarray(2 ** jnp.asarray(level)) if not isinstance(level, int) else 2 ** level


def level_zero_pos(pos_level, level):
    """Level-N coords -> level-0 coords (center-of-pixel aware)."""
    s = 2.0 ** jnp.asarray(level, dtype=jnp.float32)
    return (jnp.asarray(pos_level, dtype=jnp.float32) + 0.5) * s - 0.5


def level_n_pos(pos_l0, level):
    """Level-0 coords -> level-N coords."""
    s = 2.0 ** jnp.asarray(level, dtype=jnp.float32)
    return (jnp.asarray(pos_l0, dtype=jnp.float32) + 0.5) / s - 0.5
