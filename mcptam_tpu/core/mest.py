"""Robust M-estimators: Tukey / Cauchy / Huber / LeastSquares.

Vectorized re-implementation of include/mcptam/MEstimator.h.  All functions
take squared errors and a squared sigma and broadcast; sigma estimation uses
the masked-median MAD rule the reference applies (MEstimator.h:109-123):
``sigma^2 = (1.4826 * (1 + 5/(N-1)) * sqrt(median(e^2)))^2``.
"""

from __future__ import annotations

import jax.numpy as jnp

TUKEY = "tukey"
CAUCHY = "cauchy"
HUBER = "huber"
LEAST_SQUARES = "least_squares"


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x where mask, ignoring invalid entries (sort-based; invalid
    entries pushed to +inf, median index computed from the valid count)."""
    n = x.shape[-1] if x.ndim else x.size
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    count = jnp.sum(mask, axis=-1)
    mid = jnp.maximum(count - 1, 0) // 2
    mid2 = count // 2
    lo = jnp.take_along_axis(xs, mid[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(xs, jnp.minimum(mid2, n - 1)[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(count > 0, med, jnp.zeros_like(med))


def find_sigma_squared(err_sq: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MAD-style sigma^2 from masked squared errors (MEstimator.h:109-123)."""
    med = masked_median(err_sq, mask)
    n = jnp.maximum(jnp.sum(mask, axis=-1).astype(err_sq.dtype), 2.0)
    sigma = 1.4826 * (1.0 + 5.0 / (n - 1.0)) * jnp.sqrt(med)
    return sigma * sigma


def weight(kind: str, err_sq: jnp.ndarray, sigma_sq: jnp.ndarray) -> jnp.ndarray:
    """IRLS weight w(e) for the given estimator (MEstimator.h Weight fns)."""
    sig = jnp.maximum(sigma_sq, 1e-12)
    if kind == TUKEY:
        b_sq = 4.6851 * 4.6851 * sig
        d = 1.0 - err_sq / b_sq
        return jnp.where(err_sq <= b_sq, d * d, 0.0)
    if kind == CAUCHY:
        b_sq = 2.3849 * 2.3849 * sig
        return 1.0 / (1.0 + err_sq / b_sq)
    if kind == HUBER:
        b_sq = 1.345 * 1.345 * sig
        e = jnp.sqrt(jnp.maximum(err_sq, 1e-20))
        return jnp.where(err_sq <= b_sq, jnp.ones_like(err_sq), jnp.sqrt(b_sq) / e)
    if kind == LEAST_SQUARES:
        return jnp.ones_like(err_sq)
    raise ValueError(f"unknown estimator {kind!r}")


def objective_score(kind: str, err_sq: jnp.ndarray, sigma_sq: jnp.ndarray) -> jnp.ndarray:
    """rho(e) objective contribution (MEstimator.h ObjectiveScore fns)."""
    sig = jnp.maximum(sigma_sq, 1e-12)
    if kind == TUKEY:
        b_sq = 4.6851 * 4.6851 * sig
        d = 1.0 - err_sq / b_sq
        return jnp.where(
            err_sq <= b_sq, (b_sq / 6.0) * (1.0 - d * d * d), b_sq / 6.0
        )
    if kind == CAUCHY:
        b_sq = 2.3849 * 2.3849 * sig
        return 0.5 * b_sq * jnp.log1p(err_sq / b_sq)
    if kind == HUBER:
        b_sq = 1.345 * 1.345 * sig
        b = jnp.sqrt(b_sq)
        e = jnp.sqrt(jnp.maximum(err_sq, 1e-20))
        return jnp.where(err_sq <= b_sq, 0.5 * err_sq, b * e - 0.5 * b_sq)
    if kind == LEAST_SQUARES:
        return 0.5 * err_sq
    raise ValueError(f"unknown estimator {kind!r}")
