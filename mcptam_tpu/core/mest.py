"""Robust M-estimators: Tukey / Cauchy / Huber / LeastSquares.

Vectorized re-implementation of include/mcptam/MEstimator.h.  All functions
take squared errors and a squared sigma and broadcast; sigma estimation uses
the masked-median MAD rule the reference applies (MEstimator.h:109-123):
``sigma^2 = (1.4826 * (1 + 5/(N-1)) * sqrt(median(e^2)))^2``.
"""

from __future__ import annotations

import jax
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


def masked_median_bisect(x: jnp.ndarray, mask: jnp.ndarray,
                         iters: int = 26) -> jnp.ndarray:
    """Lower median of x where mask, by bisection counting.

    A TPU sort instantiates ~3 MB of generated code per call site and is
    among the slowest single ops on the chip; this is a rolled fori_loop
    of compare+count passes instead, converging to (range / 2^iters)
    absolute precision — used on every hot path where the median feeds a
    robust sigma (the MAD scale is a statistical estimate; quantization
    far below the sample noise is immaterial)."""
    inf = jnp.asarray(jnp.inf, x.dtype)
    lo = jnp.min(jnp.where(mask, x, inf), axis=-1)
    hi = jnp.max(jnp.where(mask, x, -inf), axis=-1)
    n = jnp.sum(mask, axis=-1)
    ok = n > 0
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    half = (n + 1) // 2  # rank of the lower median

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x <= mid[..., None]) & mask, axis=-1)
        ge = cnt >= half
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(ok, hi, jnp.zeros_like(hi))


def masked_median_hist(x: jnp.ndarray, mask: jnp.ndarray,
                       bins: int = 256, refine: int = 2) -> jnp.ndarray:
    """Lower-median of x where mask by hierarchical histogram counting.

    Two fused passes over x instead of masked_median_bisect's ~26
    serial compare+count rounds: one min/max pass, then `refine` rounds
    that each count x against `bins` edges at once ((bins, N) broadcast
    compare + reduce = ONE memory pass, the VPU eats the extra compares)
    and descend into the median's bin.  The rounds are serially
    dependent, so on a 6 ms LM-iteration budget each round's fixed
    kernel-launch cost matters more than the compare count — 2 rounds of
    256 bins beat 3 rounds of 32 while subdividing the (outlier-
    stretched) chi2 range 65536-fold instead of 32768, well under the
    sample noise of the robust sigma this feeds (the MAD scale is a
    statistical estimate)."""
    inf = jnp.asarray(jnp.inf, x.dtype)
    lo = jnp.min(jnp.where(mask, x, inf), axis=-1)
    hi = jnp.max(jnp.where(mask, x, -inf), axis=-1)
    n = jnp.sum(mask, axis=-1)
    ok = n > 0
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    half = (n + 1) // 2  # rank of the lower median

    frac = jnp.arange(1, bins + 1, dtype=x.dtype) / bins      # (B,)
    for _ in range(refine):
        edges = lo[..., None] + (hi - lo)[..., None] * frac   # (..., B)
        # rank of each edge: one pass over x, B accumulators
        cnt = jnp.sum(
            (x[..., None, :] <= edges[..., :, None]) & mask[..., None, :],
            axis=-1,
        )                                                      # (..., B)
        reach = cnt >= half[..., None]
        # first bin whose cumulative count reaches the median rank
        first = jnp.argmax(reach, axis=-1)
        found = jnp.any(reach, axis=-1)
        first = jnp.where(found, first, bins - 1)
        width = (hi - lo) / bins
        new_lo = lo + first.astype(x.dtype) * width
        hi = lo + (first + 1).astype(x.dtype) * width
        lo = new_lo
    return jnp.where(ok, hi, jnp.zeros_like(hi))


def find_sigma_squared(err_sq: jnp.ndarray, mask: jnp.ndarray,
                       exact: bool = False) -> jnp.ndarray:
    """MAD-style sigma^2 from masked squared errors (MEstimator.h:109-123).

    exact=True uses the sort-based median (tests / cold paths); the
    default bisection median keeps sorts out of jitted hot loops."""
    med = (masked_median if exact else masked_median_bisect)(err_sq, mask)
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
