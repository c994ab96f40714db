"""M-estimator golden tests against the closed-form definitions."""

import numpy as np
import jax.numpy as jnp

from mcptam_tpu.core import mest


def test_masked_median_basic():
    x = jnp.asarray([5.0, 1.0, 3.0, 9.0, 7.0])
    m = jnp.asarray([1, 1, 1, 0, 1], bool)
    # valid = [5,1,3,7] -> median 4
    assert float(mest.masked_median(x, m)) == 4.0


def test_masked_median_odd():
    x = jnp.asarray([5.0, 1.0, 3.0])
    m = jnp.ones(3, bool)
    assert float(mest.masked_median(x, m)) == 3.0


def test_find_sigma_squared_matches_formula():
    err_sq = jnp.asarray([1.0, 4.0, 9.0, 16.0, 25.0])
    mask = jnp.ones(5, bool)
    med = 9.0
    n = 5
    expected = (1.4826 * (1 + 5.0 / (n - 1)) * np.sqrt(med)) ** 2
    assert np.allclose(mest.find_sigma_squared(err_sq, mask), expected, rtol=1e-5)


def test_tukey_weight_cutoff():
    sigma_sq = jnp.asarray(1.0)
    b_sq = 4.6851**2
    w_in = mest.weight(mest.TUKEY, jnp.asarray(0.0), sigma_sq)
    w_edge = mest.weight(mest.TUKEY, jnp.asarray(b_sq * 1.01), sigma_sq)
    assert float(w_in) == 1.0
    assert float(w_edge) == 0.0


def test_huber_weight():
    sigma_sq = jnp.asarray(4.0)
    b = 1.345 * 2.0
    w = mest.weight(mest.HUBER, jnp.asarray((2 * b) ** 2), sigma_sq)
    assert np.allclose(w, 0.5, rtol=1e-5)
    assert float(mest.weight(mest.HUBER, jnp.asarray(b**2 * 0.5), sigma_sq)) == 1.0


def test_cauchy_weight():
    sigma_sq = jnp.asarray(1.0)
    b_sq = 2.3849**2
    w = mest.weight(mest.CAUCHY, jnp.asarray(b_sq), sigma_sq)
    assert np.allclose(w, 0.5, rtol=1e-5)


def test_least_squares():
    e = jnp.asarray([1.0, 2.0])
    assert np.all(np.asarray(mest.weight(mest.LEAST_SQUARES, e, jnp.asarray(1.0))) == 1.0)
    assert np.allclose(mest.objective_score(mest.LEAST_SQUARES, e, jnp.asarray(1.0)), 0.5 * e)


def test_masked_median_hist_matches_exact():
    """Histogram median (the BA hot-path sigma estimator) tracks the exact
    masked median within its documented range/32^3 resolution, even on
    outlier-stretched chi2-like data, and returns 0 on an empty mask."""
    rng = np.random.default_rng(1)
    for n in (64, 4096, 32768):
        x = jnp.asarray(rng.exponential(2.0, n) ** 2)
        m = jnp.asarray(rng.uniform(0, 1, n) > 0.3)
        vals = np.sort(np.asarray(x)[np.asarray(m)])
        exact = float(vals[(len(vals) + 1) // 2 - 1])  # lower median
        got = float(mest.masked_median_hist(x, m))
        assert abs(got - exact) <= max(1e-2 * exact, 1e-6), (n, got, exact)
    assert float(mest.masked_median_hist(x, jnp.zeros_like(m))) == 0.0
    # constant data: lands exactly on the value
    c = jnp.full((100,), 3.5)
    assert np.isclose(
        float(mest.masked_median_hist(c, jnp.ones(100, bool))), 3.5
    )
