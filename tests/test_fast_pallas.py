"""Fused Pallas FAST front-end vs the pure-JAX reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcptam_tpu.ops.fast_pallas import (
    NBINS, fast_frontend, fast_frontend_reference,
)


@pytest.mark.parametrize("shape", [(2, 64, 128), (1, 60, 80), (3, 48, 256)])
def test_kernel_matches_reference(rng, shape):
    img = jnp.asarray(
        np.round(rng.random(shape) * 255.0).astype(np.float32)
    )
    s_ref, nm_ref, freq_ref, fnm_ref = jax.jit(fast_frontend_reference)(img)
    s_k, nm_k, freq_k, fnm_k = fast_frontend(img, interpret=True)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm_k), np.asarray(nm_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(freq_k), np.asarray(freq_ref), rtol=0, atol=0.5
    )
    np.testing.assert_allclose(
        np.asarray(fnm_k), np.asarray(fnm_ref), rtol=0, atol=0.5
    )


def test_freq_is_cumulative(rng):
    img = jnp.asarray(np.round(rng.random((1, 64, 128)) * 255).astype(np.float32))
    _, _, freq, freq_nm = fast_frontend(img, interpret=True)
    for f in (np.asarray(freq)[0], np.asarray(freq_nm)[0]):
        assert f.shape == (NBINS,)
        assert np.all(np.diff(f) <= 0), "freq[t] = #(score > t) must be non-increasing"


def test_synthetic_corner_detected():
    img = np.zeros((1, 64, 64), np.float32)
    img[0, 30:, 30:] = 200.0  # a bright quadrant corner at (30,30)
    s, nm, _, _ = fast_frontend(jnp.asarray(img), interpret=True)
    s = np.asarray(s)[0]
    y, x = np.unravel_index(np.argmax(s), s.shape)
    assert abs(y - 30) <= 2 and abs(x - 30) <= 2
    assert s.max() > 50
