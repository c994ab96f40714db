"""Fused Pallas ESM kernel vs the pure-JAX ops/sbi.py reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcptam_tpu.ops.sbi import esm_align, make_sbi, sbi_gradients
from mcptam_tpu.ops.sbi_pallas import esm_align_all


def _templates(rng, C=3, shift=(1.5, -0.8), theta=0.06):
    """Smooth random SBI pairs related by a known SE2-ish warp."""
    H, W = 240, 320
    base = rng.random((C, H, W)).astype(np.float32) * 255.0
    # heavy smoothing so ESM has a usable basin
    img = jnp.asarray(base)
    tgt = make_sbi(img)
    # current = target warped by a small translation via axis rolls
    cur_img = np.roll(
        np.roll(base, int(round(shift[1] * 8)), axis=1),
        int(round(shift[0] * 8)), axis=2,
    )
    cur = make_sbi(jnp.asarray(cur_img))
    return np.asarray(cur), np.asarray(tgt)


@pytest.mark.parametrize("iters", [1, 4, 9])
def test_kernel_matches_reference(rng, iters):
    cur, tgt = _templates(rng)
    gx, gy = sbi_gradients(jnp.asarray(tgt))

    def ref_one(c, t, gxx, gyy):
        se2, score = esm_align(c, t, gxx, gyy, n_iterations=iters)
        return jnp.stack(se2), score

    se2_ref, score_ref = jax.jit(jax.vmap(ref_one))(
        jnp.asarray(cur), jnp.asarray(tgt), gx, gy
    )
    se2_k, score_k = esm_align_all(
        jnp.asarray(cur), jnp.asarray(tgt), gx, gy,
        n_iterations=iters, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(se2_k), np.asarray(se2_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(score_k), np.asarray(score_ref), rtol=1e-3, atol=1e-2
    )


def test_kernel_recovers_translation(rng):
    cur, tgt = _templates(rng, shift=(1.0, 0.5))
    gx, gy = sbi_gradients(jnp.asarray(tgt))
    se2, score = esm_align_all(
        jnp.asarray(cur), jnp.asarray(tgt), gx, gy, interpret=True
    )
    se2 = np.asarray(se2)
    # cur[x] = base[x - shift] so the aligning warp is t = +shift:
    # rotation ~ identity, translation ~ (+1.0, +0.5)
    assert np.all(se2[:, 0] > 0.99)
    assert np.all(np.abs(se2[:, 2] - 1.0) < 0.35), se2[:, 2]
    assert np.all(np.abs(se2[:, 3] - 0.5) < 0.35), se2[:, 3]
