"""MiniPatch search + temporal candidate stability filter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import make_rig, render_rig
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.ops.minipatch import (
    mini_template, mini_search, stability_filter, filter_frame_candidates,
)

H, W, C = 240, 320, 1
SEED = 3.0


@pytest.fixture(scope="module")
def frames():
    cams, cfb = make_rig(C, H, W, spread_deg=0.0)
    img0 = np.asarray(render_rig(cams, cfb, SE3.identity(), SEED, H, W))[0]
    img1 = np.asarray(render_rig(
        cams, cfb, SE3.exp(jnp.asarray([0.01, 0.005, 0.0, 0.0, 0.002, 0.0])),
        SEED, H, W,
    ))[0]
    return jnp.asarray(img0), jnp.asarray(img1)


def test_mini_search_finds_shifted_patch(frames):
    img0, img1 = frames
    xy = jnp.asarray([161.0, 117.0])
    tmpl, ok = mini_template(img0, xy)
    assert bool(ok)
    # search the same image offset prediction by a few px
    found, pos, ssd = mini_search(img0, tmpl, xy + jnp.asarray([4.0, -3.0]))
    assert bool(found)
    assert np.allclose(np.asarray(pos), np.asarray(xy), atol=1.0), pos


def test_stability_filter_keeps_static_corners(frames):
    img0, img1 = frames
    feats = jax.jit(make_frame_features)(img0[None])
    xy = feats.cand_xy[0][0].astype(jnp.float32)
    valid = feats.cand_valid[0][0]
    kept = stability_filter(img0, img0, xy, valid)  # identical frames
    n_in = int(jnp.sum(valid))
    n_kept = int(jnp.sum(kept))
    assert n_kept > 0.9 * n_in, (n_kept, n_in)


def test_stability_filter_prunes_unrelated(frames, rng):
    img0, _ = frames
    feats = jax.jit(make_frame_features)(img0[None])
    xy = feats.cand_xy[0][0].astype(jnp.float32)
    valid = feats.cand_valid[0][0]
    noise = jnp.asarray(rng.random((H, W)).astype(np.float32) * 255)
    kept = stability_filter(noise, img0, xy, valid)
    n_in = int(jnp.sum(valid))
    n_kept = int(jnp.sum(kept))
    assert n_kept < 0.5 * n_in, (n_kept, n_in)


def test_filter_frame_candidates_smallmotion(frames):
    img0, img1 = frames
    f0 = jax.jit(make_frame_features)(img0[None])
    f1 = jax.jit(make_frame_features)(img1[None])
    f1p = jax.jit(filter_frame_candidates)(f0, f1)
    for l in range(4):
        n_in = int(jnp.sum(f1.cand_valid[l]))
        n_kept = int(jnp.sum(f1p.cand_valid[l]))
        assert n_kept <= n_in
        if n_in > 10:
            assert n_kept > 0.5 * n_in, (l, n_kept, n_in)
