"""Multi-device sharding: sharded results must equal single-device results.

Runs on the virtual 8-device CPU mesh from conftest.  Each test compares a
sharded execution against the plain single-device one — sharding is a
layout annotation, never a semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import (
    make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
)
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.parallel.mesh import (
    make_mesh, sharded_frame_features, sharded_lm_run, sharded_track_frame,
)
from mcptam_tpu.ba.adjusters import problem_all
from mcptam_tpu.ba.bundle import create_lm_state, lm_run
from mcptam_tpu.config import DEFAULT_BUNDLE
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state

H, W, C = 64, 96, 2


@pytest.fixture(scope="module")
def world():
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    ms, _ = build_groundtruth_map(
        cams, cfb, H, W, n_per_level=24,
        max_points=256, max_mkfs=8, max_meas=1024,
    )
    images = jnp.asarray(
        render_rig(
            cams, cfb,
            SE3.exp(jnp.asarray([0.02, -0.01, 0.015, 0.004, -0.006, 0.003])),
            3.0, H, W,
        ),
        jnp.float32,
    )
    return cams, cfb, cams_sbi, ms, images


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    assert make_mesh(8).devices.size == 8


def test_sharded_frame_features_matches(world):
    cams, cfb, cams_sbi, ms, images = world
    ref = jax.jit(make_frame_features)(images)
    mesh = make_mesh(8)
    fn, images_sh = sharded_frame_features(mesh, images)
    got = fn(images_sh)
    for name in ("atlas", "sbi", "sbi_gx", "sbi_gy"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=1e-5, atol=1e-3, err_msg=name,
        )


def test_sharded_lm_matches(world):
    cams, cfb, cams_sbi, ms, images = world
    prob = problem_all(ms)
    st0 = create_lm_state(prob, DEFAULT_BUNDLE)
    ref = jax.jit(
        lambda p, s: lm_run(p, s, cams, 2, DEFAULT_BUNDLE)
    )(prob, st0)

    mesh = make_mesh(8)
    got, _ = sharded_lm_run(mesh, prob, cams, n_steps=2)
    np.testing.assert_allclose(
        float(got.cost), float(ref.cost), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.pose_a.t), np.asarray(ref.pose_a.t),
        rtol=1e-4, atol=1e-5,
    )


def test_sharded_lm_soa_production_path_matches(world):
    """The PRODUCTION BA layout — grouped obs table + fixed_b=True, the
    path system/mapmaker.py runs (_solve_delta_soa + spd_solve) — sharded
    over the point axis must equal the single-device run (round-4 weak
    #4: only the scatter path was covered)."""
    from mcptam_tpu.parallel.mesh import sharded_lm_run_soa
    from mcptam_tpu.ba.bundle import attach_obs_table, max_obs_per_point

    cams, cfb, cams_sbi, ms, images = world
    prob = problem_all(ms)
    D = int(max_obs_per_point(prob))
    prob_t = attach_obs_table(prob, D)
    assert int(prob_t.obs_dropped) == 0
    st0 = create_lm_state(prob_t, DEFAULT_BUNDLE)
    ref = jax.jit(
        lambda p, s: lm_run(p, s, cams, 3, DEFAULT_BUNDLE, fixed_b=True)
    )(prob_t, st0)

    mesh = make_mesh(8)
    got, _ = sharded_lm_run_soa(mesh, prob_t, cams, n_steps=3)
    assert int(got.accepted) == int(ref.accepted)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.pose_a.t), np.asarray(ref.pose_a.t),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.points), np.asarray(ref.points),
        rtol=1e-3, atol=1e-4,
    )


def test_sharded_track_frame_matches(world):
    cams, cfb, cams_sbi, ms, images = world
    tcfg = TrackerConfig(
        max_patches_per_frame=64, coarse_max=8, coarse_min=4,
        coarse_range=8, fine_range_first=6, fine_range=4,
    )
    feats = jax.jit(make_frame_features)(images)
    ts = create_tracker_state(C)
    ref_ts, ref_res = jax.jit(
        lambda t, m, f: track_frame(t, m, cams, cams_sbi, f, tcfg)
    )(ts, ms, feats)

    mesh = make_mesh(8)
    fn, ms_sh = sharded_track_frame(mesh, ms, cams, cams_sbi, tcfg)
    got_ts, got_res = fn(ts, ms_sh, feats)
    np.testing.assert_allclose(
        np.asarray(got_ts.pose.t), np.asarray(ref_ts.pose.t),
        rtol=1e-4, atol=1e-5,
    )
    assert int(got_res.tot_found) == int(ref_res.tot_found)


def test_sharded_epipolar_matches(world):
    # the map-maker's hot op: candidate axis sharded over chips
    from mcptam_tpu.parallel.mesh import sharded_epipolar_match
    from mcptam_tpu.map.epipolar import epipolar_match

    cams, cfb, cams_sbi, ms, images = world
    feats = jax.jit(make_frame_features)(images)
    Q = 24  # divisible by the 8-device mesh
    lvl = 0  # the tiny test images only yield epipolar matches at level 0
    xy = feats.cand_xy[lvl][0][:Q].astype(jnp.float32)
    want = feats.cand_valid[lvl][0][:Q]
    args = (
        jnp.zeros(Q, jnp.int32),           # src_mkf
        jnp.zeros(Q, jnp.int32),           # src_cam
        jnp.zeros(Q, jnp.int32),           # tgt_mkf
        jnp.ones(Q, jnp.int32),            # tgt_cam (cross-camera stereo)
        jnp.full((Q,), lvl, jnp.int32),
        xy, want,
    )
    ref = jax.jit(epipolar_match)(ms, cams, *args)
    mesh = make_mesh(8)
    got = sharded_epipolar_match(mesh)(ms, cams, *args)
    assert int(jnp.sum(ref[0])) > 0  # some candidates matched
    assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    ok = np.asarray(ref[0])
    np.testing.assert_allclose(
        np.asarray(got[1])[ok], np.asarray(ref[1])[ok], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[2])[ok], np.asarray(ref[2])[ok], rtol=1e-4, atol=1e-3
    )
