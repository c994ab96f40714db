"""Map-maker tests: epipolar point creation, map init, refinds, BA-on-map,
and the closed SLAM loop on the synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import MapMakerConfig, TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import unproject
from mcptam_tpu.core.levels import level_zero_pos
from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, render_rig, ray_depth
from mcptam_tpu.map.state import create_map_state, kf_cam_from_world
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.map.mapmaker_core import init_from_mkf, integrate_mkf, need_new_mkf
from mcptam_tpu.map.refind import refind_in_keyframes, measurement_table
from mcptam_tpu.ba.adjusters import problem_all, problem_recent, writeback
from mcptam_tpu.ba.bundle import create_lm_state, lm_run
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state

H, W = 240, 320
C = 2
SEED = 3.0
MCFG = MapMakerConfig(init_depth=5.0)
TCFG = TrackerConfig(max_patches_per_frame=200, coarse_max=20, coarse_min=6)


@pytest.fixture(scope="module")
def world():
    cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    return cams, cam_from_base, cams_sbi


@pytest.fixture(scope="module")
def init_map(world):
    cams, cam_from_base, cams_sbi = world
    images = render_rig(cams, cam_from_base, SE3.identity(), SEED, H, W)
    feats = make_frame_features(images)
    ms = create_map_state(
        H, W, C, cam_from_base, max_points=1024, max_mkfs=8, max_meas=8192
    )
    ms, mkf_idx = init_from_mkf(ms, cams, feats, SE3.identity(), MCFG)
    return ms


def test_init_creates_points(init_map):
    ms = init_map
    n = int(jnp.sum(ms.points.valid))
    assert n >= MCFG.min_map_points, n
    assert int(jnp.sum(ms.mkfs.valid)) == 1
    assert bool(ms.mkfs.fixed[0])


def test_epipolar_depths_near_truth(world, init_map):
    """Epipolar-triangulated points (those with 2 measurements) must have
    near-ground-truth positions: the sphere surface at radius 6."""
    ms = init_map
    counts = np.zeros(ms.points.capacity, np.int32)
    mvalid = np.asarray(ms.meas.valid)
    for p, v in zip(np.asarray(ms.meas.point), mvalid):
        if v:
            counts[p] += 1
    stereo = (counts >= 2) & np.asarray(ms.points.valid)
    assert stereo.sum() >= 10, stereo.sum()
    radii = np.linalg.norm(np.asarray(ms.points.pos_w)[stereo], axis=-1)
    # points lie on the radius-6 sphere (cameras near origin)
    med_err = np.median(np.abs(radii - 6.0))
    assert med_err < 0.25, (med_err, np.percentile(np.abs(radii - 6.0), [50, 90]))


def test_epipolar_hypothesis_budget_recall(world, init_map):
    """The static arc-hypothesis budget stands in for the reference's
    arc-length-proportional stepping (dAngleStep = OnePixelAngle() *
    LevelScale * 3, src/MapMakerServerBase.cc:700-702): NH=32 must
    already recover nearly all the matches a 4x-denser NH=128 sweep
    finds on this scene, and its triangulations must stay on the
    ground-truth surface — the budget degrades recall gracefully, not
    abruptly."""
    from mcptam_tpu.map.epipolar import epipolar_match
    from mcptam_tpu.map.mapmaker_core import _level_candidates
    cams, cam_from_base, _ = world
    ms = init_map
    images = render_rig(cams, cam_from_base, SE3.identity(), SEED, H, W)
    feats = make_frame_features(images)
    level, c, tgt = 1, 0, 1
    xy, want = _level_candidates(feats, c, level, 64)
    Q = xy.shape[0]
    args = dict(
        src_mkf=jnp.zeros((Q,), jnp.int32),
        src_cam=jnp.full((Q,), c, jnp.int32),
        tgt_mkf=jnp.zeros((Q,), jnp.int32),
        tgt_cam=jnp.full((Q,), tgt, jnp.int32),
        level=jnp.full((Q,), level, jnp.int32),
        xy_level=xy,
        want=want,
    )
    ok32, pos32, _, _ = jax.jit(
        lambda ms, cams: epipolar_match(ms, cams, **args, n_hypotheses=32)
    )(ms, cams)
    ok128, pos128, _, _ = jax.jit(
        lambda ms, cams: epipolar_match(ms, cams, **args, n_hypotheses=128)
    )(ms, cams)
    n32 = int(jnp.sum(ok32))
    n128 = int(jnp.sum(ok128))
    assert n128 >= 5, n128
    assert n32 >= 0.8 * n128, (n32, n128)
    # common matches triangulate onto the radius-6 sphere
    both = np.asarray(ok32 & ok128)
    radii = np.linalg.norm(np.asarray(pos32)[both], axis=-1)
    assert np.median(np.abs(radii - 6.0)) < 0.25


def test_epipolar_wide_baseline_needs_denser_arc(world):
    """On a WIDE-baseline pair the epipolar arc is long enough that the
    NH=32 uniform budget steps coarser than the reference's ~3 px arc
    stepping and demonstrably misses matches a denser sweep finds —
    and auto_hypothesis_budget detects exactly this rig geometry and
    buckets the budget up (round-4 missing #2)."""
    from mcptam_tpu.map.epipolar import epipolar_match, auto_hypothesis_budget
    from mcptam_tpu.map.builder import commit_mkf
    from mcptam_tpu.map.mapmaker_core import _level_candidates

    # the arc ANGLE saturates near MAX-MIN_EPI_ANGLE for any baseline;
    # its PIXEL length scales with focal length, so under-sampling shows
    # at VGA (needed ~53-61 samples at level 0), not at this module's
    # 240x320 (needed ~27-31 <= 32) — the wide pair runs at VGA
    HH, WW = 480, 640
    cams, _ = make_rig(C, HH, WW, spread_deg=25.0)
    # two parallel cameras, 1.2 m apart (vs the close rig's ~0.26 m)
    R = jnp.stack([jnp.eye(3)] * 2)
    t = jnp.stack([jnp.zeros(3), jnp.asarray([1.2, 0.0, 0.0])])
    cfb = SE3(R=R, t=t)
    level = 0
    nh_auto = auto_hypothesis_budget(cams, cfb, finest_level=level)
    assert nh_auto >= 64, nh_auto

    images = render_rig(cams, cfb, SE3.identity(), SEED, HH, WW)
    feats = make_frame_features(images)
    ms = create_map_state(
        HH, WW, C, cfb, max_points=1024, max_mkfs=4, max_meas=4096
    )
    ms, mkf_idx, _ = commit_mkf(ms, feats, SE3.identity(), fixed=True)

    c, tgt = 0, 1
    xy, want = _level_candidates(feats, c, level, 64)
    Q = xy.shape[0]
    args = dict(
        src_mkf=jnp.zeros((Q,), jnp.int32),
        src_cam=jnp.full((Q,), c, jnp.int32),
        tgt_mkf=jnp.zeros((Q,), jnp.int32),
        tgt_cam=jnp.full((Q,), tgt, jnp.int32),
        level=jnp.full((Q,), level, jnp.int32),
        xy_level=xy,
        want=want,
    )
    # the dense auto budget pairs with the corner-space ambiguity rule
    # (mapmaker._resolve_epi_budget flips it whenever auto buckets above
    # 32): the reference-faithful index rule self-sabotages at denser-
    # than-3px sampling (many hypotheses land on the SAME corner and get
    # rejected as "ambiguous")
    ok32, _, _, _ = jax.jit(
        lambda ms, cams: epipolar_match(ms, cams, **args, n_hypotheses=32)
    )(ms, cams)
    okd, posd, _, _ = jax.jit(
        lambda ms, cams: epipolar_match(ms, cams, **args,
                                        n_hypotheses=nh_auto,
                                        corner_ambiguity=True)
    )(ms, cams)
    n32, nd = int(jnp.sum(ok32)), int(jnp.sum(okd))
    # the auto-bucketed budget samples this long arc at reference density
    # and must not LOSE recall vs the coarse budget (it may also reject
    # matches the coarse sweep wrongly accepted: denser sampling can
    # discover genuine rival corners on the arc — the corner-space
    # ambiguity rule makes that a correct rejection, not a regression).
    # Measured here: 61 @ 32 -> 63 @ 64.
    assert nd >= n32, (n32, nd)
    assert nd >= 5, nd
    # and the denser matches are real: triangulations land on the
    # ground-truth radius-6 sphere
    okd_np = np.asarray(okd)
    radii = np.linalg.norm(np.asarray(posd)[okd_np], axis=-1)
    assert np.median(np.abs(radii - 6.0)) < 0.3, np.median(radii)


def test_tracking_on_epipolar_map(world, init_map):
    cams, cam_from_base, cams_sbi = world
    ms = init_map
    true_pose = SE3.exp(jnp.asarray([0.04, -0.02, 0.03, 0.01, -0.015, 0.008]))
    images = render_rig(cams, cam_from_base, true_pose, SEED, H, W)
    feats = make_frame_features(images)
    ts = create_tracker_state(C)
    ts, res = track_frame(ts, ms, cams, cams_sbi, feats, TCFG)
    err = np.linalg.norm(np.asarray((res.pose @ true_pose.inv()).ln()))
    assert err < 0.03, err


def test_global_ba_reduces_error(world, init_map):
    cams, cam_from_base, cams_sbi = world
    ms = init_map
    prob = problem_all(ms)
    st0 = create_lm_state(prob)
    st = lm_run(prob, st0, cams, 25)
    assert float(st.cost) < float(st0.cost) if np.isfinite(float(st0.cost)) else True
    assert int(st.accepted) >= 1
    ms2 = writeback(ms, prob, st)
    # movable (>=2 meas) points should stay near the sphere (no divergence);
    # single-measurement fixed-depth fallback points are immovable by design
    movable = np.asarray(prob.movable_pt)
    radii = np.linalg.norm(np.asarray(ms2.points.pos_w)[movable], axis=-1)
    assert movable.sum() >= 10
    assert np.median(np.abs(radii - 6.0)) < 0.5


def test_refind_adds_measurements(world, init_map):
    """Integrate a second viewpoint; refinds must attach old points to it."""
    cams, cam_from_base, cams_sbi = world
    ms = init_map
    pose2 = SE3.exp(jnp.asarray([0.08, 0.0, 0.05, 0.0, 0.02, 0.0]))
    images = render_rig(cams, cam_from_base, pose2, SEED, H, W)
    feats = make_frame_features(images)
    ms2, mkf_idx, accepted = integrate_mkf(ms, cams, feats, pose2, None, MCFG)
    assert accepted
    assert int(jnp.sum(ms2.mkfs.valid)) == 2
    tab = np.asarray(measurement_table(ms2))
    n_new_kf_meas = tab[int(mkf_idx)].sum()
    assert n_new_kf_meas > 20, n_new_kf_meas
    # new points were created too
    assert int(jnp.sum(ms2.points.valid)) > int(jnp.sum(ms.points.valid))


def test_need_new_mkf_heuristic(world, init_map):
    ms = init_map
    near, _ = need_new_mkf(ms, SE3.identity(), jnp.asarray(6.0), MCFG)
    assert not bool(near)
    far_pose = SE3.exp(jnp.asarray([3.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    far, _ = need_new_mkf(ms, far_pose, jnp.asarray(6.0), MCFG)
    assert bool(far)


def test_slam_loop(world):
    """Closed loop: init, track a trajectory, add MKFs when the heuristic
    fires, run local BA, keep tracking — trajectory error stays bounded."""
    cams, cam_from_base, cams_sbi = world
    images = render_rig(cams, cam_from_base, SE3.identity(), SEED, H, W)
    feats = make_frame_features(images)
    ms = create_map_state(
        H, W, C, cam_from_base, max_points=2048, max_mkfs=8, max_meas=8192
    )
    mcfg = MapMakerConfig(init_depth=5.0, max_scaled_mkf_dist=0.04)
    ms, _ = init_from_mkf(ms, cams, feats, SE3.identity(), mcfg)
    ts = create_tracker_state(C)

    errs = []
    n_mkfs_added = 0
    for i in range(1, 7):
        v = jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0])
        true_pose = SE3.exp(v)
        images = render_rig(cams, cam_from_base, true_pose, SEED, H, W)
        feats = make_frame_features(images)
        ts, res = track_frame(ts, ms, cams, cams_sbi, feats, TCFG)
        errs.append(np.linalg.norm(np.asarray((res.pose @ true_pose.inv()).ln())))
        mean_depth = jnp.mean(res.mean_depth)
        add, _ = need_new_mkf(ms, res.pose, mean_depth, mcfg)
        if bool(add) and int(res.quality) == 0:
            ms, _, acc = integrate_mkf(ms, cams, feats, res.pose, res, mcfg)
            assert acc
            n_mkfs_added += 1
            prob = problem_recent(ms)
            st = lm_run(prob, create_lm_state(prob), cams, 15)
            ms = writeback(ms, prob, st)
    assert n_mkfs_added >= 1, n_mkfs_added
    assert max(errs) < 0.05, errs
    assert int(jnp.sum(ms.points.valid)) > 100


def test_auto_budget_resolution_wires_corner_rule(world):
    """epi_max_hypotheses=0 resolves ONCE from rig geometry at map-maker
    setup; a dense resolution (>32) also enables the corner-space
    ambiguity rule (the index rule self-sabotages at dense sampling)."""
    import dataclasses
    from mcptam_tpu.system.mapmaker import MapMaker

    cams, cam_from_base, _ = world
    # close rig at this module's low resolution -> stays at the 32 floor
    mm = MapMaker(cams=cams, mcfg=MapMakerConfig(epi_max_hypotheses=0))
    ms = create_map_state(H, W, C, cam_from_base, 256, 4, 1024)
    mm._resolve_epi_budget(ms)
    assert mm.mcfg.epi_max_hypotheses == 32
    assert not mm.mcfg.epi_corner_ambiguity

    # wide parallel pair at VGA -> buckets up AND flips the corner rule
    cams_w, _ = make_rig(2, 480, 640, spread_deg=25.0)
    cfb_w = SE3(R=jnp.stack([jnp.eye(3)] * 2),
                t=jnp.stack([jnp.zeros(3), jnp.asarray([1.2, 0.0, 0.0])]))
    mm2 = MapMaker(cams=cams_w, mcfg=MapMakerConfig(epi_max_hypotheses=0))
    ms2 = create_map_state(480, 640, 2, cfb_w, 256, 4, 1024)
    mm2._resolve_epi_budget(ms2)
    assert mm2.mcfg.epi_max_hypotheses >= 64
    assert mm2.mcfg.epi_corner_ambiguity
