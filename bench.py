"""Benchmark: the BASELINE.json metric set on one chip.

Prints ONE JSON line whose primary metric is END-TO-END 4-camera VGA
tracking FPS — the full `System.process_frame` path: feature extraction,
tracking, add-MKF heuristics, the map-maker tick (bundle-adjustment chunks
interleaved on the same chip) and pose/covariance publication, on a
realistically populated map with local+global BA converging during the
timed trajectory.  vs_baseline is against the 200 FPS rebuild target
(BASELINE.json north_star).

Structure — a supervisor process (no jax, cannot hang) probes the device
tunnel in killable subprocesses, then runs the measurement in a child
whose watchdog thread guarantees the JSON line under a hard wall-clock
deadline.  Round 3 shipped rc=124 and no number because the tunnel was
down and axon backend init blocks forever in a C reconnect loop that
neither SIGALRM nor the driver's SIGTERM can unwind.  Inside the child:

  * synthetic scene/map construction runs on the HOST CPU backend and is
    device_put once — building it op-by-op on a tunneled TPU cost 6
    minutes of round-trips;
  * the System is warmed through its full scheduler lifecycle (local BA,
    global BA, finish, GC, refind sweeps, MKF integration) BEFORE timing,
    so the timed loop measures steady-state throughput, not XLA compiles;
  * the e2e loop runs with pipeline_depth=8: per-frame scalars travel
    host-ward as one packed async transfer that overlaps later frames
    (a blocking multi-array fetch costs ~25-500 ms per frame on the
    tunnel);
  * secondary metrics (LM iterations/sec on the production obs-table
    layout, f32 fidelity) fill remaining budget in cost order and are
    null when the budget runs out first.

The `extra` field carries the rest of the BASELINE.json metric set:
  jit_step_fps       — the jitted tracker step alone (device-bound ceiling)
  lm_iters_per_sec*  — ChainBundle-equivalent LM iterations/sec
                       (ref MapMakerTiming, src/MapMaker.cc:197-265)
  reproj_err_delta_px— mean reprojection error left by the f32 LM on a
                       noiseless synthetic bundle (target < 1e-3 px)
  mean_found / max_pose_err_px — tracking-quality gates: if tracking
                       collapses (found < 100 of 1000 budget, or pose error
                       > 0.05) the primary value is zeroed so a
                       tracks-nothing-fast regression cannot pass.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "600"))
_T0 = time.monotonic()
RESULTS = {}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def log(msg):
    import sys
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {msg}",
          file=sys.stderr, flush=True)


SCENE_CACHE = "/root/.mcptam_bench_scene_v1.npz"


def build_scene_on_cpu(H, W, C, max_points, max_mkfs, max_meas,
                       n_per_level=60):
    """Construct the rig, ground-truth map and frame set on the host CPU
    backend (fast local compiles, no tunnel chatter), then transfer to the
    default (TPU) device in one hop.  The result is pure data, so it is
    cached on disk keyed by the scene parameters — a warm cache saves the
    ~60 s of host-CPU compiles each bench invocation would otherwise
    re-pay."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.core.se3 import SE3
    from mcptam_tpu.io.synthetic import (
        make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
    )
    from mcptam_tpu.map.state import create_map_state
    from mcptam_tpu.system.mapio import save_map, load_map

    key = np.asarray([1, H, W, C, max_points, max_mkfs, max_meas,
                      n_per_level])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
        cams_sbi = make_sbi_cams(cams, H, W)
        ms = frames_np = poses_np = None
        if os.path.exists(SCENE_CACHE):
            try:
                template = create_map_state(
                    H, W, C, cam_from_base, max_points, max_mkfs, max_meas
                )
                cand, extras = load_map(SCENE_CACHE, template,
                                        with_extras=True)
                if np.array_equal(np.asarray(extras["key"]), key):
                    ms = cand
                    frames_np = np.asarray(extras["frames"])
                    poses_np = (np.asarray(extras["poses_R"]),
                                np.asarray(extras["poses_t"]))
                    log("scene loaded from cache")
            except Exception:
                ms = None
        if ms is None:
            ms, _ = build_groundtruth_map(
                cams, cam_from_base, H, W, n_per_level=n_per_level,
                max_points=max_points, max_mkfs=max_mkfs, max_meas=max_meas,
            )
            poses_l, frames_l = [], []
            for i in range(8):
                v = jnp.asarray([
                    0.012 * (i % 4), -0.006 * (i % 3), 0.008 * (i % 4),
                    0.002 * (i % 3), -0.0015 * (i % 2), 0.001 * (i % 4),
                ])
                poses_l.append(SE3.exp(v))
                frames_l.append(np.asarray(jnp.clip(
                    jnp.asarray(render_rig(cams, cam_from_base, SE3.exp(v),
                                           3.0, H, W)),
                    0, 255,
                ).astype(jnp.uint8)))
            frames_np = np.stack(frames_l)
            poses_np = (np.stack([np.asarray(p.R) for p in poses_l]),
                        np.stack([np.asarray(p.t) for p in poses_l]))
            try:
                save_map(SCENE_CACHE, ms, extras={
                    "key": key, "frames": frames_np,
                    "poses_R": poses_np[0], "poses_t": poses_np[1],
                })
            except Exception:
                pass
        poses = [SE3(R=jnp.asarray(poses_np[0][i]),
                     t=jnp.asarray(poses_np[1][i]))
                 for i in range(poses_np[0].shape[0])]
        frames = [jnp.asarray(frames_np[i])
                  for i in range(frames_np.shape[0])]
    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)
    return (put(cams), put(cam_from_base), put(cams_sbi), put(ms),
            [put(p) for p in poses], [put(f) for f in frames])


def bench_e2e(n_frames: int = 120):
    """End-to-end System FPS + quality + jitted-step FPS."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.config import TrackerConfig, MapMakerConfig
    from mcptam_tpu.core.se3 import SE3
    from mcptam_tpu.system.system import System
    from mcptam_tpu.system.mapmaker import MapMaker, MM_RUNNING

    H, W, C = 480, 640, 4
    MAX_MKFS = 16
    log("building scene on CPU backend")
    # n_per_level sized so the live point count starts INSIDE the global
    # problem's final compaction bucket (1024 < n_pt <= 2048): the MKF the
    # warmup integrates then never flips the bucket, so the timed loop hits
    # zero fresh XLA compiles
    cams, cam_from_base, cams_sbi, ms, poses, frames = build_scene_on_cpu(
        H, W, C, max_points=2048, max_mkfs=MAX_MKFS, max_meas=8192,
        n_per_level=72,
    )
    log("scene built; constructing System")
    tcfg = TrackerConfig()
    mcfg = MapMakerConfig()
    B = 4   # frames per device dispatch (throughput mode)
    sys_ = System(
        cams, cam_from_base, cams_sbi, H, W, tcfg=tcfg, mcfg=mcfg,
        max_points=2048, max_mkfs=MAX_MKFS, max_meas=8192,
        mapmaker=MapMaker(cams=cams, mcfg=mcfg, ba_chunk=4),
        pipeline_depth=2 * B,
    )
    sys_.ms = ms
    sys_.initialized = True
    sys_.mapmaker.state = MM_RUNNING
    mm = sys_.mapmaker

    # --- explicit compile pass: every device program the steady-state
    # loop can hit, compiled exactly once, outputs discarded (functional
    # state: nothing mutates).  Driving real frames to warm up instead
    # compiles the same programs with redundant executions interleaved.
    import jax.numpy as jnp  # noqa: F811
    from mcptam_tpu.ba.bundle import create_lm_state
    ca = jnp.ones((C,), bool)
    feats = sys_._feats_fn(frames[0])
    log("compiling: batched step")
    bfn = sys_._get_batch_fn(B)
    sys_.ts, sys_.ms, _ = bfn(sys_.ts, sys_.ms,
                              jnp.stack(frames[:B]), ca,
                              sys_._empty_queue_poses)
    log("compiling: relocalizer")
    sys_._reloc_fn(sys_.ms, feats, ca)
    log("compiling: MKF integrate")
    mm._integrate(sys_.ms, feats, sys_.ts.pose, None, ca)
    log("compiling: local BA")
    lprob = mm._local_prob_fn(sys_.ms)
    lst = mm._lm_run(lprob, create_lm_state(lprob, mm.bcfg))
    log("compiling: local finish")
    mm._finish_fn(sys_.ms, lprob, lst)
    log("compiling: global BA")
    gprob = mm._global_problem(sys_.ms)
    gst = mm._lm_run(gprob, create_lm_state(gprob, mm.bcfg))
    log("compiling: global finish")
    mm._finish_fn(sys_.ms, gprob, gst)
    log("compiling: GC + refind sweeps")
    mm._gc_fn(sys_.ms)
    mm._any_retry_fn(sys_.ms)
    mm._refind_fn(sys_.ms)
    mm._refind_retry_fn(sys_.ms)
    mm._partial_wb_fn(sys_.ms, lprob, lst)
    mm._count_mkfs_fn(sys_.ms)
    del lprob, lst, gprob, gst, feats
    log("compile pass done; running scheduler lifecycle")

    # a short real run so tracker/map state settle into steady state
    sys_.mapmaker.on_map_changed()
    for i in range(0, 88, B):
        sys_.process_frames(jnp.stack(
            [frames[(i + j) % len(frames)] for j in range(B)]))
        if (i > 12 and not mm.queue and mm._ba_kind == "none"
                and mm._local_done and mm._global_done):
            break
    sys_.flush_pipeline()
    log("warmup complete; timing e2e")

    # --- timed section: fresh BA work over the whole trajectory, frames
    # streamed B per dispatch (the throughput deployment mode); every
    # scheduler action, including keyframe integration, is compiled and
    # can fire.
    mm._idle_ticks = 1   # off the refind phases; GC path stays warm
    sys_.mapmaker.on_map_changed()
    by_fid = {}
    t0 = time.perf_counter()
    for i in range(0, n_frames, B):
        infos = sys_.process_frames(jnp.stack(
            [frames[(i + j) % len(frames)] for j in range(B)]))
        for info in infos:
            by_fid[info.frame_id] = info
    for info in sys_.flush_pipeline():
        by_fid[info.frame_id] = info
    e2e_fps = n_frames / (time.perf_counter() - t0)
    log(f"e2e {e2e_fps:.1f} fps; ba converged={mm._global_done}")

    # pose error in pure numpy (an eager device op per frame costs a
    # tunnel round-trip each): relative pose T_est @ T_gt^-1, error =
    # sqrt(rot_angle^2 + ||rel translation||^2) ~ the SE3 log norm at
    # these magnitudes
    poses_h = [(np.asarray(p.R), np.asarray(p.t)) for p in poses]
    first_fid = min(by_fid)
    found, errs = [], []
    for fid, info in by_fid.items():
        found.append(info.n_found)
        Rg, tg = poses_h[(fid - first_fid) % len(poses_h)]
        Re, te = info.pose[:, :3], info.pose[:, 3]
        dR = Re @ Rg.T
        ang = np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
        dt = te - dR @ tg
        errs.append(float(np.hypot(ang, np.linalg.norm(dt))))

    # --- jitted tracker step ceiling: the batched step program alone
    # (features + track + stats per frame, B frames per dispatch, no
    # map-maker / publish work), from the ALREADY-COMPILED System programs
    ts, msd = sys_.ts, sys_.ms
    qposes = sys_._empty_queue_poses
    batches = [jnp.stack([frames[(i + j) % len(frames)] for j in range(B)])
               for i in range(0, len(frames), B)]
    n_jit = 64
    ts, msd, sc = bfn(ts, msd, batches[0], ca, qposes)
    sc.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_jit // B):
        ts, msd, sc = bfn(ts, msd, batches[i % len(batches)], ca, qposes)
    sc.block_until_ready()
    jit_fps = n_jit / (time.perf_counter() - t0)
    return e2e_fps, jit_fps, float(np.mean(found)), float(np.max(errs))


def bench_lm(chunks: int = 6, chunk: int = 10):
    """LM iterations/sec on the PRODUCTION layout (grouped obs table, the
    path system/mapmaker.py runs), budget-permitting, in cost order:
    the compacted local problem, a mid-size global problem, and the full
    static-capacity problem.  D is sized from the data exactly like
    MapMaker._sized_table; the bench asserts no Hessian edges were
    dropped.  Returns ({name: iters/sec}, fidelity_err_px|None)."""
    import sys as _sys
    import jax
    import jax.numpy as jnp
    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from bench_ba import build
    from mcptam_tpu.ba.bundle import (
        create_lm_state, lm_run, attach_obs_table, max_obs_per_point,
    )
    from mcptam_tpu.system.mapmaker import _bucket

    cases = [
        # global BA, mid-size live map — the headline LM metric, first so
        # a tight budget still produces it
        ("global", dict(n_poses=16, n_points=2048, n_cams=4, sparse_k=8192),
         80.0),
        # local BA: newest + 3 neighbors over their points (snRecentNum=3)
        ("local", dict(n_poses=4, n_points=512, n_cams=4, sparse_k=2048),
         60.0),
        # full static capacity (MAX_MKFS=48 x MAX_POINTS=4096 x MAX_MEAS)
        ("capacity", dict(n_poses=48, n_points=4096, n_cams=4,
                          sparse_k=32768), 180.0),
    ]
    out = {}
    compiled = {}

    def get_run(prob_t):
        key = (prob_t.points.shape, prob_t.m_valid.shape,
               prob_t.obs_idx.shape, prob_t.pose_a.t.shape,
               prob_t.pose_b.t.shape)
        if key not in compiled:
            # bench problems fix the extrinsics (movable_b all-False,
            # like the production map-maker BA) -> static fixed_b path;
            # cams is a runtime ARGUMENT so a shape-cache hit cannot
            # silently reuse another case's camera models
            compiled[key] = jax.jit(
                lambda p, s, c: lm_run(p, s, c, chunk, fixed_b=True))
        return compiled[key]

    fid_err = None
    for name, kw, est_cost in cases:
        if remaining() < est_cost:
            log(f"lm[{name}]: skipped ({remaining():.0f}s left "
                f"< {est_cost:.0f}s estimate)")
            continue
        log(f"lm[{name}]: building + compiling")
        prob, cams = build(**kw)
        dmax = int(jax.device_get(max_obs_per_point(prob)))
        D = _bucket(max(dmax, 1), (8, 16, 24, 32, 48, 64))
        prob_t = attach_obs_table(prob, D)
        n_drop = int(jax.device_get(prob_t.obs_dropped))
        assert n_drop == 0, (
            f"bench_lm[{name}]: obs table D={D} dropped {n_drop} "
            f"measurements (max per-point count {dmax})"
        )
        run = get_run(prob_t)
        st = create_lm_state(prob_t)
        st = run(prob_t, st, cams)        # compile
        st.cost.block_until_ready()
        st = create_lm_state(prob_t)
        t0 = time.perf_counter()
        for _ in range(chunks):
            st = run(prob_t, st, cams)
        st.cost.block_until_ready()
        dt = time.perf_counter() - t0
        out[name] = chunks * chunk / dt
        log(f"lm[{name}]: {out[name]:.1f} iters/s")

        if name == "global":
            # fidelity: mean reprojection error the f32 LM leaves on a
            # NOISELESS synthetic bundle (target < 1e-3 px), same static
            # shapes as the global case so the compiled program is reused
            from mcptam_tpu.ba.bundle import _residuals_and_jacobians
            probf, camsf = build(n_poses=16, n_points=2048, n_cams=4,
                                 sparse_k=8192, noise=0.0)
            probf_t = attach_obs_table(probf, D)
            stf = create_lm_state(probf_t)
            runf = get_run(probf_t)
            for _ in range(10):                  # 100 iterations (sparse
                stf = runf(probf_t, stf, camsf)  # graph converges slowly)
            # score on the host CPU backend (eager residuals on a
            # tunneled chip cost one round-trip per primitive)
            cpu = jax.devices("cpu")[0]
            host = jax.device_get
            with jax.default_device(cpu):
                e, _, _, _, okm = _residuals_and_jacobians(
                    host(probf), host(stf.pose_a), host(stf.pose_b),
                    jnp.asarray(host(stf.points)), host(camsf)
                )
                n_ok = int(jnp.sum(okm))
                fid_err = float(
                    jnp.sum(jnp.linalg.norm(e, axis=-1) * okm)
                    / max(n_ok, 1)
                )
            log(f"lm fidelity: {fid_err:.2e} px over {n_ok} meas")
    return out, fid_err


def emit():
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    e2e_fps = RESULTS.get("e2e_fps")
    quality_ok = (
        e2e_fps is not None
        and RESULTS.get("mean_found", 0.0) >= 100.0
        and RESULTS.get("max_pose_err", 1.0) < 0.05
    )
    value = round(e2e_fps, 2) if (e2e_fps and quality_ok) else 0.0
    lm = RESULTS.get("lm", {})
    rd = RESULTS.get("reproj_delta")
    line = json.dumps({
        "metric": "tracking_fps_4cam_vga_e2e",
        "value": value,
        "unit": "fps",
        "vs_baseline": round(value / 200.0, 4),
        "extra": {
            "jit_step_fps": round(RESULTS.get("jit_fps", 0.0), 2),
            "lm_iters_per_sec": round(lm["global"], 2)
            if "global" in lm else None,
            "lm_iters_per_sec_local": round(lm["local"], 2)
            if "local" in lm else None,
            "lm_iters_per_sec_capacity": round(lm["capacity"], 2)
            if "capacity" in lm else None,
            "reproj_err_delta_px": float(f"{rd:.2e}")
            if rd is not None else None,
            "mean_found": round(RESULTS.get("mean_found", 0.0), 1),
            "max_pose_err": round(RESULTS.get("max_pose_err", 0.0), 5),
            "quality_ok": bool(quality_ok),
            "bench_seconds": round(time.monotonic() - _T0, 1),
        },
    })
    print(line, flush=True)
    rf = os.environ.get("BENCH_RESULT_FILE")
    if rf:
        try:
            with open(rf, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass


class _Deadline(Exception):
    pass


def _alarm(signum, frame):
    raise _Deadline()


def _watchdog():
    """Last-resort deadline: emit the JSON line from a THREAD and exit.

    SIGALRM alone is not enough: a Python signal handler only runs when
    the MAIN thread next executes bytecode, and a hung device tunnel
    parks the main thread inside a C-level reconnect/sleep loop that
    swallows EINTR — measured live: the alarm fired, the handler never
    ran, the driver's kill produced rc=124 and no number (round 3's
    failure mode).  A daemon thread needs only the GIL, which C sleeps
    release, so it can always print the line and hard-exit."""
    emit()
    os._exit(0)


def _child_main():
    """One measurement attempt (runs jax; may hang on a dead tunnel —
    the watchdog thread guarantees the JSON line regardless)."""
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(max(int(BUDGET_S) + 20, 30))
    wd = threading.Timer(max(BUDGET_S + 45.0, 75.0), _watchdog)
    wd.daemon = True
    wd.start()
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # an explicit CPU request (validation runs) needs the config
        # API: the axon sitecustomize's register() overwrites
        # jax_platforms with "axon,cpu" at interpreter start, and
        # backends() then initializes the axon client — which blocks
        # forever when the device tunnel is down
        import jax
        jax.config.update("jax_platforms", "cpu")
    try:
        e2e_fps, jit_fps, mean_found, max_err = bench_e2e()
        RESULTS.update(e2e_fps=e2e_fps, jit_fps=jit_fps,
                       mean_found=mean_found, max_pose_err=max_err)
        lm, reproj_delta = bench_lm()
        RESULTS["lm"] = lm
        RESULTS["reproj_delta"] = reproj_delta
    except _Deadline:
        log("deadline hit; emitting partial results")
    except Exception:
        import traceback
        traceback.print_exc()
        log("bench stage failed; emitting whatever was measured")
    finally:
        signal.alarm(0)
        wd.cancel()
        emit()


_PROBE = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
          "(x @ x).block_until_ready(); print('BENCH_PROBE_OK')")


def _tunnel_ok(timeout: float = 75.0) -> bool:
    """Device health check in a KILLABLE subprocess: axon backend init
    blocks forever (C-level reconnect loop, EINTR swallowed) when the
    TPU tunnel is down, so the probe must be a process we can time out,
    never a call in this process."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           timeout=timeout, capture_output=True, text=True)
        return "BENCH_PROBE_OK" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    """Supervisor: never imports jax (so it can never hang on the
    tunnel); waits for the device to answer, runs the measurement in a
    child process, and guarantees exactly one JSON line reaches stdout
    before the driver's bench timeout (round 3 shipped rc=124 and no
    number because a dead tunnel parked the old single-process bench
    inside axon backend init)."""
    if os.environ.get("BENCH_CHILD") == "1":
        _child_main()
        return
    result_file = f"/tmp/bench_result_{os.getpid()}.json"
    try:
        os.remove(result_file)
    except OSError:
        pass
    env = dict(os.environ, BENCH_CHILD="1", BENCH_RESULT_FILE=result_file)

    # the tunnel is restored by an external daemon on its own schedule;
    # waiting for it beats burning the whole budget inside a hung init
    if env.get("JAX_PLATFORMS", "").strip() != "cpu":
        while remaining() > 240 and not _tunnel_ok():
            log("device tunnel unresponsive; waiting for it to heal")
            time.sleep(10)

    printed_any = False
    while remaining() > 150:
        env["BENCH_BUDGET_S"] = str(int(max(remaining() - 60, 60)))
        log(f"starting bench child (budget {env['BENCH_BUDGET_S']}s)")
        rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                             env=env)
        try:
            with open(result_file) as f:
                res = json.loads(f.read())
            os.remove(result_file)
        except (OSError, ValueError):
            res = None
        if res is not None:
            printed_any = True   # the child printed its line on our stdout
            if res.get("value", 0.0) > 0.0:
                return
            # a zero result from an early crash is worth one more try
            # (the driver parses the LAST line); a zero from a genuine
            # quality collapse just re-measures to the same answer
            log(f"bench child produced a zero result (rc={rc}); "
                f"retrying if budget remains")
        else:
            log(f"bench child exited rc={rc} without a result; retrying")
    if not printed_any:
        log("budget exhausted with no child result; emitting zero line")
        emit()


if __name__ == "__main__":
    main()
