"""Benchmark: the BASELINE.json metric set on one chip.

Prints JSON lines whose primary metric is END-TO-END 4-camera VGA
tracking FPS — the full `System.process_frames` path: feature extraction,
tracking, add-MKF heuristics, the map-maker tick (bundle-adjustment
chunks interleaved on the same chip) and pose/covariance publication, on
a realistically populated map with local+global BA converging during the
timed trajectory.  vs_baseline is against the 200 FPS rebuild target
(BASELINE.json north_star).  The driver parses the LAST line.

INCREMENTAL EMISSION (the round-4 failure was an all-or-nothing bench):
the measurement child re-writes the result file and prints a fresh JSON
line after EVERY completed stage, cheapest first —

  1. jit_step   — scene + System + ONE compiled program (the batched
                  tracker step) + its throughput.  ~1 compile of budget;
                  a starved child still lands extra.jit_step_fps.
  2. e2e        — the remaining ~10 programs, scheduler warmup, then the
                  timed 128-pose loop (no pose revisited inside the
                  timed window) with quality + ATE gates.  Sets `value`.
  3. complete   — LM iterations/sec on the production obs-table layout
                  + f32 fidelity, budget-permitting in cost order.

so a degraded tunnel yields the best finished prefix instead of 0.0.
`extra.stage` says how far it got; `extra.kernels` records which Pallas
paths engaged on the device (a silent reference-path fallback on the
chip is a perf bug, not a preference).

Structure — a supervisor process (no jax, cannot hang) probes the device
tunnel in killable subprocesses while a CPU-pinned prep child pre-builds
the synthetic-scene disk cache, then runs the measurement in a child
whose watchdog thread guarantees a JSON line under a hard wall-clock
deadline (axon backend init blocks forever in a C reconnect loop that
neither SIGALRM nor the driver's SIGTERM can unwind — round 3 shipped
rc=124 and no number that way).  Inside the child:

  * synthetic scene/map construction runs on the HOST CPU backend and is
    device_put once — building it op-by-op on a tunneled TPU cost 6
    minutes of round-trips;
  * the System is warmed through its full scheduler lifecycle (local BA,
    global BA, finish, GC, refind sweeps, MKF integration) BEFORE the
    e2e timing, so the timed loop measures steady-state throughput, not
    XLA compiles;
  * the e2e loop runs with pipeline_depth=8: per-frame scalars travel
    host-ward as one packed async transfer that overlaps later frames
    (a blocking multi-array fetch costs ~25-500 ms per frame on the
    tunnel).

The `extra` field carries the rest of the BASELINE.json metric set:
  jit_step_fps       — the jitted tracker step alone (device-bound ceiling)
  lm_iters_per_sec*  — ChainBundle-equivalent LM iterations/sec
                       (ref MapMakerTiming, src/MapMaker.cc:197-265)
  reproj_err_delta_px— mean reprojection error left by the f32 LM on a
                       noiseless synthetic bundle (target < 1e-3 px)
  ate_m              — scale-aligned ATE RMSE over the timed trajectory
                       (system/evaluate.py); gates quality_ok
  mean_found / max_pose_err — tracking-quality gates: if tracking
                       collapses (found < 100 of 1000 budget, pose error
                       > 0.05, or ATE > 0.02) the primary value is zeroed
                       so a tracks-nothing-fast regression cannot pass.
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

# scene parameters (shared by the prep child and the measurement child so
# they key the same disk cache)
H, W, C = 480, 640, 4
MAX_POINTS, MAX_MKFS, MAX_MEAS = 2048, 16, 8192
N_PER_LEVEL = 72
N_POSES = 128          # distinct trajectory poses; the timed e2e window
                       # is exactly one loop, so no pose repeats in it
SCENE_CACHE = "/root/.mcptam_bench_scene_v2.npz"


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def log(msg):
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _traj_tangent(i: int) -> list:
    """Pose i of the smooth closed benchmark trajectory (period N_POSES):
    a small se3 loop around the map origin, amplitudes matching the
    round-2..4 bench so throughput numbers stay comparable, but with
    every pose distinct (round-4 weak #5: 8 repeated poses made steady
    state easier than a real trajectory)."""
    a = 2.0 * np.pi * i / N_POSES
    return [
        0.020 * np.sin(a), -0.015 * np.sin(2 * a + 0.7), 0.020 * np.cos(a),
        0.0040 * np.sin(a + 1.3), 0.0030 * np.cos(2 * a),
        0.0030 * np.sin(3 * a + 0.5),
    ]


def build_scene_on_cpu():
    """Construct the rig, ground-truth map and frame set on the host CPU
    backend (fast local compiles, no tunnel chatter), then transfer to the
    default (TPU) device in one hop.  The result is pure data, so it is
    cached on disk keyed by the scene parameters — a warm cache saves the
    ~2-4 min of host-CPU renders each bench invocation would otherwise
    re-pay (the supervisor's prep child warms it while the tunnel probe
    runs)."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.core.se3 import SE3
    from mcptam_tpu.io.synthetic import (
        make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
    )
    from mcptam_tpu.map.state import create_map_state
    from mcptam_tpu.system.mapio import save_map, load_map

    key = np.asarray([2, H, W, C, MAX_POINTS, MAX_MKFS, MAX_MEAS,
                      N_PER_LEVEL, N_POSES])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
        cams_sbi = make_sbi_cams(cams, H, W)
        ms = frames_np = poses_np = None
        if os.path.exists(SCENE_CACHE):
            try:
                template = create_map_state(
                    H, W, C, cam_from_base, MAX_POINTS, MAX_MKFS, MAX_MEAS
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
            log(f"rendering {N_POSES}-pose scene (cold cache)")
            ms, _ = build_groundtruth_map(
                cams, cam_from_base, H, W, n_per_level=N_PER_LEVEL,
                max_points=MAX_POINTS, max_mkfs=MAX_MKFS, max_meas=MAX_MEAS,
            )
            poses_l, frames_l = [], []
            for i in range(N_POSES):
                v = jnp.asarray(_traj_tangent(i))
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


def _device_clone_fn():
    """Jitted whole-pytree clone (fresh buffers, one dispatch) so the
    donating jit-ceiling loop in stage 1 cannot invalidate or mutate the
    pristine state stage 2's warmup needs."""
    import jax
    import jax.numpy as jnp

    def clone_leaf(a):
        if a.dtype == jnp.bool_:
            return jnp.logical_or(a, False)
        return a + jnp.zeros((), a.dtype)

    return jax.jit(lambda t: jax.tree_util.tree_map(clone_leaf, t))


# Throughput deployment configuration — swept on the chip (PROFILE_r05.md):
# B=4/chunk=4/tick=1 -> 145 fps, B=8/4/1 -> 170.7, B=8/2/1 -> 178.5,
# B=16/4/1 -> 201.1, B=8/4/2 -> 202.0 (winner: same map-maker duty as
# B=16 at half the dispatch latency).
B = 8          # frames per device dispatch (throughput deployment mode)
BA_CHUNK = 4    # LM steps per map-maker tick (preemption granularity)
TICK_EVERY = 2  # map-maker tick every Nth batch dispatch


def stage_jit_step(ctx: dict):
    """Stage 1: scene + System + the batched-step program alone, then its
    throughput (the device-bound ceiling).  One compile of budget."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.backend import kernel_report
    from mcptam_tpu.config import TrackerConfig, MapMakerConfig
    from mcptam_tpu.system.system import System
    from mcptam_tpu.system.mapmaker import MapMaker, MM_RUNNING

    log("building scene (CPU backend)")
    # n_per_level sized so the live point count starts INSIDE the global
    # problem's final compaction bucket (1024 < n_pt <= 2048): the MKF the
    # warmup integrates then never flips the bucket, so the timed loop hits
    # zero fresh XLA compiles
    cams, cam_from_base, cams_sbi, ms, poses, frames = build_scene_on_cpu()
    log("scene on device; constructing System")
    sys_ = System(
        cams, cam_from_base, cams_sbi, H, W,
        tcfg=TrackerConfig(), mcfg=MapMakerConfig(),
        max_points=MAX_POINTS, max_mkfs=MAX_MKFS, max_meas=MAX_MEAS,
        mapmaker=MapMaker(cams=cams, mcfg=MapMakerConfig(),
                          ba_chunk=BA_CHUNK),
        pipeline_depth=2 * B,
    )
    sys_.ms = ms
    sys_.initialized = True
    sys_.mapmaker.state = MM_RUNNING
    sys_.tick_every = TICK_EVERY
    RESULTS["kernels"] = kernel_report()
    log(f"kernels: {RESULTS['kernels']}")

    ca = jnp.ones((C,), bool)
    clone = _device_clone_fn()
    ts0, ms0 = clone(sys_.ts), clone(sys_.ms)
    log("compiling: batched step")
    bfn = sys_._get_batch_fn(B)
    batches = [jnp.stack([frames[(i + j) % len(frames)] for j in range(B)])
               for i in range(0, len(frames), B)]
    qposes = sys_._empty_queue_poses
    ts, msd = sys_.ts, sys_.ms
    ts, msd, sc, _ = bfn(ts, msd, batches[0], ca, qposes)   # compile
    sc.block_until_ready()
    # the FIRST ~8 executions of a freshly compiled program on the
    # tunneled device run ~100x slow (server-side per-program warm-up;
    # measured 2 fps -> 219 fps across one warm loop with everything
    # else identical) — burn throwaway dispatches before timing
    log("batched step compiled; warming the program")
    for i in range(16):
        ts, msd, sc, _ = bfn(ts, msd, batches[i % len(batches)], ca, qposes)
    sc.block_until_ready()
    log("timing jit ceiling")
    n_jit = 128
    t0 = time.perf_counter()
    for i in range(n_jit // B):
        ts, msd, sc, _ = bfn(ts, msd, batches[i % len(batches)], ca, qposes)
    # end the window with a real host FETCH: block_until_ready over the
    # tunnel has been observed to return before the dependency chain
    # actually executed (a 33k-fps reading), while a value fetch cannot
    # lie — it transfers bytes produced by the final program
    jax.device_get(sc)
    jit_fps = n_jit / (time.perf_counter() - t0)
    log(f"jit step ceiling {jit_fps:.1f} fps")
    RESULTS["jit_fps"] = jit_fps
    # the ceiling loop donated + mutated its state; restore the pristine
    # clones for the e2e stage
    sys_.ts, sys_.ms = ts0, ms0
    ctx.update(sys_=sys_, frames=frames, poses=poses, ca=ca,
               batches=batches)


def stage_e2e(ctx: dict):
    """Stage 2: the remaining programs, scheduler warmup, then the timed
    end-to-end loop over one full trajectory period (no pose revisited
    within the timed window), with quality + ATE gates."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.ba.bundle import create_lm_state
    from mcptam_tpu.system.evaluate import ate_rmse

    sys_, frames, ca = ctx["sys_"], ctx["frames"], ctx["ca"]
    mm = sys_.mapmaker

    # --- explicit compile pass: every device program the steady-state
    # loop can hit, compiled exactly once, outputs discarded (functional
    # state: nothing mutates except via reassignment).
    feats = sys_._feats_fn(frames[0])
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

    # a short real run so tracker/map state settle into steady state; the
    # cursor tracks dispatched frames so the timed loop CONTINUES the
    # trajectory (no pose jump at the warmup/timed seam)
    cursor = 0
    sys_.mapmaker.on_map_changed()
    while cursor < 88:
        sys_.process_frames(jnp.stack(
            [frames[(cursor + j) % len(frames)] for j in range(B)]))
        cursor += B
        if (cursor > 12 and not mm.queue and mm._ba_kind == "none"
                and mm._local_done and mm._global_done):
            break
    sys_.flush_pipeline()
    log(f"warmup complete at frame {cursor}; timing e2e")

    # --- timed section: fresh BA work over one full trajectory period,
    # frames streamed B per dispatch (the throughput deployment mode);
    # every scheduler action, including keyframe integration, is compiled
    # and can fire.
    n_frames = N_POSES
    mm._idle_ticks = 1   # off the refind phases; GC path stays warm
    sys_.mapmaker.on_map_changed()
    by_fid = {}
    t0 = time.perf_counter()
    end = cursor + n_frames
    while cursor < end:
        infos = sys_.process_frames(jnp.stack(
            [frames[(cursor + j) % len(frames)] for j in range(B)]))
        cursor += B
        for info in infos:
            by_fid[info.frame_id] = info
    for info in sys_.flush_pipeline():
        by_fid[info.frame_id] = info
    e2e_fps = n_frames / (time.perf_counter() - t0)
    log(f"e2e {e2e_fps:.1f} fps; ba converged={mm._global_done}")

    # pose error + ATE in pure numpy (an eager device op per frame costs
    # a tunnel round-trip each); frame fid maps to trajectory pose
    # fid % N_POSES because every dispatched frame stepped the cursor
    poses_h = [(np.asarray(p.R), np.asarray(p.t)) for p in ctx["poses"]]
    found, errs, est34, gt34 = [], [], [], []
    for fid in sorted(by_fid):
        info = by_fid[fid]
        found.append(info.n_found)
        Rg, tg = poses_h[fid % N_POSES]
        Re, te = info.pose[:, :3], info.pose[:, 3]
        dR = Re @ Rg.T
        ang = np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
        dt = te - dR @ tg
        errs.append(float(np.hypot(ang, np.linalg.norm(dt))))
        est34.append(info.pose)
        gt34.append(np.concatenate([Rg, tg[:, None]], axis=1))
    ate = ate_rmse(np.stack(est34), np.stack(gt34))
    log(f"ate {ate['rmse']:.2e} m (scale {ate['scale']:.4f}); "
        f"mean_found {np.mean(found):.1f}; max_pose_err {np.max(errs):.4f}")
    RESULTS.update(e2e_fps=e2e_fps, mean_found=float(np.mean(found)),
                   max_pose_err=float(np.max(errs)),
                   ate_m=float(ate["rmse"]))


def bench_lm(chunks: int = 6, chunk: int = 10):
    """Stage 3: LM iterations/sec on the PRODUCTION layout (grouped obs
    table, the path system/mapmaker.py runs), budget-permitting, in cost
    order: a mid-size global problem, the compacted local problem, and
    the full static-capacity problem.  D is sized from the data exactly
    like MapMaker._sized_table; the bench asserts no Hessian edges were
    dropped.  Fills RESULTS["lm"] / RESULTS["reproj_delta"]."""
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
    out = RESULTS.setdefault("lm", {})
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
        jax.device_get(st.cost)
        for _ in range(3):                # past the per-program slow window
            st = run(prob_t, st, cams)
        jax.device_get(st.cost)
        st = create_lm_state(prob_t)
        t0 = time.perf_counter()
        for _ in range(chunks):
            st = run(prob_t, st, cams)
        jax.device_get(st.cost)           # real host fetch ends the window
        dt = time.perf_counter() - t0
        out[name] = chunks * chunk / dt
        log(f"lm[{name}]: {out[name]:.1f} iters/s")
        checkpoint("lm")

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
                RESULTS["reproj_delta"] = float(
                    jnp.sum(jnp.linalg.norm(e, axis=-1) * okm)
                    / max(n_ok, 1)
                )
            log(f"lm fidelity: {RESULTS['reproj_delta']:.2e} px "
                f"over {n_ok} meas")
            checkpoint("lm")


def _result_line(stage: str) -> str:
    e2e_fps = RESULTS.get("e2e_fps")
    quality_ok = (
        e2e_fps is not None
        and RESULTS.get("mean_found", 0.0) >= 100.0
        and RESULTS.get("max_pose_err", 1.0) < 0.05
        and RESULTS.get("ate_m", 1.0) < 0.02
    )
    value = round(e2e_fps, 2) if (e2e_fps and quality_ok) else 0.0
    lm = RESULTS.get("lm", {})
    rd = RESULTS.get("reproj_delta")
    ate = RESULTS.get("ate_m")
    return json.dumps({
        "metric": "tracking_fps_4cam_vga_e2e",
        "value": value,
        "unit": "fps",
        "vs_baseline": round(value / 200.0, 4),
        "extra": {
            "stage": stage,
            "jit_step_fps": round(RESULTS.get("jit_fps", 0.0), 2),
            "lm_iters_per_sec": round(lm["global"], 2)
            if "global" in lm else None,
            "lm_iters_per_sec_local": round(lm["local"], 2)
            if "local" in lm else None,
            "lm_iters_per_sec_capacity": round(lm["capacity"], 2)
            if "capacity" in lm else None,
            "reproj_err_delta_px": float(f"{rd:.2e}")
            if rd is not None else None,
            "ate_m": float(f"{ate:.2e}") if ate is not None else None,
            "mean_found": round(RESULTS.get("mean_found", 0.0), 1),
            "max_pose_err": round(RESULTS.get("max_pose_err", 0.0), 5),
            "quality_ok": bool(quality_ok),
            "trajectory_poses": N_POSES,
            "kernels": RESULTS.get("kernels"),
            "bench_seconds": round(time.monotonic() - _T0, 1),
        },
    })


def checkpoint(stage: str):
    """Re-write the result file AND print a fresh line after every
    completed stage, so a later hang/kill still leaves the best finished
    prefix as the last parseable line (round-4 failure: nothing was
    emitted until the whole e2e stage returned)."""
    with _EMIT_LOCK:
        line = _result_line(stage)
        print(line, flush=True)
        rf = os.environ.get("BENCH_RESULT_FILE")
        if rf:
            try:
                with open(rf + ".tmp", "w") as f:
                    f.write(line + "\n")
                os.replace(rf + ".tmp", rf)
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
    checkpoint("watchdog_deadline")
    os._exit(0)


def _force_cpu_if_requested():
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # an explicit CPU request (validation runs, the prep child) needs
        # the config API: the axon sitecustomize's register() overwrites
        # jax_platforms with "axon,cpu" at interpreter start, and
        # backends() then initializes the axon client — which blocks
        # forever when the device tunnel is down
        import jax
        jax.config.update("jax_platforms", "cpu")


def _prep_main():
    """Scene-cache warmer: CPU-only, runs concurrently with the
    supervisor's tunnel probe so the measurement child finds a hot disk
    cache and spends its budget on the device instead of on renders."""
    _force_cpu_if_requested()
    try:
        build_scene_on_cpu()
        log("prep: scene cache ready")
    except Exception:
        import traceback
        traceback.print_exc()


def _enable_device_compile_cache():
    """Persistent XLA compile cache for the measurement child: the
    driver's end-of-round bench budget (~600 s) cannot absorb the ~500 s
    cold-compile bill over the tunnel, but with the cache warm (this
    session's runs populate it) every stage's programs load in seconds
    and the full metric set fits the budget."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache_tpu_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _child_main():
    """One measurement attempt (runs jax; may hang on a dead tunnel —
    the watchdog thread guarantees the JSON line regardless)."""
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(max(int(BUDGET_S) + 20, 30))
    wd = threading.Timer(max(BUDGET_S + 45.0, 75.0), _watchdog)
    wd.daemon = True
    wd.start()
    _force_cpu_if_requested()
    if os.environ.get("JAX_PLATFORMS", "").strip() != "cpu":
        _enable_device_compile_cache()
    ctx = {}
    try:
        stage_jit_step(ctx)
        checkpoint("jit_step")
        stage_e2e(ctx)
        checkpoint("e2e")
        bench_lm()
        checkpoint("complete")
    except _Deadline:
        log("deadline hit; emitting partial results")
        checkpoint("deadline_partial")
    except Exception:
        import traceback
        traceback.print_exc()
        log("bench stage failed; emitting whatever was measured")
        checkpoint("failed_partial")
    finally:
        signal.alarm(0)
        wd.cancel()


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


def _score(res: dict) -> tuple:
    ex = res.get("extra", {})
    return (res.get("value", 0.0) or 0.0, ex.get("jit_step_fps") or 0.0,
            1 if ex.get("lm_iters_per_sec") else 0)


def main():
    """Supervisor: never imports jax (so it can never hang on the
    tunnel); warms the scene cache in a CPU-pinned prep child while
    waiting for the device to answer, runs the measurement in a child
    process, and guarantees the LAST JSON line on stdout is the best
    result any attempt produced."""
    if os.environ.get("BENCH_CHILD") == "1":
        _child_main()
        return
    if os.environ.get("BENCH_PREP") == "1":
        _prep_main()
        return
    result_file = f"/tmp/bench_result_{os.getpid()}.json"
    try:
        os.remove(result_file)
    except OSError:
        pass
    env = dict(os.environ, BENCH_CHILD="1", BENCH_RESULT_FILE=result_file)

    # prep child: builds/refreshes the scene disk cache on the CPU
    # backend, concurrently with the tunnel probe (the cache is all the
    # measurement child needs from it; if it is still running when the
    # measurement starts, the measurement child just rebuilds in-process)
    prep_env = dict(os.environ, BENCH_PREP="1", JAX_PLATFORMS="cpu")
    prep = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=prep_env)

    # the tunnel is restored by an external daemon on its own schedule;
    # waiting for it beats burning the whole budget inside a hung init
    if env.get("JAX_PLATFORMS", "").strip() != "cpu":
        while remaining() > 240 and not _tunnel_ok():
            log("device tunnel unresponsive; waiting for it to heal")
            time.sleep(10)

    best = None
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
            if best is None or _score(res) > _score(best):
                best = res
            if res.get("value", 0.0) > 0.0 and \
                    res.get("extra", {}).get("stage") == "complete":
                break
            # a partial or zero result is worth one more try if budget
            # remains (the best attempt is what gets printed last)
            log(f"bench child finished stage="
                f"{res.get('extra', {}).get('stage')} value="
                f"{res.get('value')} (rc={rc}); retrying if budget remains")
        else:
            log(f"bench child exited rc={rc} without a result; retrying")
    if prep.poll() is None:
        prep.terminate()
    if best is not None:
        print(json.dumps(best), flush=True)
    else:
        log("budget exhausted with no child result; emitting zero line")
        checkpoint("no_attempt_completed")


if __name__ == "__main__":
    main()
