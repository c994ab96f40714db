"""Benchmark: the BASELINE.json metric set on one chip.

Prints ONE JSON line whose primary metric is END-TO-END 4-camera VGA
tracking FPS — the full `System.process_frame` path: feature extraction,
tracking, add-MKF heuristics, the map-maker tick (bundle-adjustment chunks
interleaved on the same chip) and pose/covariance publication, on a
realistically populated map.  vs_baseline is against the 200 FPS rebuild
target (BASELINE.json north_star).

The `extra` field carries the rest of the BASELINE.json metric set:
  jit_step_fps       — the jitted tracker step alone (device-bound ceiling)
  lm_iters_per_sec   — ChainBundle-equivalent LM iterations/sec
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
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def bench_e2e(n_frames: int = 60):
    """End-to-end System FPS + quality + jitted-step FPS."""
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.config import TrackerConfig, MapMakerConfig
    from mcptam_tpu.core.se3 import SE3
    from mcptam_tpu.io.synthetic import (
        make_rig, make_sbi_cams, render_rig, build_groundtruth_map,
    )
    from mcptam_tpu.map.keyframe import make_frame_features
    from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state
    from mcptam_tpu.system.system import System
    from mcptam_tpu.system.mapmaker import MM_RUNNING

    H, W, C = 480, 640, 4
    cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    MAX_MKFS = 16
    ms, _ = build_groundtruth_map(
        cams, cam_from_base, H, W, n_per_level=60,
        max_points=2048, max_mkfs=MAX_MKFS, max_meas=8192,
    )
    tcfg = TrackerConfig()

    # trajectory loop: small motions around the mapped viewpoint, a
    # different frame every step like a live feed
    poses, frames = [], []
    for i in range(8):
        v = jnp.asarray([
            0.012 * (i % 4), -0.006 * (i % 3), 0.008 * (i % 4),
            0.002 * (i % 3), -0.0015 * (i % 2), 0.001 * (i % 4),
        ])
        pose = SE3.exp(v)
        poses.append(pose)
        frames.append(jnp.clip(
            jnp.asarray(render_rig(cams, cam_from_base, pose, 3.0, H, W)),
            0, 255,
        ).astype(jnp.uint8))

    # --- jitted tracker step alone (the device ceiling)
    @jax.jit
    def step(ts, ms, images):
        feats = make_frame_features(images)
        new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
        return new_ts, res.pose.t, res.tot_found

    ts = create_tracker_state(C)
    ts, t_out, _ = step(ts, ms, frames[0])
    t_out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_frames):
        ts, t_out, _ = step(ts, ms, frames[i % len(frames)])
    t_out.block_until_ready()
    jit_fps = n_frames / (time.perf_counter() - t0)

    # --- full System loop with the map maker interleaved
    sys_ = System(
        cams, cam_from_base, cams_sbi, H, W, tcfg=tcfg,
        mcfg=MapMakerConfig(),
        max_points=2048, max_mkfs=MAX_MKFS, max_meas=8192,
    )
    sys_.ms = ms
    sys_.initialized = True
    sys_.mapmaker.state = MM_RUNNING
    sys_.mapmaker.on_map_changed()   # BA has real work during the bench

    # warmup: compile every per-frame path (features, fused step, BA chunk)
    for i in range(6):
        sys_.process_frame(frames[i % len(frames)])

    found, errs = [], []
    t0 = time.perf_counter()
    for i in range(n_frames):
        info = sys_.process_frame(frames[i % len(frames)])
        found.append(info.n_found)
        err = np.asarray(
            (SE3(R=jnp.asarray(info.pose[:, :3]),
                 t=jnp.asarray(info.pose[:, 3]))
             @ poses[i % len(poses)].inv()).ln()
        )
        errs.append(np.linalg.norm(err))
    e2e_fps = n_frames / (time.perf_counter() - t0)
    return e2e_fps, jit_fps, float(np.mean(found)), float(np.max(errs))


def bench_lm(chunks: int = 6, chunk: int = 10):
    """LM iterations/sec on the PRODUCTION layout (grouped obs table, the
    path system/mapmaker.py runs) at the three scales the scheduler sees:
    the compacted local problem, a mid-size global problem, and the full
    static-capacity global problem.  D is sized from the data exactly like
    MapMaker._sized_table; the bench asserts no Hessian edges were
    dropped.  Returns ({name: iters/sec}, fidelity_err_px)."""
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

    cases = {
        # local BA: newest + 3 neighbors over their points (snRecentNum=3)
        "local": dict(n_poses=4, n_points=512, n_cams=4, sparse_k=2048),
        # global BA, mid-size live map
        "global": dict(n_poses=16, n_points=2048, n_cams=4, sparse_k=8192),
        # full static capacity (MAX_MKFS=48 x MAX_POINTS=4096 x MAX_MEAS)
        "capacity": dict(n_poses=48, n_points=4096, n_cams=4,
                         sparse_k=32768),
    }
    out = {}
    fid_err = None
    for name, kw in cases.items():
        prob, cams = build(**kw)
        dmax = int(jax.device_get(max_obs_per_point(prob)))
        D = _bucket(max(dmax, 1), (8, 16, 24, 32, 48, 64))
        prob_t = attach_obs_table(prob, D)
        n_drop = int(jax.device_get(prob_t.obs_dropped))
        assert n_drop == 0, (
            f"bench_lm[{name}]: obs table D={D} dropped {n_drop} "
            f"measurements (max per-point count {dmax})"
        )
        run = jax.jit(lambda p, s: lm_run(p, s, cams, chunk))
        st = create_lm_state(prob_t)
        st = run(prob_t, st)              # compile
        st.cost.block_until_ready()
        st = create_lm_state(prob_t)
        t0 = time.perf_counter()
        for _ in range(chunks):
            st = run(prob_t, st)
        st.cost.block_until_ready()
        dt = time.perf_counter() - t0
        out[name] = chunks * chunk / dt

    # fidelity: mean reprojection error the f32 LM leaves on a NOISELESS
    # synthetic bundle (target < 1e-3 px), on the same production layout
    from mcptam_tpu.ba.bundle import _residuals_and_jacobians
    prob, cams = build(n_poses=8, n_points=512, n_cams=4, noise=0.0)
    prob_t = attach_obs_table(
        prob, _bucket(int(jax.device_get(max_obs_per_point(prob))),
                      (8, 16, 24, 32, 48, 64))
    )
    st = create_lm_state(prob_t)
    st = jax.jit(lambda p, s: lm_run(p, s, cams, 30))(prob_t, st)
    e, _, _, _, ok = _residuals_and_jacobians(
        prob, st.pose_a, st.pose_b, st.points, cams
    )
    fid_err = float(np.asarray(
        jnp.sum(jnp.linalg.norm(e, axis=-1) * ok)
        / jnp.maximum(jnp.sum(ok), 1)
    ))
    return out, fid_err


def main():
    e2e_fps, jit_fps, mean_found, max_err = bench_e2e()
    lm_ips, reproj_delta = bench_lm()

    quality_ok = (mean_found >= 100.0) and (max_err < 0.05)
    value = round(e2e_fps, 2) if quality_ok else 0.0
    print(json.dumps({
        "metric": "tracking_fps_4cam_vga_e2e",
        "value": value,
        "unit": "fps",
        "vs_baseline": round(value / 200.0, 4),
        "extra": {
            "jit_step_fps": round(jit_fps, 2),
            "lm_iters_per_sec": round(lm_ips["global"], 2),
            "lm_iters_per_sec_local": round(lm_ips["local"], 2),
            "lm_iters_per_sec_capacity": round(lm_ips["capacity"], 2),
            "reproj_err_delta_px": float(f"{reproj_delta:.2e}"),
            "mean_found": round(mean_found, 1),
            "max_pose_err": round(max_err, 5),
            "quality_ok": quality_ok,
        },
    }))


if __name__ == "__main__":
    main()
