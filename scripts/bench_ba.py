"""BA throughput bench: ChainBundle-equivalent LM iterations/sec.

The reference publishes BA timing live (elapsed seconds + accepted/total LM
iterations per run, msg/MapMakerTiming.msg, src/MapMaker.cc:197-265) with
no absolute anchor; BASELINE.md lists "LM iterations/sec" as a rebuild
metric.  This bench times `lm_run` on a representative synthetic problem
at three sizes (local-BA-like, global-BA-like, large), chained so the
runtime cannot replay results.

Usage: python scripts/bench_ba.py            (real chip via axon)
       JAX_PLATFORMS=cpu python scripts/bench_ba.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def build(n_poses, n_points, n_cams, H=480, W=640, seed=0, sparse_k=None,
          noise=0.3):
    """sparse_k: if set, sample that many random (pose, cam, point)
    measurements instead of the dense product — the realistic shape of a
    capacity-sized map (MAX_MEAS measurements over MAX_POINTS points).
    noise: measurement noise sigma in pixels (0 for fidelity oracles)."""
    import jax.numpy as jnp
    from mcptam_tpu.core.se3 import SE3
    from mcptam_tpu.core.camera import project
    from mcptam_tpu.io.synthetic import make_rig
    from mcptam_tpu.ba.bundle import BundleProblem

    rng = np.random.default_rng(seed)
    cams, cam_from_base = make_rig(n_cams, H, W, spread_deg=25.0)
    gt = rng.normal(size=(n_poses, 6)) * np.array([0.1] * 3 + [0.03] * 3)
    gt[0] = 0
    pose_a_gt = SE3.exp(jnp.asarray(gt, jnp.float32))
    dirs = rng.normal(size=(n_points, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.8
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = jnp.asarray(dirs * rng.uniform(3, 8, (n_points, 1)), jnp.float32)

    mpa, mpb, mpt, mcam, muv, mlvl, mok = [], [], [], [], [], [], []
    if sparse_k is not None:
        # ONE batched projection over all sampled (pose, cam, point)
        # triples — a per-(pose,cam) loop here used to compile a separate
        # XLA program per data-dependent subset shape (up to 192 compiles
        # at capacity scale, minutes of wall time on a tunneled chip)
        import jax
        p_ids = rng.integers(0, n_poses, sparse_k)
        c_ids = rng.integers(0, n_cams, sparse_k)
        t_ids = rng.integers(0, n_points, sparse_k)
        pose_m = jax.tree_util.tree_map(
            lambda a: a[c_ids], cam_from_base
        ) @ jax.tree_util.tree_map(lambda a: a[p_ids], pose_a_gt)
        cam_m = jax.tree_util.tree_map(lambda a: a[c_ids], cams)
        uv, ok = jax.jit(project)(cam_m, pose_m.apply(pts[t_ids]))
        muv.append(np.asarray(uv) + rng.normal(size=(sparse_k, 2)) * noise)
        mok.append(np.asarray(ok))
        mpa.append(p_ids)
        mpb.append(c_ids)
        mpt.append(t_ids)
        mcam.append(c_ids)
        mlvl.append(np.zeros(sparse_k))
    else:
        for p in range(n_poses):
            for c in range(n_cams):
                pose = cam_from_base[c] @ pose_a_gt[p]
                uv, ok = project(cams[c], pose.apply(pts))
                muv.append(np.asarray(uv) + rng.normal(size=(n_points, 2)) * noise)
                mok.append(np.asarray(ok))
                mpa.append(np.full(n_points, p))
                mpb.append(np.full(n_points, c))
                mpt.append(np.arange(n_points))
                mcam.append(np.full(n_points, c))
                mlvl.append(np.zeros(n_points))
    pert = rng.normal(size=(n_poses, 6)) * 0.02
    pert[0] = 0
    import jax
    prob = BundleProblem(
        pose_a=SE3.exp(jnp.asarray(pert, jnp.float32)) @ pose_a_gt,
        pose_b=cam_from_base,
        movable_a=jnp.asarray([False] + [True] * (n_poses - 1)),
        movable_b=jnp.zeros((n_cams,), bool),
        points=pts + jnp.asarray(rng.normal(size=(n_points, 3)) * 0.04,
                                 jnp.float32),
        movable_pt=jnp.ones((n_points,), bool),
        m_pose_a=jnp.asarray(np.concatenate(mpa), jnp.int32),
        m_pose_b=jnp.asarray(np.concatenate(mpb), jnp.int32),
        m_point=jnp.asarray(np.concatenate(mpt), jnp.int32),
        m_cam=jnp.asarray(np.concatenate(mcam), jnp.int32),
        m_uv=jnp.asarray(np.concatenate(muv), jnp.float32),
        m_level=jnp.asarray(np.concatenate(mlvl), jnp.int32),
        m_valid=jnp.asarray(np.concatenate(mok)),
    )
    return prob, cams


def bench_one(name, n_poses, n_points, n_cams, n_steps=10, reps=10,
              sparse_k=None):
    import jax
    from mcptam_tpu.ba.bundle import create_lm_state, lm_run

    prob, cams = build(n_poses, n_points, n_cams, sparse_k=sparse_k)
    K = int(prob.m_uv.shape[0])
    run = jax.jit(lambda p, s: lm_run(p, s, cams, n_steps))
    st0 = create_lm_state(prob)
    st = run(prob, st0)
    jax.block_until_ready(st)

    # chain: each rep continues from the previous LM state
    st = st0
    t0 = time.perf_counter()
    for _ in range(reps):
        st = run(prob, st)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    iters_per_s = n_steps * reps / dt
    print(json.dumps({
        "metric": f"ba_lm_iters_per_sec_{name}",
        "value": round(iters_per_s, 2),
        "unit": "LM iters/s",
        "poses": n_poses, "points": n_points, "cams": n_cams,
        "measurements": K,
        "ms_per_iter": round(dt / (n_steps * reps) * 1e3, 3),
        "accepted": int(st.accepted), "iterations": int(st.iterations),
    }), flush=True)


def main():
    import jax
    # sitecustomize pins JAX_PLATFORMS=axon; honor an explicit env choice
    # through the config API, which wins over the pin
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    # local BA shape: newest + 3 neighbors, their points (ref
    # BundleAdjusterBase::BundleAdjustRecent, snRecentNum=3)
    bench_one("local", n_poses=4, n_points=512, n_cams=4)
    # global BA mid-size map
    bench_one("global", n_poses=8, n_points=2048, n_cams=4)
    # stress: large map
    bench_one("large", n_poses=16, n_points=8192, n_cams=4, reps=5)
    # full static capacity (config.MAX_MKFS=48 x MAX_POINTS=4096): the
    # worst-case global-BA shape a live map can reach; W materializes as
    # (P,L,6,3) so this also bounds the Schur memory footprint
    bench_one("capacity", n_poses=48, n_points=4096, n_cams=4, reps=3,
              sparse_k=32768)


if __name__ == "__main__":
    main()
