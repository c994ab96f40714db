"""Float64 oracle for the BA fidelity test (run in a subprocess with
JAX_ENABLE_X64=1 so the rest of the suite stays in default float32).

Builds the shared synthetic bundle problem (tests/test_bundle.build_problem),
casts every floating leaf to float64, runs the identical lm_run, and prints
the final RMS reprojection error as one JSON line.  This stands in for the
reference's double-precision g2o/CHOLMOD solve (ref src/ChainBundle.cc:
1305-1366) as the fidelity anchor: BASELINE.md's north star requires the
shipped float32 solver to match a double-precision solve within 1e-3 px.

Usage: python scripts/fidelity_oracle.py <seed> <n_poses> <n_points> <n_cams>
       <noise_px> <n_steps>
"""

import json
import os
import sys

os.environ["JAX_ENABLE_X64"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu_tests")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [_REPO, os.path.join(_REPO, "tests")]


def main():
    seed, n_poses, n_points, n_cams = (int(a) for a in sys.argv[1:5])
    noise_px = float(sys.argv[5])
    n_steps = int(sys.argv[6])

    import jax

    # sitecustomize may import jax before this script body runs, making the
    # env vars above too late — the config API wins either way
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from test_bundle import build_problem, rms_reproj
    from mcptam_tpu.ba.bundle import create_lm_state, lm_run

    def to_f64(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    rng = np.random.default_rng(seed)
    prob, cams, _, _, _ = build_problem(
        rng, n_poses=n_poses, n_points=n_points, n_cams=n_cams,
        noise_px=noise_px,
    )
    prob, cams = to_f64(prob), to_f64(cams)
    st = create_lm_state(prob)
    st = lm_run(prob, st, cams, n_steps)
    print(json.dumps({
        "rms": rms_reproj(prob, st, cams),
        "accepted": int(st.accepted),
        "iterations": int(st.iterations),
        "dtype": str(st.points.dtype),
    }))


if __name__ == "__main__":
    main()
