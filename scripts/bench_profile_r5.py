"""Round-5 throughput attribution on the real chip (PROFILE_r05.md).

Answers, with measured ms/frame, where the gap between the jitted-step
ceiling and the end-to-end rate goes, and whether a larger per-dispatch
batch closes it:

  stage ceiling (B)   — the batched tracker-step program alone
  pipeline-only e2e   — process_frames with the map-maker tick disabled:
                        adds host dispatch + drain/publish on top of the
                        step
  full e2e            — plus the map-maker interleave (BA chunks, GC,
                        refind sweeps, MKF integration on the same chip)

Run on the device: python scripts/bench_profile_r5.py [B ...]
Appends one result block per B to PROFILE_r05.md.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the bench helpers ARE the harness)


def run_for_B(B: int, lines: list, chunk: int = 4, tick: int = 1):
    import jax.numpy as jnp
    bench.B = B
    bench.BA_CHUNK = chunk
    bench.TICK_EVERY = tick
    ctx = {}
    t0 = time.monotonic()
    bench.stage_jit_step(ctx)
    jit_fps = bench.RESULTS["jit_fps"]
    lines.append(f"- B={B} chunk={chunk} tick={tick}: jit-step ceiling "
                 f"**{jit_fps:.1f} fps** ({1e3 / jit_fps:.2f} ms/frame)")

    # full compile pass + warmup + the standard timed e2e
    bench.stage_e2e(ctx)
    e2e = bench.RESULTS["e2e_fps"]
    lines.append(f"- B={B} chunk={chunk} tick={tick}: full e2e **{e2e:.2f} fps** "
                 f"({1e3 / e2e:.2f} ms/frame; mean_found "
                 f"{bench.RESULTS['mean_found']:.0f}, ate "
                 f"{bench.RESULTS['ate_m']:.2e} m)")

    # pipeline-only window: same loop, map-maker tick replaced by a no-op
    # (attribution only — NOT a deployment mode)
    sys_, frames = ctx["sys_"], ctx["frames"]
    mm_step = sys_.mapmaker.step
    sys_.mapmaker.step = lambda ms, budget_s=None: ms
    try:
        n_frames = bench.N_POSES
        cursor = 0
        t1 = time.perf_counter()
        while cursor < n_frames:
            sys_.process_frames(jnp.stack(
                [frames[(cursor + j) % len(frames)] for j in range(B)]))
            cursor += B
        sys_.flush_pipeline()
        pipe = n_frames / (time.perf_counter() - t1)
    finally:
        sys_.mapmaker.step = mm_step
    lines.append(f"- B={B} chunk={chunk} tick={tick}: pipeline-only e2e **{pipe:.2f} fps** "
                 f"({1e3 / pipe:.2f} ms/frame)")
    lines.append(
        f"- B={B} chunk={chunk} tick={tick} attribution: step {1e3 / jit_fps:.2f} ms + "
        f"host/publish {1e3 / pipe - 1e3 / jit_fps:.2f} ms + "
        f"map-maker interleave {1e3 / e2e - 1e3 / pipe:.2f} ms "
        f"= {1e3 / e2e:.2f} ms/frame"
    )
    lines.append("")
    bench.log(f"B={B} done in {time.monotonic() - t0:.0f}s")


def main():
    bench._enable_device_compile_cache()
    bench.BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    specs = sys.argv[1:] or ["8:4"]
    md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r05.md")
    with open(md, "a") as f:
        f.write(f"\n## Profile run ({time.strftime('%Y-%m-%d %H:%M')}, "
                f"1x TPU v5e via tunnel)\n\n")
    for spec in specs:
        parts = (spec.split(":") + ["4", "1"])[:3]
        lines = []
        try:
            run_for_B(int(parts[0]), lines, chunk=int(parts[1]),
                      tick=int(parts[2]))
        except Exception as e:                 # transient tunnel errors
            lines.append(f"- {spec}: FAILED ({type(e).__name__}: "
                         f"{str(e)[:120]})")
        # append PER CONFIG so a mid-sweep tunnel error loses nothing
        with open(md, "a") as f:
            f.write("\n".join(lines) + "\n")
        print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
