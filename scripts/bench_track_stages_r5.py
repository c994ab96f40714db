"""Per-stage tracker timing on the chip (TrackerTiming taxonomy).

The fused production step measures ~3.95 ms/frame at B=8 (254 fps
ceiling, PROFILE_r05.md); this breaks that budget down per stage via
System.profile_frame — one dispatch per stage — so optimization effort
lands where the milliseconds are.  Every staged program is warmed past
the tunnel's per-program slow window before the timed passes.

Run on the device: python scripts/bench_track_stages_r5.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mcptam_tpu.config import TrackerConfig, MapMakerConfig
    from mcptam_tpu.system.system import System
    from mcptam_tpu.system.mapmaker import MapMaker, MM_RUNNING

    bench.BUDGET_S = 1e9
    cams, cam_from_base, cams_sbi, ms, poses, frames = \
        bench.build_scene_on_cpu()
    sys_ = System(
        cams, cam_from_base, cams_sbi, bench.H, bench.W,
        tcfg=TrackerConfig(), mcfg=MapMakerConfig(),
        max_points=bench.MAX_POINTS, max_mkfs=bench.MAX_MKFS,
        max_meas=bench.MAX_MEAS,
        mapmaker=MapMaker(cams=cams, mcfg=MapMakerConfig()),
    )
    sys_.ms = ms
    sys_.initialized = True
    sys_.mapmaker.state = MM_RUNNING

    bench.log("compiling staged programs (first profile_frame call)")
    t0 = time.monotonic()
    sys_.profile_frame(frames[0])
    bench.log(f"staged programs compiled in {time.monotonic() - t0:.0f}s; "
              f"warming")
    for i in range(1, 17):      # past the per-program slow window
        sys_.profile_frame(frames[i % len(frames)])

    n = 24
    acc = {}
    t0 = time.perf_counter()
    for i in range(n):
        t = sys_.profile_frame(frames[(17 + i) % len(frames)])
        for k in ("kf_downsample", "sbi", "motion", "pvs", "coarse",
                  "fine", "pose", "depth", "add", "total"):
            acc[k] = acc.get(k, 0.0) + getattr(t, k, 0.0)
    wall = (time.perf_counter() - t0) / n
    lines = [f"\n## Staged step profile ({time.strftime('%Y-%m-%d %H:%M')}, "
             f"1x TPU v5e, {n} warm frames, one dispatch per stage)\n"]
    for k, v in acc.items():
        lines.append(f"- {k}: {v / n * 1e3:.3f} ms")
    lines.append(f"- wall clock per staged frame: {wall * 1e3:.2f} ms "
                 f"(staged dispatch overhead included; the FUSED step runs "
                 f"3.95 ms/frame)")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_r05.md"), "a") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
