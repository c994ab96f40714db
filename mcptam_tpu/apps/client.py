"""On-board tracking client (the `mcptam_client` binary, src/MainClient.cc).

    python -m mcptam_tpu.apps.client --rig rig.json --video seq.npz \
        --server host:port
"""

from __future__ import annotations

import argparse

from mcptam_tpu.apps._common import (
    ensure_jax_platform, add_platform_arg, add_rig_video_args, build_system_inputs,
    run_tracking_loop,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(p)
    add_rig_video_args(p)
    p.add_argument("--server", required=True, help="host:port of map server")
    p.add_argument("--max-points", type=int, default=None)
    p.add_argument("--max-mkfs", type=int, default=None)
    p.add_argument("--max-meas", type=int, default=None)
    args = p.parse_args(argv)
    ensure_jax_platform(args.platform)

    from mcptam_tpu.config import MAX_POINTS, MAX_MKFS, MAX_MEAS
    from mcptam_tpu.system.client import SystemClient

    cams, cam_from_base, cams_sbi, H, W, masks, names, frames, stamps = \
        build_system_inputs(args)
    host, port = args.server.rsplit(":", 1)
    system = SystemClient(
        cams, cam_from_base, cams_sbi, H, W, host, int(port), masks=masks,
        max_points=args.max_points or MAX_POINTS,
        max_mkfs=args.max_mkfs or MAX_MKFS,
        max_meas=args.max_meas or MAX_MEAS,
    )
    run_tracking_loop(system, frames, args.fps, timestamps=stamps)
    system.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
