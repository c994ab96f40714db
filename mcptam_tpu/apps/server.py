"""Off-board map server (the `mcptam_server` binary, src/MainServer.cc).

    python -m mcptam_tpu.apps.server --rig rig.json [--port 0]

Prints `PORT <n>` once listening (port 0 = kernel-assigned).
"""

from __future__ import annotations

import argparse
import signal
import threading

from mcptam_tpu.apps._common import ensure_jax_platform, add_platform_arg


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(p)
    p.add_argument("--rig", required=True)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--max-points", type=int, default=None)
    p.add_argument("--max-mkfs", type=int, default=None)
    p.add_argument("--max-meas", type=int, default=None)
    args = p.parse_args(argv)
    ensure_jax_platform(args.platform)

    from mcptam_tpu.config import MAX_POINTS, MAX_MKFS, MAX_MEAS
    from mcptam_tpu.io.rig_config import load_rig
    from mcptam_tpu.map.state import create_map_state
    from mcptam_tpu.system.network import Channel, MapServer

    cams, cam_from_base, H, W, masks, names = load_rig(args.rig)
    channel = Channel.serve(args.port)
    print(f"PORT {channel.port}", flush=True)
    ms = create_map_state(
        H, W, int(cam_from_base.t.shape[0]), cam_from_base,
        args.max_points or MAX_POINTS, args.max_mkfs or MAX_MKFS,
        args.max_meas or MAX_MEAS,
    )
    server = MapServer(channel, cams, ms)

    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *a: stop.set())
    signal.signal(signal.SIGTERM, lambda *a: stop.set())
    server.run(stop_event=stop)
    channel.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
