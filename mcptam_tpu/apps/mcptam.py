"""Standalone tracker + map maker (the `mcptam` binary, src/Main.cc:53).

    python -m mcptam_tpu.apps.mcptam --rig rig.json --video seq.npz \
        [--out-map map.npz] [--frames N] [--fps 30]
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
    p.add_argument("--out-map", default="", help="save final map (.npz)")
    p.add_argument("--load-map", default="", help="start from a saved map")
    p.add_argument("--align-plane", action="store_true",
                   help="align world to the dominant plane at the end")
    p.add_argument("--export-ply", default="",
                   help="write the final map (+trajectory) as a PLY cloud")
    p.add_argument("--dump-kfs", default="",
                   help="directory for keyframe overlay images (.ppm)")
    p.add_argument("--eval-gt", default="",
                   help="ground-truth trajectory .npy ((T,3,4) or (T,6) "
                        "ln vectors); prints ATE/RPE after the run")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per device dispatch (throughput mode; "
                        "control actions lag by up to batch+pipeline "
                        "frames)")
    p.add_argument("--pipeline", type=int, default=0,
                   help="frames kept in flight before their results are "
                        "fetched (hides the device->host round-trip on "
                        "remote accelerators)")
    p.add_argument("--mm-tick-every", type=int, default=1,
                   help="run the map-maker tick every Nth batch dispatch "
                        "(BA chunks serialize with tracking on one chip; "
                        "2 with --batch 8 measured 202 fps vs 170 at 1, "
                        "PROFILE_r05.md)")
    args = p.parse_args(argv)
    ensure_jax_platform(args.platform)

    from mcptam_tpu.system.system import System

    cams, cam_from_base, cams_sbi, H, W, masks, names, frames, stamps = \
        build_system_inputs(args)
    system = System(cams, cam_from_base, cams_sbi, H, W, masks=masks,
                    pipeline_depth=args.pipeline)
    system.tick_every = args.mm_tick_every
    if args.load_map:
        from mcptam_tpu.system.mapio import load_map
        system.ms = load_map(args.load_map, system.ms)
        system.initialized = True
    infos = run_tracking_loop(system, frames, args.fps,
                              out_map=args.out_map or None,
                              batch=args.batch, timestamps=stamps)
    if args.eval_gt:
        import json
        from mcptam_tpu.apps._common import load_gt_poses
        from mcptam_tpu.system.evaluate import evaluate_run
        gt = load_gt_poses(args.eval_gt)[: len(infos)]
        scores = evaluate_run(infos, gt)
        print("[mcptam] eval " + json.dumps(scores))
    if args.align_plane:
        ok = system.align_to_dominant_plane()
        print(f"[mcptam] plane alignment {'done' if ok else 'failed'}")
        if args.out_map:
            from mcptam_tpu.system.mapio import save_map
            save_map(args.out_map, system.ms)
    if args.export_ply:
        from mcptam_tpu.system.viewer import export_ply
        n = export_ply(args.export_ply, system.ms)
        print(f"[mcptam] wrote {n} vertices to {args.export_ply}")
    if args.dump_kfs:
        from mcptam_tpu.system.viewer import dump_keyframes
        paths = dump_keyframes(system.ms, args.dump_kfs)
        print(f"[mcptam] wrote {len(paths)} keyframe overlays to {args.dump_kfs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
