"""Shared plumbing for the app entry points."""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def ensure_jax_platform(platform: str = "auto"):
    """Pick the JAX backend before first use.  `auto` keeps the ambient
    default (TPU when present) but falls back to CPU if the pinned
    platform fails to initialize; `cpu` forces CPU (e.g. an off-board map
    server on a CPU host while the tracker owns the TPU)."""
    import jax
    if platform and platform != "auto":
        jax.config.update("jax_platforms", platform)
        return
    try:
        jax.devices()
    except Exception:
        jax.config.update("jax_platforms", "cpu")


def add_platform_arg(p: argparse.ArgumentParser):
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu", "axon"],
                   help="JAX backend (default: ambient)")


def add_rig_video_args(p: argparse.ArgumentParser, video_required=True):
    p.add_argument("--rig", default="",
                   help="rig JSON (io/rig_config.py); defaults to "
                        "<dataset>/rig.json when --video is a dataset dir")
    p.add_argument("--video", required=video_required,
                   help="(C,T,H,W) uint8 .npy/.npz frame sequence, or a "
                        "dataset DIRECTORY of per-camera image sequences "
                        "(io/dataset.py layout: camera*/NNNNNN.png|pgm + "
                        "timestamps.txt + rig.json)")
    p.add_argument("--frames", type=int, default=0,
                   help="max frames to process (0 = all)")
    p.add_argument("--fps", type=float, default=30.0, help="replay rate")


def build_system_inputs(args):
    """Returns (cams, cam_from_base, cams_sbi, H, W, masks, names,
    frames (C,T,H,W)|None, timestamps (C,T)|None)."""
    from mcptam_tpu.io.rig_config import load_rig, load_video
    from mcptam_tpu.io.synthetic import make_sbi_cams

    stamps = None
    if args.video and os.path.isdir(args.video):
        from mcptam_tpu.io.dataset import load_dataset
        if args.rig:
            from mcptam_tpu.io.dataset import load_sequence_dir
            cams, cam_from_base, H, W, masks, names = load_rig(args.rig)
            frames, stamps = load_sequence_dir(
                args.video, names=names, limit=args.frames)
        else:
            (cams, cam_from_base, H, W, masks, names, frames,
             stamps) = load_dataset(args.video, limit=args.frames)
    else:
        if not args.rig:
            raise SystemExit("--rig is required unless --video is a "
                             "dataset directory carrying rig.json")
        cams, cam_from_base, H, W, masks, names = load_rig(args.rig)
        frames = load_video(args.video) if args.video else None
        if frames is not None and args.frames:
            frames = frames[:, : args.frames]
    if frames is not None:
        assert frames.shape[2:] == (H, W), \
            f"video {frames.shape} does not match rig {H}x{W}"
    cams_sbi = make_sbi_cams(cams, H, W)
    return (cams, cam_from_base, cams_sbi, H, W, masks, names, frames,
            stamps)


def run_tracking_loop(system, frames, fps, out_map=None, print_every=1,
                      batch=1, timestamps=None):
    """Shared main loop of mcptam / mcptam_client: replay through the
    native synced queue, track every frame set, report state.

    batch > 1 streams that many frames per device dispatch through
    System.process_frames (the throughput mode; FrameInfos drain with
    bounded lag and carry their frame_id) — pair with a System built
    with pipeline_depth > 0 for remote-accelerator deployments."""
    import jax.numpy as jnp
    from mcptam_tpu.io.video_source import ReplaySource

    def report(info):
        if info.frame_id % print_every == 0 and not info.provisional:
            t = info.pose[:, 3]
            print(
                f"frame {info.frame_id:4d}  quality={info.quality} "
                f"lost={int(info.lost)} "
                f"found={info.n_found:4d} points={info.n_points:5d} "
                f"mkfs={info.n_mkfs:2d} t=[{t[0]:+.3f} {t[1]:+.3f} {t[2]:+.3f}] "
                f"track={info.timing.total * 1e3:6.1f}ms",
                flush=True,
            )

    src = ReplaySource(frames, fps=fps, timestamps=timestamps)
    src.start()
    T = frames.shape[1]
    infos = []
    buf = []
    for i in range(T):
        out = src.queue.get(timeout_ms=10000)
        if out is None:
            print(f"[mcptam] frame {i}: queue timeout", file=sys.stderr)
            break
        imgs, ts = out
        if batch > 1:
            buf.append(jnp.asarray(imgs, jnp.float32))
            if len(buf) == batch:
                for info in system.process_frames(jnp.stack(buf)):
                    infos.append(info)
                    report(info)
                buf = []
        else:
            info = system.process_frame(jnp.asarray(imgs, jnp.float32))
            infos.append(info)
            report(info)
    # end of stream: drain the pipeline, then the partial-batch tail
    for info in system.flush_pipeline():
        infos.append(info)
        report(info)
    for img in buf:                      # leftover tail of a partial batch
        info = system.process_frame(img)
        infos.append(info)
        report(info)
    for info in system.flush_pipeline():
        infos.append(info)
        report(info)
    src.queue.close()
    if infos and any(i.frame_id >= 0 for i in infos):
        # drained order == frame order, but drop provisional duplicates
        # from pipeline priming and sort by frame id for the caller
        seen = {}
        for i in infos:
            if not i.provisional or i.frame_id not in seen:
                seen[i.frame_id] = i
        infos = [seen[k] for k in sorted(seen)]
    if out_map:
        from mcptam_tpu.system.mapio import save_map
        save_map(out_map, system.ms)
        print(f"[mcptam] map saved to {out_map}")
    return infos


def load_gt_poses(path: str):
    """Ground-truth base_from_world trajectory: (T,3,4) [R|t] matrices or
    (T,6) se3 ln() vectors in a .npy file."""
    import numpy as np
    arr = np.load(path)
    if arr.ndim == 3 and arr.shape[1:] == (3, 4):
        return np.asarray(arr, np.float64)
    if arr.ndim == 2 and arr.shape[1] == 6:
        import jax.numpy as jnp
        from mcptam_tpu.core.se3 import SE3
        poses = SE3.exp(jnp.asarray(arr, jnp.float32))
        return np.concatenate(
            [np.asarray(poses.R), np.asarray(poses.t)[..., None]], axis=-1
        ).astype(np.float64)
    raise ValueError(f"expected (T,3,4) or (T,6) gt poses, got {arr.shape}")
