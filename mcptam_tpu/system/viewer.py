"""Headless visualization: the KeyFrameViewer / rviz-publishing analogue.

The reference renders keyframes with per-level colored measurements in a GL
window (KeyFrameViewer.h:57-89, GLWindow2) and publishes the map as a PCL
cloud + MKF axis markers for rviz (MapMakerBase::PublishMapVisualization,
src/MapMakerBase.cc:359-472).  Headless equivalent: PPM image dumps with
measurement overlays, and a PLY point-cloud/trajectory export any viewer
can open.
"""

from __future__ import annotations

import numpy as np

from mcptam_tpu.config import LEVELS
from mcptam_tpu.map.state import MapState

# per-level overlay colors, mirroring the reference's level colors
LEVEL_COLORS = ((255, 0, 0), (255, 255, 0), (0, 255, 0), (0, 0, 255))


def write_ppm(path: str, rgb: np.ndarray):
    """(H,W,3) uint8 -> binary PPM (no image library needed)."""
    H, W, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{W} {H}\n255\n".encode())
        f.write(np.ascontiguousarray(rgb, np.uint8).tobytes())


def _draw_cross(rgb, x, y, color, r=2):
    H, W, _ = rgb.shape
    xi, yi = int(round(x)), int(round(y))
    if not (0 <= xi < W and 0 <= yi < H):
        return
    rgb[yi, max(0, xi - r) : min(W, xi + r + 1)] = color
    rgb[max(0, yi - r) : min(H, yi + r + 1), xi] = color


def keyframe_overlay(ms: MapState, mkf_idx: int, cam_idx: int) -> np.ndarray:
    """Render one stored keyframe with its measurements overlaid
    (KeyFrameViewer::Draw analogue).  Returns (H,W,3) uint8."""
    from mcptam_tpu.ops.atlas import _level0_width_from_atlas

    atlas = np.asarray(ms.mkfs.atlas[mkf_idx, cam_idx])
    H = atlas.shape[0]
    W = _level0_width_from_atlas(atlas.shape[1])
    img = np.clip(atlas[:, :W], 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)

    meas = ms.meas
    sel = (
        np.asarray(meas.valid)
        & (np.asarray(meas.mkf) == mkf_idx)
        & (np.asarray(meas.cam) == cam_idx)
    )
    uv = np.asarray(meas.uv_l0)[sel]
    lvl = np.asarray(meas.level)[sel]
    for (x, y), l in zip(uv, lvl):
        _draw_cross(rgb, x, y, LEVEL_COLORS[int(l) % LEVELS])
    return rgb


def dump_keyframes(ms: MapState, out_dir: str, max_mkfs: int | None = None):
    """Write every valid keyframe as <out_dir>/mkf<i>_cam<c>.ppm."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    valid = np.asarray(ms.mkfs.valid)
    kf_valid = np.asarray(ms.mkfs.kf_valid)
    count = 0
    paths = []
    for m in range(ms.mkfs.capacity):
        if not valid[m]:
            continue
        for c in range(kf_valid.shape[1]):
            if not kf_valid[m, c]:
                continue
            p = os.path.join(out_dir, f"mkf{m}_cam{c}.ppm")
            write_ppm(p, keyframe_overlay(ms, m, c))
            paths.append(p)
        count += 1
        if max_mkfs and count >= max_mkfs:
            break
    return paths


def export_ply(path: str, ms: MapState, trajectory=None):
    """Map points (+ optional camera trajectory) as ASCII PLY — the
    rviz PCL-cloud/marker analogue; opens in MeshLab/CloudCompare/etc."""
    pts = ms.points
    live = np.asarray(pts.valid & ~pts.bad)
    pos = np.asarray(pts.pos_w)[live]
    lvl = np.asarray(pts.src_level)[live]
    colors = np.asarray([LEVEL_COLORS[int(l) % LEVELS] for l in lvl],
                        np.uint8) if len(lvl) else np.zeros((0, 3), np.uint8)

    # MKF camera centers (base_from_world^-1 translation) in white
    bfw_R = np.asarray(ms.mkfs.base_from_world.R)
    bfw_t = np.asarray(ms.mkfs.base_from_world.t)
    mvalid = np.asarray(ms.mkfs.valid)
    centers = np.stack([
        -bfw_R[m].T @ bfw_t[m] for m in range(len(mvalid)) if mvalid[m]
    ]) if mvalid.any() else np.zeros((0, 3))

    traj = np.asarray(trajectory) if trajectory is not None else np.zeros((0, 3))

    n = len(pos) + len(centers) + len(traj)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(pos, colors):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
        for p in centers:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} 255 255 255\n")
        for p in traj:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} 255 0 255\n")
    return n


def frame_small_image(feats, result=None, level: int = 2) -> np.ndarray:
    """Tiled per-camera monitor image at a pyramid level, with the current
    frame's found measurements overlaid — the remote-monitoring small image
    (ref SystemFrontendBase::PublishSmallImage, two-column tiling,
    src/SystemFrontendBase.cc:280-346).  Returns (Ht,Wt,3) uint8."""
    from mcptam_tpu.config import LEVELS
    from mcptam_tpu.ops.atlas import atlas_xoff, level_dims, _level0_width_from_atlas

    atlas = np.asarray(feats.atlas)
    C, H = atlas.shape[0], atlas.shape[1]
    W = _level0_width_from_atlas(atlas.shape[2])
    level = int(level) % LEVELS
    h, w = level_dims(H, W, level)
    xoff = atlas_xoff(W)[level]
    scale = 1 << level

    cols = 2 if C > 1 else 1
    rows = -(-C // cols)
    tiled = np.zeros((rows * h, cols * w, 3), np.uint8)
    for c in range(C):
        img = np.clip(atlas[c, :h, xoff:xoff + w], 0, 255).astype(np.uint8)
        r0, c0 = (c // cols) * h, (c % cols) * w
        tiled[r0:r0 + h, c0:c0 + w] = img[..., None]

    if result is not None:
        found = np.asarray(result.sel_found)
        cam = np.asarray(result.sel_cam)[found]
        lvl = np.asarray(result.sel_level)[found]
        uv = np.asarray(result.sel_pos_l0)[found] / scale
        for (x, y), c, l in zip(uv, cam, lvl):
            r0, c0 = (int(c) // cols) * h, (int(c) % cols) * w
            _draw_cross(tiled, c0 + x, r0 + y, LEVEL_COLORS[int(l) % LEVELS], r=1)
    return tiled
