"""Rig configuration files: camera intrinsics + extrinsics + sizes.

The reference assembles its rig from ROS CameraInfo services (9-vector
Taylor params per camera, src/VideoSourceMulti.cc RecordInfo), group YAMLs
(`groups/*.yaml`) and pose override files (`poses/*.dat`,
src/SystemBase.cc:68-99).  Here the whole rig is one JSON document:

{
  "width": 640, "height": 480,
  "cameras": [
    {"name": "camera1",
     "params": [a0, a2, a3, a4, xc, yc, c, d, e],          # Taylor 9-vector
     "cam_from_base": [ux, uy, uz, wx, wy, wz],            # SE3 ln(), optional
     "mask": "masks/camera1.npy"},                         # optional bool (H,W)
    ...
  ],
  "extrinsic_scale": 1.0                                   # optional
}
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import make_camera, stack_cameras, CameraModel


def load_rig(path: str):
    """Returns (cams: CameraModel (C,), cam_from_base: SE3 (C,), H, W,
    masks: (C,H,W) bool ndarray or None, names: list[str])."""
    with open(path) as f:
        doc = json.load(f)
    H, W = int(doc["height"]), int(doc["width"])
    scale = float(doc.get("extrinsic_scale", 1.0))
    base = os.path.dirname(os.path.abspath(path))

    cam_list, poses, masks, names = [], [], [], []
    any_mask = False
    for c in doc["cameras"]:
        names.append(c.get("name", f"camera{len(names) + 1}"))
        cam_list.append(make_camera(np.asarray(c["params"], np.float64), (W, H)))
        v6 = np.asarray(c.get("cam_from_base", np.zeros(6)), np.float32)
        v6[:3] *= scale  # extrinsic scale applies to translation only
        poses.append(SE3.exp(jnp.asarray(v6)))
        if "mask" in c:
            m = np.load(os.path.join(base, c["mask"]))
            masks.append(np.asarray(m, bool))
            any_mask = True
        else:
            masks.append(np.ones((H, W), bool))
    cams = stack_cameras(cam_list)
    cam_from_base = SE3(
        R=jnp.stack([p.R for p in poses]), t=jnp.stack([p.t for p in poses])
    )
    return cams, cam_from_base, H, W, (np.stack(masks) if any_mask else None), names


def save_rig(path: str, params9_per_cam, image_size, cam_from_base: SE3 | None = None,
             names=None, masks_rel=None):
    """Write a rig JSON (SaveCalib analogue — the reference persists via
    set_camera_info + pose files, src/PoseCalibrator.cc:602-632)."""
    W, H = image_size
    C = len(params9_per_cam)
    cameras = []
    for i in range(C):
        entry = {
            "name": (names[i] if names else f"camera{i + 1}"),
            "params": [float(x) for x in np.asarray(params9_per_cam[i]).ravel()],
        }
        if cam_from_base is not None:
            entry["cam_from_base"] = [
                float(x) for x in np.asarray(cam_from_base[i].ln()).ravel()
            ]
        if masks_rel and masks_rel[i]:
            entry["mask"] = masks_rel[i]
        cameras.append(entry)
    with open(path, "w") as f:
        json.dump({"width": W, "height": H, "cameras": cameras}, f, indent=1)


def load_video(path: str) -> np.ndarray:
    """Load a (C,T,H,W) uint8 sequence from .npy/.npz (the bag-replay
    stand-in, SURVEY §4)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            key = "frames" if "frames" in z else list(z.keys())[0]
            arr = z[key]
    else:
        arr = np.load(path)
    assert arr.ndim == 4, f"expected (C,T,H,W), got {arr.shape}"
    return np.asarray(arr, np.uint8)
