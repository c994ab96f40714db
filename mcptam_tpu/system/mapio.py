"""Map persistence: dump AND load (the reference only dumps).

The reference exports maps to ASCII (map.dat: camera rig, MKF poses,
points, measurements — src/MapMakerBase.cc:475-579) and camera models
(cameras.dat, src/SystemBase.cc:166-215) but has no loader, so no true
resume (SURVEY §5).  Here the full MapState round-trips through one npz
(checkpoint/resume), and an ASCII summary compatible in spirit with
map.dat is emitted for inspection."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.map.state import MapState


def save_map(path: str, ms: MapState, extras: dict | None = None):
    """Serialize the complete MapState to an npz file.  `extras` adds
    named session arrays (tracker pose, scheduler state, ...) alongside
    the map for full checkpoint/resume."""
    leaves, treedef = jax.tree_util.tree_flatten(ms)
    np.savez_compressed(
        path, n_leaves=len(leaves),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        **{f"extra_{k}": np.asarray(v) for k, v in (extras or {}).items()},
    )


def load_map(path: str, template: MapState, with_extras: bool = False):
    """Restore a MapState saved by :func:`save_map`.  `template` supplies
    the pytree structure (capacities must match).  With ``with_extras``
    returns ``(ms, extras_dict)``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["n_leaves"])
    if n != len(leaves):
        raise ValueError(f"leaf count mismatch: file {n} vs template {len(leaves)}")
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"]).astype(leaves[i].dtype)
        for i in range(n)
    ]
    for i, (a, b) in enumerate(zip(new_leaves, leaves)):
        if a.shape != b.shape:
            raise ValueError(f"leaf {i} shape mismatch: {a.shape} vs {b.shape}")
    ms = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if not with_extras:
        return ms
    extras = {
        k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
    }
    return ms, extras


def dump_cameras_ascii(path: str, cams, cam_from_base, H: int, W: int,
                       names=None):
    """cameras.dat in the reference's CSV layout (ref
    SystemBase::DumpCamerasToFile, src/SystemBase.cc:166-215): a 3-line
    comment header, a camera-count line, then per camera one CSV row of
    name, image size (2), projection center (2), polynomial coefficients
    a0, a1=0, a2, a3, a4 (5), affine c/d/e (3), then the variable-length
    inverse-polynomial coefficients.  Like the reference, the inverse
    poly is expressed on normalized theta (CenterAndScale with
    theta mean/std, ref src/TaylorCamera.cc:262)."""
    C = int(cam_from_base.t.shape[0])
    with open(path, "w") as f:
        f.write("% Camera calibration parameters, format:\n")
        f.write("% Total number of cameras\n")
        f.write(
            "% Camera Name, image size (2 vector), projection center "
            "(2 vector), polynomial coefficients (5 vector), affine matrix "
            "components (3 vector), inverse polynomial coefficents "
            "(variable size)\n"
        )
        f.write(f"{C}\n")
        poly = np.asarray(cams.poly)           # (C,5) [a0, 0, a2, a3, a4]
        center = np.asarray(cams.center)       # (C,2)
        affine = np.asarray(cams.affine)       # (C,2,2) [[c,d],[e,1]]
        inv_poly = np.asarray(cams.inv_poly)   # (C,L) zero-padded
        for c in range(C):
            name = names[c] if names is not None else f"camera{c + 1}"
            inv = inv_poly[c]
            nz = np.nonzero(inv)[0]
            inv = inv[: int(nz[-1]) + 1] if nz.size else inv[:1]
            row = [
                W, H, center[c, 0], center[c, 1],
                poly[c, 0], 0, poly[c, 2], poly[c, 3], poly[c, 4],
                affine[c, 0, 0], affine[c, 0, 1], affine[c, 1, 0],
                *inv,
            ]
            f.write(name + ", " + ", ".join(f"{v:.9g}" for v in row) + "\n")
        f.write("% The end")


def dump_map_ascii(path: str, ms: MapState):
    """Human-readable dump in the spirit of the reference's map.dat
    (src/MapMakerBase.cc:475-579): rig extrinsics, MKF poses, points with
    source patch info, measurements."""
    pts = ms.points
    mkfs = ms.mkfs
    meas = ms.meas
    with open(path, "w") as f:
        C = ms.cam_from_base.t.shape[0]
        f.write(f"% mcptam_tpu map dump\n% cameras {C}\n")
        for c in range(C):
            R = np.asarray(ms.cam_from_base.R[c]).reshape(-1)
            t = np.asarray(ms.cam_from_base.t[c])
            f.write("cam " + " ".join(f"{v:.9g}" for v in list(R) + list(t)) + "\n")
        valid_m = np.asarray(mkfs.valid)
        for m in np.nonzero(valid_m)[0]:
            R = np.asarray(mkfs.base_from_world.R[m]).reshape(-1)
            t = np.asarray(mkfs.base_from_world.t[m])
            f.write(
                f"mkf {m} seq {int(np.asarray(mkfs.seq)[m])} fixed "
                f"{int(np.asarray(mkfs.fixed)[m])} "
                + " ".join(f"{v:.9g}" for v in list(R) + list(t)) + "\n"
            )
        valid_p = np.asarray(pts.valid)
        pos = np.asarray(pts.pos_w)
        for n in np.nonzero(valid_p)[0]:
            f.write(
                f"point {n} {pos[n,0]:.9g} {pos[n,1]:.9g} {pos[n,2]:.9g} "
                f"src {int(np.asarray(pts.src_mkf)[n])} "
                f"{int(np.asarray(pts.src_cam)[n])} "
                f"{int(np.asarray(pts.src_level)[n])}\n"
            )
        valid_s = np.asarray(meas.valid)
        uv = np.asarray(meas.uv_l0)
        for k in np.nonzero(valid_s)[0]:
            f.write(
                f"meas mkf {int(np.asarray(meas.mkf)[k])} cam "
                f"{int(np.asarray(meas.cam)[k])} pt "
                f"{int(np.asarray(meas.point)[k])} lvl "
                f"{int(np.asarray(meas.level)[k])} uv {uv[k,0]:.4f} "
                f"{uv[k,1]:.4f} src {int(np.asarray(meas.source)[k])}\n"
            )
