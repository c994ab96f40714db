"""Distributed client/server mapping: tracking on-board, optimization
off-board.

The reference splits into mcptam_client / mcptam_server ROS nodes
exchanging the ModifyMap service (SURVEY §2.7; src/MapMakerClient.cc,
src/MapMakerServer.cc, src/NetworkManager.cc).  Here:

  * transport = native C++ framed-TCP manager with retry-forever
    semantics (native/netmanager.cc);
  * payloads = zlib'd numpy array packs (system/netcodec.py) keeping the
    ADD/UPDATE/DELETE/OUTLIERS/INIT/RESET/STATE action vocabulary;
  * slot consistency replaces the reference's pointer<->string-id
    Dictionary: both sides commit MKFs in message order into identical
    fixed-capacity stores, and the server's point/measurement sections are
    applied wholesale on the client (imagery never travels back).

Client API mirrors MapMakerClientBase (init blocking, add async,
src/MapMakerClientBase.h:129-143); the server loop mirrors
MapMakerServer::run's priority order (network first, BA otherwise,
src/MapMakerServer.cc:95-227).
"""

from __future__ import annotations

import ctypes
import time

import numpy as np
import jax
import jax.numpy as jnp

from flax import struct

from mcptam_tpu.config import LEVELS
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.map.keyframe import FrameFeatures
from mcptam_tpu.map.state import MapState
from mcptam_tpu.map.builder import commit_mkf
from mcptam_tpu.map.mapmaker_core import record_tracker_measurements
from mcptam_tpu.native.build import load
from mcptam_tpu.system.netcodec import (
    pack_arrays, unpack_arrays, JPEG_QUALITY,
    ACTION_ADD, ACTION_DELETE, ACTION_UPDATE, ACTION_OUTLIERS,
    ACTION_INIT, ACTION_RESET, ACTION_STATE, ACTION_MONITOR,
)

_MAX_MSG = 512 * 1024 * 1024


class Channel:
    """Framed-message channel over the native net manager."""

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib

    @classmethod
    def serve(cls, port: int = 0) -> "Channel":
        """Listen on `port` (0 = kernel-assigned ephemeral; read `.port`)."""
        lib = load("netmanager")
        h = lib.nm_create_server(port)
        if not h:
            raise OSError(f"cannot listen on port {port}")
        ch = cls(h, lib)
        ch.port = int(lib.nm_port(h))
        return ch

    @classmethod
    def connect(cls, host: str, port: int) -> "Channel":
        lib = load("netmanager")
        return cls(lib.nm_create_client(host.encode(), port), lib)

    def send(self, action: int, arrays: dict | None = None):
        # keyframe imagery rides as JPEG planes (ref NetworkManager q=90)
        blob = pack_arrays(arrays or {}, jpeg_keys=("img0",))
        buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
        self._lib.nm_send(self._h, action, buf, len(blob))

    def poll(self, timeout_ms: int = 0):
        """(action, arrays) or None."""
        size = self._lib.nm_peek_size(self._h)
        cap = max(int(size), 1 << 20) if size > 0 else (1 << 20)
        while True:
            buf = (ctypes.c_uint8 * cap)()
            action = ctypes.c_uint32()
            n = self._lib.nm_poll(self._h, ctypes.byref(action), buf, cap, timeout_ms)
            if n == -1:
                return None
            if n < -1:  # message bigger than cap: retry with exact size
                cap = -int(n) - 2
                continue
            blob = bytes(bytearray(buf[: int(n)]))
            return int(action.value), unpack_arrays(blob)

    @property
    def stats(self) -> dict:
        """Send/receive accounting (ref NetworkManager.h:298-303)."""
        out = (ctypes.c_uint64 * 5)()
        self._lib.nm_stats(self._h, out)
        return {
            "msgs_sent": int(out[0]), "msgs_recv": int(out[1]),
            "bytes_sent": int(out[2]), "bytes_recv": int(out[3]),
            "reconnects": int(out[4]),
        }

    def break_connection(self):
        """Force the live connection down (partition simulation); queued
        messages are redelivered after automatic reconnect."""
        self._lib.nm_break(self._h)

    def close(self):
        if self._h:
            self._lib.nm_destroy(self._h)
            self._h = None


# ---------------------------------------------------------------------------
# FrameFeatures / pose / tracker-result array conversion
# ---------------------------------------------------------------------------

def feats_to_arrays(feats: FrameFeatures, pose: SE3,
                    jpeg_quality: int = JPEG_QUALITY) -> dict:
    """jpeg_quality > 0: ship only the level-0 image as per-camera JPEG
    planes (the reference sends the level-0 KF image + mask as JPEG-90 and
    re-derives everything server-side, src/NetworkManager.cc:804-805); the
    receiver rebuilds the pyramid atlas from the decoded image.  0 = ship
    the full atlas losslessly."""
    if jpeg_quality > 0:
        from mcptam_tpu.ops.atlas import _level0_width_from_atlas
        W = _level0_width_from_atlas(feats.atlas.shape[-1])
        img0 = feats.atlas[..., :, :W]
        d = {"img0": np.clip(np.asarray(img0), 0, 255).astype(np.uint8)}
    else:
        d = {"atlas": np.clip(np.asarray(feats.atlas), 0, 255).astype(np.uint8)}
    d.update({
        "corner_atlas": (np.asarray(feats.corner_atlas) > 0.5).astype(np.uint8),
        "thresholds": np.asarray(feats.thresholds),
        "corner_counts": np.asarray(feats.corner_counts),
        "sbi": np.asarray(feats.sbi),
        "sbi_gx": np.asarray(feats.sbi_gx),
        "sbi_gy": np.asarray(feats.sbi_gy),
        "pose_R": np.asarray(pose.R),
        "pose_t": np.asarray(pose.t),
    })
    for l in range(LEVELS):
        d[f"cand_xy_{l}"] = np.asarray(feats.cand_xy[l])
        d[f"cand_score_{l}"] = np.asarray(feats.cand_score[l])
        d[f"cand_valid_{l}"] = np.asarray(feats.cand_valid[l])
    return d


def arrays_to_feats(d: dict):
    if "atlas" in d:
        atlas = jnp.asarray(d["atlas"], jnp.float32)
    else:
        # level-0 JPEG planes: rebuild the pyramid atlas, as the reference
        # server re-derives imagery from the decoded JPEG
        from mcptam_tpu.ops.pyramid import build_pyramid
        from mcptam_tpu.ops.atlas import build_atlas
        atlas = build_atlas(
            build_pyramid(jnp.asarray(d["img0"], jnp.float32))
        )
    feats = FrameFeatures(
        atlas=atlas,
        corner_atlas=jnp.asarray(d["corner_atlas"], jnp.float32),
        thresholds=jnp.asarray(d["thresholds"]),
        corner_counts=jnp.asarray(d["corner_counts"]),
        cand_xy=tuple(jnp.asarray(d[f"cand_xy_{l}"]) for l in range(LEVELS)),
        cand_score=tuple(jnp.asarray(d[f"cand_score_{l}"]) for l in range(LEVELS)),
        cand_valid=tuple(jnp.asarray(d[f"cand_valid_{l}"]) for l in range(LEVELS)),
        sbi=jnp.asarray(d["sbi"]),
        sbi_gx=jnp.asarray(d["sbi_gx"]),
        sbi_gy=jnp.asarray(d["sbi_gy"]),
    )
    pose = SE3(R=jnp.asarray(d["pose_R"]), t=jnp.asarray(d["pose_t"]))
    return feats, pose


def result_to_arrays(res) -> dict:
    return {
        "sel_point": np.asarray(res.sel_point),
        "sel_cam": np.asarray(res.sel_cam),
        "sel_level": np.asarray(res.sel_level),
        "sel_pos_l0": np.asarray(res.sel_pos_l0),
        "sel_found": np.asarray(res.sel_found),
        "sel_outlier": np.asarray(res.sel_outlier),
        "sel_subpix": np.asarray(res.sel_subpix),
    }


@struct.dataclass
class _ResultView:
    """The tracker-result slice an ADD carries over the wire — a pytree
    (flax struct) because the receiving map-maker passes it straight into
    its jitted MKF-integration program (a plain attribute-bag object
    raised 'Error interpreting argument ... as an abstract array' inside
    the server's spin thread and silently dropped the client's tracker
    measurements)."""

    sel_point: jnp.ndarray
    sel_cam: jnp.ndarray
    sel_level: jnp.ndarray
    sel_pos_l0: jnp.ndarray
    sel_found: jnp.ndarray
    sel_outlier: jnp.ndarray
    sel_subpix: jnp.ndarray

    @classmethod
    def from_dict(cls, d):
        return cls(**{
            f: jnp.asarray(d[f])
            for f in ("sel_point", "sel_cam", "sel_level", "sel_pos_l0",
                      "sel_found", "sel_outlier", "sel_subpix")
        })


# ---------------------------------------------------------------------------
# Map-section snapshots (server -> client)
# ---------------------------------------------------------------------------

_POINT_FIELDS = [
    "pos_w", "valid", "bad", "fixed", "optimized", "src_mkf",
    "src_cam", "src_level", "center_xy", "src_window", "src_window_ok",
    "center_nc", "right_nc", "down_nc",
    "pixel_right_w", "pixel_down_w", "in_count", "out_count",
]
_MEAS_FIELDS = ["mkf", "cam", "point", "level", "uv_l0", "valid", "source", "subpix"]


def map_update_arrays(ms: MapState) -> dict:
    d = {}
    for f in _POINT_FIELDS:
        d[f"pt_{f}"] = np.asarray(getattr(ms.points, f))
    for f in _MEAS_FIELDS:
        d[f"ms_{f}"] = np.asarray(getattr(ms.meas, f))
    d["mkf_R"] = np.asarray(ms.mkfs.base_from_world.R)
    d["mkf_t"] = np.asarray(ms.mkfs.base_from_world.t)
    d["mkf_valid"] = np.asarray(ms.mkfs.valid)
    d["mkf_fixed"] = np.asarray(ms.mkfs.fixed)
    d["mkf_seq"] = np.asarray(ms.mkfs.seq)
    d["mkf_depth_mean"] = np.asarray(ms.mkfs.scene_depth_mean)
    d["mkf_depth_sigma"] = np.asarray(ms.mkfs.scene_depth_sigma)
    d["next_seq"] = np.asarray(ms.next_seq)
    return d


def apply_map_update(ms: MapState, d: dict) -> MapState:
    pts = ms.points.replace(**{
        f: jnp.asarray(d[f"pt_{f}"], getattr(ms.points, f).dtype)
        for f in _POINT_FIELDS
    })
    meas = ms.meas.replace(**{
        f: jnp.asarray(d[f"ms_{f}"], getattr(ms.meas, f).dtype)
        for f in _MEAS_FIELDS
    })
    mkfs = ms.mkfs.replace(
        base_from_world=SE3(
            R=jnp.asarray(d["mkf_R"]), t=jnp.asarray(d["mkf_t"])
        ),
        valid=jnp.asarray(d["mkf_valid"]),
        fixed=jnp.asarray(d["mkf_fixed"]),
        seq=jnp.asarray(d["mkf_seq"], jnp.int32),
        scene_depth_mean=jnp.asarray(d["mkf_depth_mean"]),
        scene_depth_sigma=jnp.asarray(d["mkf_depth_sigma"]),
    )
    return ms.replace(
        points=pts, meas=meas, mkfs=mkfs,
        # codec returns 0-d scalars as shape-(1,); restore the scalar shape
        next_seq=jnp.asarray(d["next_seq"], jnp.int32).reshape(()),
    )


# ---------------------------------------------------------------------------
# Client-side map maker
# ---------------------------------------------------------------------------

class MapMakerClient:
    """Tracker-side shim: local MKF imagery commits + network forwarding
    (ref src/MapMakerClient.cc)."""

    def __init__(self, channel: Channel, cams):
        self.channel = channel
        self.cams = cams
        self.state = 0  # MM_INITIALIZING
        self.init_point_cov = float("inf")
        self.queue = []

    def init(self, ms: MapState, feats, pose):
        """Blocking INIT (the reference's CallInit blocks until the server
        built the first points, src/MapMakerClient.cc:181).  Returns
        (ms, ok) — ok=False when the server's init failed to triangulate
        any points (snMinMapPoints gate server-side)."""
        ms, mkf_idx, _ = commit_mkf(ms, feats, pose, fixed=True)
        self.channel.send(ACTION_INIT, feats_to_arrays(feats, pose))
        # wait for the first UPDATE
        deadline = time.time() + 120.0
        while time.time() < deadline:
            msg = self.channel.poll(timeout_ms=200)
            if msg is None:
                continue
            action, d = msg
            if action == ACTION_UPDATE:
                from mcptam_tpu.map.state import count_points
                ms = apply_map_update(ms, d)
                ok = int(jax.device_get(count_points(ms))) > 0
                return ms, ok
            if action == ACTION_STATE:
                self._apply_state(d)
        raise TimeoutError("server did not answer INIT")

    def add_mkf(self, feats, pose, tracker_result, cam_active=None):
        self.queue.append((feats, pose, tracker_result, cam_active))

    def queue_size(self):
        return len(self.queue)

    def reset(self, ms):
        self.queue.clear()
        self.state = 0
        if self._server_reset:
            self._server_reset = False  # server-initiated: don't bounce back
        else:
            self.channel.send(ACTION_RESET)

    def on_map_changed(self):
        pass

    @property
    def reset_requested(self) -> bool:
        # resets are driven from the server side in client/server mode
        # (ref RequestResetInternal -> client reset service)
        return self._server_reset

    _server_reset = False

    def send_deletes(self, point_idx: np.ndarray):
        """Tracker-outlier deletions (ref HandleBadPoints -> SendDelete)."""
        self.channel.send(ACTION_DELETE, {"points": np.asarray(point_idx)})

    def send_monitor(self, d: dict):
        """Operator-monitoring relay: tracker pose/quality + small image
        (the reference server mirrors the client's system_info and
        small_image topics, src/SystemServer.cc:113-136)."""
        self.channel.send(ACTION_MONITOR, d)

    def _apply_state(self, d):
        # codec scalars arrive as shape-(1,) arrays; index before casting
        # (ndim>0 -> scalar conversion is a hard error in future numpy)
        self.state = int(np.asarray(d["state"]).ravel()[0])
        self.init_point_cov = float(np.asarray(d["init_cov"]).ravel()[0])

    def step(self, ms: MapState, budget_s: float | None = None) -> MapState:
        # budget_s is accepted for API parity with MapMaker.step (System.
        # process_frame passes it unconditionally); the client does no BA,
        # so there is nothing to budget — forwarding + message drain are
        # already one bounded pass (ref MapMakerClient::run does the same
        # fixed work per loop, src/MapMakerClient.cc:96-129).
        # 1. forward one queued MKF: commit imagery locally (same slot the
        # server will use), record tracker measurements, ship it
        if self.queue:
            feats, pose, result, cam_active = self.queue.pop(0)
            ms, mkf_idx, ok = commit_mkf(ms, feats, pose, kf_valid=cam_active)
            if result is not None:
                ms = record_tracker_measurements(ms, mkf_idx, result)
            d = feats_to_arrays(feats, pose)
            if result is not None:
                d.update(result_to_arrays(result))
            if cam_active is not None:
                d["cam_active"] = np.asarray(cam_active)
            self.channel.send(ACTION_ADD, d)

        # 2. drain server messages
        while True:
            msg = self.channel.poll(timeout_ms=0)
            if msg is None:
                break
            action, d = msg
            if action == ACTION_UPDATE:
                ms = apply_map_update(ms, d)
            elif action == ACTION_OUTLIERS:
                bad = jnp.asarray(d["meas_outlier"])
                ms = ms.replace(meas=ms.meas.replace(valid=ms.meas.valid & ~bad))
            elif action == ACTION_STATE:
                self._apply_state(d)
            elif action == ACTION_RESET:
                # server-side BA failure chain (MapMakerServerBase::
                # RequestResetInternal -> client reset service)
                self._server_reset = True

        # 3. tracker-flagged bad points: DELETE to the server + local trash
        # GC (ref MapMakerClient::HandleBadPoints -> SendDelete,
        # src/MapMakerClient.cc:158-181)
        any_bad = bool(jax.device_get(jnp.any(ms.points.bad & ms.points.valid)))
        if any_bad:
            bad = np.asarray(jax.device_get(ms.points.bad & ms.points.valid))
            self.send_deletes(np.nonzero(bad)[0])
            from mcptam_tpu.map.state import move_bad_points_to_trash
            ms = move_bad_points_to_trash(ms)
        return ms


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

class MapServer:
    """Off-board optimizer process (ref src/MapMakerServer.cc)."""

    def __init__(self, channel: Channel, cams, ms_template: MapState,
                 mcfg=None):
        from mcptam_tpu.system.mapmaker import MapMaker
        from mcptam_tpu.config import DEFAULT_MAPMAKER

        self.channel = channel
        self.cams = cams
        self.ms = ms_template
        self.mapmaker = MapMaker(cams=cams, mcfg=mcfg or DEFAULT_MAPMAKER)
        self._dirty = False
        # last operator-monitoring packet from the client (pose/quality/
        # small image; ref SystemServer mirrors the client topics,
        # src/SystemServer.cc:113-136)
        self.client_monitor: dict | None = None
        self.monitor_count = 0

    def _send_state(self):
        self.channel.send(ACTION_STATE, {
            "state": np.asarray(self.mapmaker.state, np.int32),
            "init_cov": np.asarray(self.mapmaker.init_point_cov, np.float64),
        })

    def handle_message(self, action: int, d: dict):
        from mcptam_tpu.map.state import create_map_state
        if action == ACTION_INIT:
            feats, pose = arrays_to_feats(d)
            self.ms, _ = self.mapmaker.init(self.ms, feats, pose)
            self.channel.send(ACTION_UPDATE, map_update_arrays(self.ms))
            self._send_state()
        elif action == ACTION_ADD:
            feats, pose = arrays_to_feats(d)
            result = _ResultView.from_dict(d) if "sel_point" in d else None
            cam_active = (
                jnp.asarray(d["cam_active"]) if "cam_active" in d else None
            )
            self.mapmaker.add_mkf(feats, pose, result, cam_active=cam_active)
            self.mapmaker.on_map_changed()
        elif action == ACTION_DELETE:
            bad_idx = jnp.asarray(d["points"])
            pts = self.ms.points
            self.ms = self.ms.replace(
                points=pts.replace(bad=pts.bad.at[bad_idx].set(True))
            )
            self._dirty = True
        elif action == ACTION_MONITOR:
            self.client_monitor = d
            self.monitor_count += 1
        elif action == ACTION_RESET:
            self.ms = self._fresh_map()
            self.mapmaker.reset(self.ms)
            self._send_state()

    def _fresh_map(self):
        from mcptam_tpu.map.state import create_map_state
        from mcptam_tpu.ops.atlas import _level0_width_from_atlas
        H = self.ms.mkfs.atlas.shape[2]
        W = _level0_width_from_atlas(self.ms.mkfs.atlas.shape[3])
        C = self.ms.cam_from_base.t.shape[0]
        return create_map_state(
            H, W, C, self.ms.cam_from_base,
            self.ms.points.capacity, self.ms.mkfs.capacity,
            self.ms.meas.capacity,
        )

    def spin_once(self, timeout_ms: int = 10) -> bool:
        """One server-loop iteration; returns False if idle."""
        msg = self.channel.poll(timeout_ms=timeout_ms)
        if msg is not None:
            self.handle_message(*msg)
            return True
        # no message: advance BA etc.
        before = self.mapmaker._ba_kind
        n_q = self.mapmaker.queue_size()
        self.ms = self.mapmaker.step(self.ms)
        did_work = n_q > 0 or before != "none"
        finished_ba = before != "none" and self.mapmaker._ba_kind == "none"
        if n_q > 0 or finished_ba or self._dirty:
            self.channel.send(ACTION_UPDATE, map_update_arrays(self.ms))
            self._send_state()
            self._dirty = False
        if self.mapmaker.reset_requested:
            if self.mapmaker.mcfg.fail_dump_path:
                from mcptam_tpu.system.mapio import dump_map_ascii
                dump_map_ascii(self.mapmaker.mcfg.fail_dump_path, self.ms)
            self.channel.send(ACTION_RESET)
            self.ms = self._fresh_map()
            self.mapmaker.reset(self.ms)
            self._send_state()
        return did_work

    def run(self, stop_event=None):
        """Server loop: retry-forever semantics like the reference's
        NetworkManager thread (src/NetworkManager.cc:266-302) — an
        exception from one iteration is logged loudly and the loop keeps
        serving rather than silently killing the thread."""
        import logging
        log = logging.getLogger(__name__)
        while stop_event is None or not stop_event.is_set():
            try:
                self.spin_once(timeout_ms=20)
            except Exception:
                log.exception("MapServer loop iteration failed; continuing")
                time.sleep(0.2)
