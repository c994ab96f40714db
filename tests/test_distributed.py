"""Client/server distributed mapping over the real TCP channel.

The reference exercises its client/server split by launching both ROS
nodes on one machine with remapped topics (SURVEY §4); here the MapServer
runs on a thread with the MapMakerClient talking to it over loopback TCP,
exchanging the full ADD/UPDATE/DELETE/OUTLIERS/INIT/RESET/STATE protocol
(ref srv/ModifyMap.srv) with JPEG-compressed keyframe imagery
(ref src/NetworkManager.cc:804-805).
"""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import TrackerConfig, MapMakerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, render_rig
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.map.state import create_map_state
from mcptam_tpu.system.network import (
    Channel, MapServer, feats_to_arrays, arrays_to_feats,
)
from mcptam_tpu.system.netcodec import pack_arrays, unpack_arrays
from mcptam_tpu.system.client import SystemClient

H, W, C, SEED = 240, 320, 2, 3.0


def test_feats_jpeg_roundtrip():
    # ADD/INIT ship the level-0 image as JPEG-90 planes; the receiver
    # rebuilds the pyramid atlas (ref NetworkManager: server re-derives
    # features from the decoded JPEG image)
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    images = np.clip(
        np.asarray(render_rig(cams, cfb, SE3.identity(), SEED, H, W)),
        0, 255,
    ).astype(np.uint8)
    feats = make_frame_features(jnp.asarray(images, jnp.float32))
    d = feats_to_arrays(feats, SE3.identity())
    assert "img0" in d and "atlas" not in d
    blob = pack_arrays(d, jpeg_keys=("img0",))
    feats2, pose2 = arrays_to_feats(unpack_arrays(blob))
    assert feats2.atlas.shape == feats.atlas.shape
    err = jnp.abs(feats2.atlas - feats.atlas)
    assert float(err.mean()) < 3.0, float(err.mean())  # JPEG-90 near-lossless
    # exact fields are untouched
    for l in range(len(feats.cand_xy)):
        assert np.array_equal(feats2.cand_xy[l], feats.cand_xy[l])
    # lossless fallback still works
    d0 = feats_to_arrays(feats, SE3.identity(), jpeg_quality=0)
    feats3, _ = arrays_to_feats(unpack_arrays(pack_arrays(d0)))
    assert float(jnp.abs(feats3.atlas - feats.atlas).max()) < 1.0


def test_client_step_accepts_frame_budget():
    # regression guard (round-2 bug): System.process_frame always calls
    # mapmaker.step(ms, budget_s=...); MapMakerClient.step must accept the
    # kwarg or every SystemClient frame raises TypeError.  Runs the real
    # loopback channel but no tracker, so it stays in the fast tier.
    from mcptam_tpu.system.network import MapMakerClient
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    server_ch = Channel.serve(0)
    client_ch = Channel.connect("127.0.0.1", server_ch.port)
    try:
        mm = MapMakerClient(client_ch, cams)
        ms = create_map_state(
            H, W, C, cfb, max_points=64, max_mkfs=4, max_meas=256
        )
        for budget in (None, 0.01):
            ms2 = mm.step(ms, budget_s=budget)
            assert ms2.points.capacity == ms.points.capacity
        ms2 = mm.step(ms)  # positional form still works
        assert ms2.mkfs.capacity == ms.mkfs.capacity
    finally:
        client_ch.close()
        server_ch.close()


def test_monitor_relay_fast():
    """ACTION_MONITOR carries the client's pose/quality + small image to
    the server store (ref SystemServer.cc:113-136) — fast tier: loopback
    channel, no tracker, no mapmaker work."""
    from mcptam_tpu.system.network import MapMakerClient
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    server_ch = Channel.serve(0)
    client_ch = Channel.connect("127.0.0.1", server_ch.port)
    try:
        ms = create_map_state(
            H, W, C, cfb, max_points=64, max_mkfs=4, max_meas=256
        )
        server = MapServer(server_ch, cams, ms)
        mm = MapMakerClient(client_ch, cams)
        mm.send_monitor({
            "pose": np.eye(3, 4, dtype=np.float32),
            "quality": np.asarray(1, np.int32),
            "lost": np.asarray(False),
            "n_found": np.asarray(123, np.int32),
            "small_image": np.full((6, 8, 3), 7, np.uint8),
        })
        for _ in range(200):
            msg = server_ch.poll(timeout_ms=25)
            if msg is not None:
                server.handle_message(*msg)
                break
        assert server.monitor_count == 1
        mon = server.client_monitor
        assert int(np.asarray(mon["n_found"]).ravel()[0]) == 123
        assert mon["small_image"].shape == (6, 8, 3)
        assert not bool(np.asarray(mon["lost"]).reshape(()))
    finally:
        client_ch.close()
        server_ch.close()


@pytest.mark.slow
def test_client_server_loop():
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    mcfg = MapMakerConfig(init_depth=5.0, max_scaled_mkf_dist=0.04)
    tcfg = TrackerConfig(max_patches_per_frame=200, coarse_max=20,
                         coarse_min=6)

    ms_template = create_map_state(
        H, W, C, cfb, max_points=2048, max_mkfs=8, max_meas=8192
    )
    server_ch = Channel.serve(0)
    server = MapServer(server_ch, cams, ms_template, mcfg=mcfg)
    stop = threading.Event()
    th = threading.Thread(target=server.run, args=(stop,), daemon=True)
    th.start()

    sysc = SystemClient(
        cams, cfb, cams_sbi, H, W, "127.0.0.1", server_ch.port,
        tcfg, mcfg, max_points=2048, max_mkfs=8, max_meas=8192,
    )
    try:
        truths = [
            SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
            for i in range(7)
        ]
        last = None
        for i, p in enumerate(truths):
            images = np.clip(
                np.asarray(render_rig(cams, cfb, p, SEED, H, W)), 0, 255
            ).astype(np.uint8)
            info = sysc.process_frame(jnp.asarray(images, jnp.float32))
            terr = float(np.linalg.norm(info.pose[:, 3] - np.asarray(p.t)))
            assert not info.lost, f"lost at frame {i}"
            assert terr < 0.06, (i, terr)
            last = info
        assert last.n_mkfs >= 3, last.n_mkfs  # MKFs accumulated client-side
        stats = sysc.channel.stats
        assert stats["msgs_sent"] >= 3  # INIT + ADDs
        assert stats["msgs_recv"] >= 2  # UPDATEs + STATE back
        # JPEG imagery keeps ADD payloads small: well under the ~300 KB
        # lossless atlas per MKF
        assert stats["bytes_sent"] < stats["msgs_sent"] * 220_000, stats
        # let the server drain its MKF queue before shutdown (integration
        # + BA lag behind the tracker, like the reference's map maker)
        import time as _time
        deadline = _time.time() + 180.0
        while _time.time() < deadline:
            if (server.mapmaker.queue_size() == 0
                    and int(jnp.sum(server.ms.mkfs.valid)) >= 2):
                break
            _time.sleep(0.5)
    finally:
        stop.set()
        th.join(timeout=120.0)
        sysc.close()
        server_ch.close()
    # the server integrated MKFs and built points
    assert int(jnp.sum(server.ms.mkfs.valid)) >= 2
    # the client's tracker measurements crossed the wire and were recorded
    # at integration (SRC_TRACKER=0; a non-pytree result view once made the
    # jitted integrate reject them and the server dropped every one)
    from mcptam_tpu.map.state import SRC_TRACKER
    meas = server.ms.meas
    n_tracker_meas = int(jnp.sum(meas.valid & (meas.source == SRC_TRACKER)))
    assert n_tracker_meas > 0, "no SRC_TRACKER measurements on the server"
    assert int(jnp.sum(server.ms.points.valid)) > 100
    # operator-monitoring relay reached the server (ref SystemServer
    # mirroring the client's system_info/small_image, SystemServer.cc:113-136)
    assert server.monitor_count >= 1
    mon = server.client_monitor
    assert mon is not None and mon["small_image"].ndim == 3
    assert mon["pose"].shape == (3, 4)
