"""Native runtime tests: C++ frame queue, net manager, codec."""

import threading
import time

import numpy as np
import pytest

from mcptam_tpu.io.video_source import SyncedFrameQueue, ReplaySource
from mcptam_tpu.system.netcodec import pack_arrays, unpack_arrays
from mcptam_tpu.system.network import Channel


def test_codec_roundtrip(rng):
    arrays = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": np.arange(10, dtype=np.int32),
        "mask": rng.random(7) > 0.5,
        "img": rng.integers(0, 255, (16, 16), dtype=np.uint8).astype(np.uint8),
    }
    out = unpack_arrays(pack_arrays(arrays))
    for k, v in arrays.items():
        assert out[k].dtype == v.dtype
        assert np.array_equal(out[k], v), k
    # 0-d scalars round-trip as shape-(1,) arrays (int()-compatible)
    s = unpack_arrays(pack_arrays({"s": np.asarray(3, np.int64)}))["s"]
    assert int(s.ravel()[0]) == 3


def test_codec_jpeg_planes(rng):
    # keyframe imagery as JPEG planes at the reference's quality 90
    # (src/NetworkManager.cc:804-805): lossy but close, and much smaller
    # than zlib on natural images
    yy, xx = np.mgrid[0:64, 0:96]
    img = (
        96 + 60 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
        + rng.normal(0, 4, (64, 96))
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    imgs = np.stack([img, img[::-1]])  # (2,H,W) per-camera planes
    blob_j = pack_arrays({"img0": imgs}, jpeg_keys=("img0",))
    blob_z = pack_arrays({"img0": imgs})
    out = unpack_arrays(blob_j)["img0"]
    assert out.shape == imgs.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float32) - imgs.astype(np.float32))
    assert float(err.mean()) < 3.0, float(err.mean())  # q=90 is near-lossless
    assert len(blob_j) < len(blob_z), (len(blob_j), len(blob_z))
    assert len(blob_j) < 0.4 * imgs.nbytes, (len(blob_j), imgs.nbytes)
    # non-image dtypes/keys are untouched by the jpeg path
    exact = unpack_arrays(
        pack_arrays({"a": imgs.astype(np.int32)}, jpeg_keys=("a",))
    )["a"]
    assert np.array_equal(exact, imgs)


def test_frame_queue_sync(rng):
    q = SyncedFrameQueue(2, 8, 8, sync_tol=0.01)
    f0 = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    f1 = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    q.push(0, 1.000, f0)
    q.push(1, 1.004, f1)  # within tolerance
    out = q.get(timeout_ms=500)
    assert out is not None
    frames, ts = out
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)
    # unmatched frame does not release
    q.push(0, 2.0, f0)
    assert q.get(timeout_ms=50) is None
    # partner too far in time: old head dropped, new pair matches
    q.push(1, 2.5, f1)
    q.push(0, 2.498, f0)
    out = q.get(timeout_ms=500)
    assert out is not None
    assert abs(out[1][0] - 2.498) < 1e-9
    q.close()


def test_frame_queue_dynamic_sync(rng):
    # ref sbDynamicSync (include/mcptam/CameraGroupSubscriber.h): the sync
    # bound adapts to half the observed frame interval
    q = SyncedFrameQueue(2, 8, 8, sync_tol=0.05)
    f = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    q.set_dynamic_sync(True)
    # no rate observed yet -> static tolerance
    assert abs(q.effective_sync_tol - 0.05) < 1e-12
    # feed both cameras at 100 fps (interval 0.01) for a few frames
    for i in range(6):
        q.push(0, 1.0 + 0.01 * i, f)
        q.push(1, 1.0 + 0.01 * i + 0.001, f)
        assert q.get(timeout_ms=200) is not None
    tol = q.effective_sync_tol
    assert tol <= 0.5 * 0.0105 + 1e-6, tol  # ~half the observed interval
    # a pair 8 ms apart (fine under the static 50 ms tol) no longer
    # matches — the older head is discarded as unmatchable
    q.push(0, 2.0, f)
    q.push(1, 2.008, f)
    assert q.get(timeout_ms=50) is None
    # back to the static bound: an 8 ms pair matches again
    q.set_dynamic_sync(False)
    assert abs(q.effective_sync_tol - 0.05) < 1e-12
    q.push(0, 3.0, f)
    q.push(1, 3.008, f)
    assert q.get(timeout_ms=200) is not None
    q.close()


def test_replay_source(rng):
    C, T, H, W = 2, 5, 8, 8
    frames = rng.integers(0, 255, (C, T, H, W), dtype=np.uint8)
    src = ReplaySource(frames, fps=1000.0)
    src.start()
    got = 0
    for _ in range(T):
        out = src.queue.get(timeout_ms=1000)
        if out is None:
            break
        got += 1
    assert got == T
    src.join()


def test_netmanager_loopback(rng):
    server = Channel.serve(0)  # ephemeral port: immune to stale listeners
    client = Channel.connect("127.0.0.1", server.port)
    payload = {"x": rng.normal(size=(100,)).astype(np.float32)}
    client.send(3, payload)
    out = server.poll(timeout_ms=2000)
    assert out is not None
    action, d = out
    assert action == 3
    assert np.allclose(d["x"], payload["x"])
    # other direction + a big message
    big = {"img": rng.integers(0, 255, (4, 480, 1000), dtype=np.uint8).astype(np.uint8)}
    server.send(5, big)
    out = client.poll(timeout_ms=5000)
    assert out is not None
    assert out[0] == 5
    assert np.array_equal(out[1]["img"], big["img"])
    # send/receive accounting (ref NetworkManager.h:298-303)
    cs, ss = client.stats, server.stats
    assert cs["msgs_sent"] == 1 and ss["msgs_recv"] == 1
    assert ss["msgs_sent"] == 1 and cs["msgs_recv"] == 1
    assert cs["bytes_sent"] == ss["bytes_recv"] > 0
    client.close()
    server.close()


def test_netmanager_partition_recovery(rng):
    # the reference survives network partitions via infinite retry +
    # service reconnect (src/NetworkManager.cc:284-294): undelivered
    # messages stay queued and arrive after the link comes back
    server = Channel.serve(0)
    client = Channel.connect("127.0.0.1", server.port)
    client.send(1, {"i": np.asarray([0], np.int32)})
    assert server.poll(timeout_ms=2000) is not None
    # partition both ends mid-session
    client.break_connection()
    server.break_connection()
    for i in range(1, 4):
        client.send(1, {"i": np.asarray([i], np.int32)})
    got = []
    deadline = time.time() + 10.0
    while len(got) < 3 and time.time() < deadline:
        out = server.poll(timeout_ms=500)
        if out is not None:
            got.append(int(out[1]["i"][0]))
    assert got == [1, 2, 3], got  # in order, none lost
    assert client.stats["reconnects"] >= 2  # initial connect + recovery
    client.close()
    server.close()
