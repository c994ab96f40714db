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
    assert int(s) == 3


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
    client.close()
    server.close()
