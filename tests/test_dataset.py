"""Dataset-directory ingestion (io/dataset.py): the bag/launch analogue.

Round-trips synthetic frames through the on-disk layout real recordings
use (per-camera image dirs + timestamps + rig.json) and replays them
through the native synchronized queue.
"""

import os

import numpy as np
import pytest

from mcptam_tpu.io.dataset import (
    load_image, load_sequence_dir, export_sequence_dir, load_dataset,
)


def _frames(C=2, T=5, H=24, W=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(C, T, H, W), dtype=np.uint8)


def test_pgm_roundtrip(tmp_path):
    fr = _frames()
    export_sequence_dir(str(tmp_path), fr, fmt="pgm")
    back, ts = load_sequence_dir(str(tmp_path))
    np.testing.assert_array_equal(back, fr)
    assert ts.shape == fr.shape[:2]
    assert np.all(np.diff(ts, axis=1) > 0)


def test_png_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    fr = _frames()
    export_sequence_dir(str(tmp_path), fr, fmt="png")
    back, _ = load_sequence_dir(str(tmp_path))
    np.testing.assert_array_equal(back, fr)


def test_recorded_timestamps_and_limit(tmp_path):
    fr = _frames(T=6)
    ts = np.stack([np.linspace(100.0, 101.0, 6),
                   np.linspace(100.001, 101.001, 6)])
    export_sequence_dir(str(tmp_path), fr, timestamps=ts)
    back, ts2 = load_sequence_dir(str(tmp_path), limit=4)
    assert back.shape[1] == 4
    np.testing.assert_allclose(ts2, ts[:, :4], atol=1e-9)


def test_uneven_tails_truncate(tmp_path):
    fr = _frames(T=5)
    export_sequence_dir(str(tmp_path), fr)
    # drop camera2's last frame: replay must truncate to the shortest
    os.remove(os.path.join(str(tmp_path), "camera2", "000004.pgm"))
    back, _ = load_sequence_dir(str(tmp_path))
    assert back.shape[1] == 4


def test_load_dataset_with_rig(tmp_path):
    fr = _frames(C=2, H=48, W=64)
    rig = {
        "width": 64, "height": 48,
        "cameras": [
            {"name": "camera1",
             "params": [90.0, -1e-3, 0.0, 0.0, 32.0, 24.0, 1.0, 0.0, 0.0]},
            {"name": "camera2",
             "params": [90.0, -1e-3, 0.0, 0.0, 32.0, 24.0, 1.0, 0.0, 0.0],
             "cam_from_base": [0.1, 0.0, 0.0, 0.0, 0.0, 0.0]},
        ],
    }
    export_sequence_dir(str(tmp_path), fr, rig_doc=rig)
    cams, cfb, H, W, masks, names, frames, ts = load_dataset(str(tmp_path))
    assert (H, W) == (48, 64) and names == ["camera1", "camera2"]
    np.testing.assert_array_equal(frames, fr)
    np.testing.assert_allclose(np.asarray(cfb.t)[1, 0], 0.1, atol=1e-6)


def test_replay_through_native_queue(tmp_path):
    from mcptam_tpu.io.video_source import ReplaySource
    fr = _frames(C=2, T=4)
    ts = np.stack([np.arange(4) / 10.0, np.arange(4) / 10.0 + 1e-4])
    src = ReplaySource(fr, timestamps=ts)
    src.start()
    got = [src.queue.get(timeout_ms=2000) for _ in range(4)]
    src.join()
    assert all(g is not None for g in got)
    np.testing.assert_array_equal(got[0][0], fr[:, 0])
    np.testing.assert_allclose(got[2][1], ts[:, 2], atol=1e-9)
    src.queue.close()
