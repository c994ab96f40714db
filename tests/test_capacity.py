"""Capacity-exhaustion robustness: fixed-capacity arrays must saturate
gracefully (the design replaces the reference's unbounded pointer lists +
trash GC, src/Map.cc) — no crashes, no capacity overruns, tracking alive.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcptam_tpu.config import TrackerConfig, MapMakerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, render_rig
from mcptam_tpu.system.system import System

H, W, C, SEED = 240, 320, 2, 3.0


@pytest.mark.slow
def test_capacity_saturation_is_graceful():
    cams, cfb = make_rig(C, H, W, spread_deg=25.0)
    cams_sbi = make_sbi_cams(cams, H, W)
    # deliberately tiny capacities: the trajectory wants more MKFs and
    # points than fit
    sys_ = System(
        cams, cfb, cams_sbi, H, W,
        TrackerConfig(max_patches_per_frame=200, coarse_max=20, coarse_min=6),
        MapMakerConfig(init_depth=5.0, max_scaled_mkf_dist=0.03),
        max_points=256, max_mkfs=3, max_meas=2048,
    )
    for i in range(10):
        p = SE3.exp(jnp.asarray([0.05 * i, 0.0, 0.03 * i, 0.0, 0.02 * i, 0.0]))
        images = render_rig(cams, cfb, p, SEED, H, W)
        info = sys_.process_frame(images)
        assert not info.lost, f"lost at frame {i}"
        terr = float(np.linalg.norm(info.pose[:, 3] - np.asarray(p.t)))
        assert terr < 0.08, (i, terr)
        # hard capacity invariants
        assert info.n_points <= 256
        assert info.n_mkfs <= 3
    assert int(jnp.sum(sys_.ms.meas.valid)) <= 2048
    # saturated, not empty: the map kept what fit
    assert info.n_points > 50
    assert info.n_mkfs >= 2
    # GC invariant: no point is simultaneously valid-measured and invalid
    dead_meas = (~sys_.ms.points.valid)[sys_.ms.meas.point] & sys_.ms.meas.valid
    assert not bool(jnp.any(dead_meas))
