"""Dump compiled HLO of the scan-4 step and locate the hot gather fusions."""
import os, sys, re
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp

from mcptam_tpu.config import TrackerConfig
from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.io.synthetic import make_rig, make_sbi_cams, build_groundtruth_map
from mcptam_tpu.map.keyframe import make_frame_features
from mcptam_tpu.tracker.tracker import track_frame, create_tracker_state

H, W, C = 480, 640, 4
cams, cam_from_base = make_rig(C, H, W, spread_deg=25.0)
cams_sbi = make_sbi_cams(cams, H, W)
ms, _ = build_groundtruth_map(cams, cam_from_base, H, W, n_per_level=60,
                              max_points=2048, max_mkfs=8, max_meas=8192)
tcfg = TrackerConfig()
ts0 = create_tracker_state(C)
frames4 = jnp.zeros((4, C, H, W), jnp.uint8)


@jax.jit
def step_scan(ts, frames4):
    def body(ts, img):
        feats = make_frame_features(img)
        new_ts, res = track_frame(ts, ms, cams, cams_sbi, feats, tcfg)
        return new_ts, res.pose.t[0] + res.tot_found
    return jax.lax.scan(body, ts, frames4)


txt = step_scan.lower(ts0, frames4).compile().as_text()
open("/tmp/step_scan.hlo", "w").write(txt)
print(len(txt), "bytes", flush=True)
for m in re.finditer(r"%fusion\.(2016|2017|2018|2019) = .*", txt):
    print(m.group(0)[:400], flush=True)
