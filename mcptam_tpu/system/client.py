"""SystemClient: the on-board tracking process of the client/server split.

The reference's mcptam_client binary (src/MainClient.cc, src/SystemClient.cc)
runs the same grab->track->publish loop as the standalone System but with
MapMakerClient forwarding map building to an off-board server.  Here
SystemClient is the System loop with the network MapMakerClient injected;
the transport is the native framed-TCP channel (native/netmanager.cc).
"""

from __future__ import annotations

from mcptam_tpu.config import (
    TrackerConfig, MapMakerConfig, DEFAULT_TRACKER, DEFAULT_MAPMAKER,
    MAX_POINTS, MAX_MKFS, MAX_MEAS,
)
from mcptam_tpu.system.system import System
from mcptam_tpu.system.network import Channel, MapMakerClient


class SystemClient(System):
    """System loop with the map maker living in another process."""

    def __init__(self, cams, cam_from_base, cams_sbi, H, W,
                 server_host: str, server_port: int,
                 tcfg: TrackerConfig = DEFAULT_TRACKER,
                 mcfg: MapMakerConfig = DEFAULT_MAPMAKER,
                 max_points: int = MAX_POINTS, max_mkfs: int = MAX_MKFS,
                 max_meas: int = MAX_MEAS, masks=None,
                 monitor_interval: int = 5):
        self.channel = Channel.connect(server_host, server_port)
        # every Nth frame the client relays pose/quality + the tiled small
        # image so the server operator can watch tracking (the reference
        # SystemServer mirrors the client's system_info/small_image topics,
        # src/SystemServer.cc:113-136); 0 disables
        self.monitor_interval = monitor_interval
        super().__init__(
            cams, cam_from_base, cams_sbi, H, W, tcfg, mcfg,
            max_points, max_mkfs, max_meas,
            mapmaker=MapMakerClient(self.channel, cams), masks=masks,
        )

    def process_frame(self, images, cam_active=None):
        import numpy as np
        info = super().process_frame(images, cam_active=cam_active)
        if self.monitor_interval and (
            self.frame_count % self.monitor_interval == 0
        ):
            small = self.small_image()
            self.mapmaker.send_monitor({
                "pose": np.asarray(info.pose, np.float32),
                "quality": np.asarray(info.quality, np.int32),
                "lost": np.asarray(info.lost),
                "n_found": np.asarray(info.n_found, np.int32),
                "small_image": (
                    small if small is not None
                    else np.zeros((1, 1, 3), np.uint8)
                ),
            })
        return info

    def close(self):
        self.channel.close()
