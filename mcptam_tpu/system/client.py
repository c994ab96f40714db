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
                 max_meas: int = MAX_MEAS, masks=None):
        self.channel = Channel.connect(server_host, server_port)
        super().__init__(
            cams, cam_from_base, cams_sbi, H, W, tcfg, mcfg,
            max_points, max_mkfs, max_meas,
            mapmaker=MapMakerClient(self.channel, cams), masks=masks,
        )

    def close(self):
        self.channel.close()
