"""Timing/metrics emission matching the reference's message taxonomy.

The reference publishes wall-clock section timers every frame and BA run:
TrackerTiming (msg/TrackerTiming.msg, filled in src/Tracker.cc:293-332),
MapMakerTiming (msg/MapMakerTiming.msg, src/MapMaker.cc:197-265) and
SystemInfo (msg/SystemInfo.msg, src/SystemFrontendBase.cc:236-276).  These
dataclasses carry the same fields; the System exposes them per frame and
the benchmark schema is built on them (BASELINE.md)."""

from __future__ import annotations

import dataclasses
import time


@dataclasses.dataclass
class TrackerTiming:
    kf_downsample: float = 0.0   # pyramid + mask + feature extraction
    kf_feature: float = 0.0
    sbi: float = 0.0
    motion: float = 0.0
    pvs: float = 0.0
    coarse: float = 0.0
    fine: float = 0.0
    pose: float = 0.0
    depth: float = 0.0
    add: float = 0.0
    total: float = 0.0
    map_num_points: int = 0
    map_num_mkfs: int = 0


@dataclasses.dataclass
class MapMakerTiming:
    elapsed: float = 0.0
    accepted_iterations: int = 0
    total_iterations: int = 0
    kind: str = "none"  # "local" | "global" | "creation"
    map_num_points: int = 0
    map_num_mkfs: int = 0


@dataclasses.dataclass
class SystemInfo:
    grab_duration: float = 0.0
    tracking_duration: float = 0.0
    mapping_duration: float = 0.0
    fps: float = 0.0
    frame_count: int = 0


class Stopwatch:
    """Section timer; mirrors the reference's ros::WallTime bracketing."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        t = time.perf_counter()
        dt = t - self.t0
        self.t0 = t
        return dt
