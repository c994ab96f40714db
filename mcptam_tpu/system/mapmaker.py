"""Host-side map-maker scheduler: the MapMaker thread, re-thought.

The reference MapMaker is a CVD::Thread running a priority loop at <=500Hz
(src/MapMaker.cc:131-323): reset -> local BA (until converged, if the MKF
queue is empty) -> refinds -> global BA -> failure-queue retry -> trash GC
-> pop MKF queue; incoming MKFs preempt BA through an abort flag polled by
g2o (src/ChainBundle.cc:1309).

Here the same schedule runs as host Python around jitted device kernels:
BA advances in fixed-size chunks of LM steps per call, so a queued MKF
preempts optimization at the next chunk boundary — the abort-flag design
without threads.  All map mutations are functional (MapState in/out); the
tracker always reads the latest committed state, which replaces the
reference's map mutex + point refcounts.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from mcptam_tpu.config import MapMakerConfig, BundleConfig, DEFAULT_MAPMAKER, DEFAULT_BUNDLE
from mcptam_tpu.map.state import MapState, move_bad_points_to_trash
from mcptam_tpu.map.mapmaker_core import init_from_mkf, integrate_mkf_device
from mcptam_tpu.map.refind import refind_in_keyframes
from mcptam_tpu.ba.adjusters import (
    problem_all, problem_recent, writeback, apply_outliers,
    compact_problem, expand_outliers, problem_live_counts,
)
from mcptam_tpu.ba.bundle import (
    create_lm_state, lm_run, tukey_outlier_pass, point_depth_covariance,
    attach_obs_table,
)
from mcptam_tpu.system.timing import MapMakerTiming

MM_INITIALIZING = 0
MM_RUNNING = 1

BA_CHUNK = 5   # LM steps per scheduler tick (preemption granularity)


def _bucket(n: int, buckets) -> int:
    """Smallest bucket >= n (last bucket if none)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class MapMaker:
    """Owns the map-building schedule; one `step()` per tracked frame."""

    cams: object
    mcfg: MapMakerConfig = field(default_factory=lambda: DEFAULT_MAPMAKER)
    bcfg: BundleConfig = field(default_factory=lambda: DEFAULT_BUNDLE)

    state: int = MM_INITIALIZING
    queue: list = field(default_factory=list)   # pending (feats, pose, result)
    failed_ba_count: int = 0
    last_timing: MapMakerTiming = field(default_factory=MapMakerTiming)
    # LM steps per scheduler tick: the preemption/interleave granularity.
    # Small chunks spread BA device time thinly across tracked frames
    # (higher FPS while BA converges); big chunks amortize tick overhead.
    ba_chunk: int = BA_CHUNK

    # in-flight BA
    _ba_kind: str = "none"       # none | local | global
    _ba_prob: object = None
    _ba_state: object = None
    _ba_steps: int = 0
    _conv_pending: list = field(default_factory=list)
    _local_done: bool = False    # local BA converged since last MKF
    _global_done: bool = False
    _idle_ticks: int = 0
    init_point_cov: float = float("inf")

    def __post_init__(self):
        # fixed_b=True: problem_recent / problem_all never move the
        # camera-from-base extrinsics (ba/adjusters.py builds them with
        # movable_b all-False, like BundleAdjusterMulti), so the LM elides
        # the whole pose-b system from its graph
        self._lm_run = jax.jit(
            lambda prob, st, n=self.ba_chunk: lm_run(
                prob, st, self.cams, n, self.bcfg, fixed_b=True
            )
        )
        self._integrate_cache = {}
        # Every scheduler action is ONE jitted device program.  Eager
        # (op-by-op) execution of the problem builders / writeback / GC
        # paths costs one backend round-trip per primitive — on the TPU
        # tunnel that is milliseconds each and a fresh tiny-program
        # compile the first time, which is what made a map-maker tick
        # take seconds while the LM chunk itself was milliseconds.
        bcfg = self.bcfg
        cams = self.cams
        from mcptam_tpu.ba.bundle import max_obs_per_point
        from mcptam_tpu.map.state import count_mkfs, count_points
        # local problem: build + count in one dispatch, then attach the
        # obs table with D sized FROM THE DATA (bucketed, obs_cap floor,
        # 64 cap) exactly like the global path — a static D silently
        # dropped Hessian edges for any local point with more
        # observations (round-4 weak #7).  One extra host sync per local
        # BA start (not per chunk); the bucket cache keeps compile-once.
        def _local_core(ms):
            prob = compact_problem(problem_recent(ms, bcfg.recent_num))
            return prob, max_obs_per_point(prob)
        self._local_core_fn = jax.jit(_local_core)
        self._local_attach_cache = {}

        def _local_prob(ms):
            prob, dmax = self._local_core_fn(ms)
            D = _bucket(max(int(jax.device_get(dmax)), 1),
                        (8, 16, 24, 32, 48, 64))
            D = max(min(D, 64), min(self.bcfg.obs_cap, 64))
            fn = self._local_attach_cache.get(D)
            if fn is None:
                fn = jax.jit(lambda p, D=D: attach_obs_table(p, D))
                self._local_attach_cache[D] = fn
            return fn(prob)
        self._local_prob_fn = _local_prob
        def _global_counts(ms):
            prob = problem_all(ms)
            n_pt, n_m = problem_live_counts(prob)
            return n_pt, n_m, max_obs_per_point(prob)
        self._global_counts_fn = jax.jit(_global_counts)
        self._global_prob_cache = {}
        def _finish(ms, prob, st):
            ms = writeback(ms, prob, st)
            outliers = tukey_outlier_pass(prob, st, cams)
            return apply_outliers(
                ms, expand_outliers(prob, outliers, ms.meas.capacity)
            )
        self._finish_fn = jax.jit(_finish)          # retraces per shape
        self._partial_wb_fn = jax.jit(writeback)
        self._gc_fn = jax.jit(move_bad_points_to_trash)
        self._any_retry_fn = jax.jit(lambda ms: jnp.any(ms.retry_queue))
        self._count_mkfs_fn = jax.jit(count_mkfs)
        self._count_points_fn = jax.jit(count_points)
        # ONE compiled program serves both refind sweeps: the general
        # sweep's pair_mask=None is definitionally an all-true mask, so
        # passing the mask explicitly halves the refind compile bill
        # (~15-30 s per fresh process on the tunnel)
        self._refind_masked_fn = jax.jit(
            lambda ms, pm: refind_in_keyframes(ms, cams, pair_mask=pm)
        )
        self._refind_fn = lambda ms: self._refind_masked_fn(
            ms, jnp.broadcast_to(jnp.ones((), bool), ms.retry_queue.shape)
        )
        self._refind_retry_fn = lambda ms: self._refind_masked_fn(
            ms, ms.retry_queue
        )
        self._depth_cov_fn = jax.jit(
            lambda prob, st: point_depth_covariance(prob, st, cams)[0]
        )
        self._init_cache = {}

    def _global_problem(self, ms):
        """Build the compacted global problem in one dispatch: fetch the
        live sizes (one sync), pick static buckets, run the cached jitted
        builder for that shape.  D is sized from the data — the largest
        per-point measurement count, bucketed, floored at the configured
        obs_cap and hard-capped at 64 (round-2 ADVICE #2); a drop beyond
        the cap is logged at the BA-finish sync point."""
        n_pt, n_m, dmax = (
            int(x) for x in jax.device_get(self._global_counts_fn(ms))
        )
        # bucket ladders must reach map capacity: a bucket that tops out
        # below the live count would silently drop points/measurements
        # from global BA (they'd never be optimized or Tukey-flagged)
        mp = min(_bucket(n_pt, (512, 1024, 2048, 4096)), ms.points.capacity)
        mm = min(_bucket(n_m, (4096, 8192, 16384, 32768)), ms.meas.capacity)
        if n_pt > mp or n_m > mm:
            import logging
            logging.getLogger(__name__).warning(
                "global BA compaction clipped the problem: %d live points "
                "-> %d slots, %d live measurements -> %d slots (map "
                "capacity %d/%d exceeds the bucket ladder)",
                n_pt, mp, n_m, mm, ms.points.capacity, ms.meas.capacity,
            )
        D = _bucket(max(dmax, 1), (8, 16, 24, 32, 48, 64))
        D = max(min(D, 64), min(self.bcfg.obs_cap, 64))
        key = (mp, mm, D)
        fn = self._global_prob_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda ms, mp=mp, mm=mm, D=D: attach_obs_table(
                    compact_problem(problem_all(ms),
                                    max_points=mp, max_meas=mm), D
                )
            )
            self._global_prob_cache[key] = fn
        return fn(ms)

    def _resolve_epi_budget(self, ms):
        """epi_max_hypotheses == 0 means AUTO: bucket the static arc
        budget (32/64/128) from this rig's actual worst-case arc length
        toward the reference's ~3 px stepping (auto_hypothesis_budget;
        ref OnePixelAngle stepping, src/MapMakerServerBase.cc:700-714).
        Resolved once, host-side, before the first epipolar program is
        traced — the budget is rig geometry, not frame data."""
        if self.mcfg.epi_max_hypotheses != 0:
            return
        import dataclasses
        from mcptam_tpu.map.epipolar import auto_hypothesis_budget
        finest = 0 if self.mcfg.level_zero_points else 1
        try:
            nh = auto_hypothesis_budget(
                self.cams, ms.cam_from_base, finest_level=finest,
                kf_baseline=self.mcfg.max_scaled_mkf_dist
                * self.mcfg.init_depth,
            )
        except Exception:
            nh = 32
        # dense budgets need the corner-space ambiguity rule (the
        # reference-faithful index rule self-sabotages above ~3 px
        # sampling density; map/epipolar.py)
        self.mcfg = dataclasses.replace(
            self.mcfg, epi_max_hypotheses=nh,
            epi_corner_ambiguity=self.mcfg.epi_corner_ambiguity
            or (nh > 32),
        )

    def _integrate(self, ms, feats, pose, result, cam_active):
        """Jitted MKF integration (one device program instead of eager
        per-pass dispatch); cache keyed on the mutable mcfg + the
        with/without-tracker-result trace shape."""
        self._resolve_epi_budget(ms)
        key = (self.mcfg, result is not None)
        fn = self._integrate_cache.get(key)
        if fn is None:
            mcfg = self.mcfg
            if result is not None:
                fn = jax.jit(
                    lambda ms, feats, pose, res, ca: integrate_mkf_device(
                        ms, self.cams, feats, pose, res, mcfg,
                        cam_active=ca,
                    )
                )
            else:
                fn = jax.jit(
                    lambda ms, feats, pose, ca: integrate_mkf_device(
                        ms, self.cams, feats, pose, None, mcfg,
                        cam_active=ca,
                    )
                )
            self._integrate_cache[key] = fn
        if result is not None:
            return fn(ms, feats, pose, result, cam_active)
        return fn(ms, feats, pose, cam_active)

    # -- tracker-facing API (MapMakerClientBase analogue) ------------------
    def init(self, ms: MapState, feats, pose):
        """Blocking map init from the first MKF (ref MapMaker::Init).

        Returns (ms, ok).  Like the reference (InitFromMultiKeyFrame,
        src/MapMakerServerBase.cc:146-261, snMinMapPoints), init FAILS —
        map left untouched, ok=False — when fewer than
        mcfg.min_map_points points could be triangulated; the caller
        retries on a later frame."""
        self._resolve_epi_budget(ms)
        fn = self._init_cache.get(self.mcfg)
        if fn is None:
            mcfg = self.mcfg
            fn = jax.jit(
                lambda ms, feats, pose: init_from_mkf(
                    ms, self.cams, feats, pose, mcfg
                )[0]
            )
            self._init_cache[mcfg] = fn
        ms2 = fn(ms, feats, pose)
        n = int(jax.device_get(self._count_points_fn(ms2)))
        if n < self.mcfg.min_map_points:
            return ms, False
        self.state = MM_INITIALIZING
        self._reset_ba()
        return ms2, True

    def add_mkf(self, feats, pose, tracker_result, cam_active=None):
        """Queue an MKF; preempts BA at the next chunk (ref AddMultiKeyFrame
        + abort flag, src/MapMaker.cc:329-363)."""
        self.queue.append((feats, pose, tracker_result, cam_active))

    def queue_size(self):
        return len(self.queue)

    def reset(self, ms: MapState):
        from mcptam_tpu.map.state import create_map_state  # noqa
        self.queue.clear()
        self.state = MM_INITIALIZING
        self._reset_ba()
        self.failed_ba_count = 0

    # -- scheduler ----------------------------------------------------------
    def _reset_ba(self):
        self._ba_kind = "none"
        self._ba_prob = None
        self._ba_state = None
        self._ba_steps = 0
        self._local_done = False
        self._global_done = False
        self._conv_pending = []

    def step(self, ms: MapState, budget_s: float | None = None) -> MapState:
        """Scheduler ticks: the reference's priority loop body
        (src/MapMaker.cc:131-323).

        budget_s=None runs exactly one tick (one MKF integration OR one BA
        chunk) — the frame-coupled slice.  With a budget, ticks repeat
        until the wall-clock budget is spent or the maker goes idle — the
        analogue of the reference's free-running map-maker thread (up to
        500 Hz, src/MapMaker.cc:133): BA convergence stops being limited
        to one chunk per tracked frame."""
        ms = self._tick(ms)
        if budget_s is not None:
            t_end = time.perf_counter() + budget_s
            while time.perf_counter() < t_end:
                if not self.queue and self._ba_kind == "none" \
                        and self._local_done and self._global_done:
                    break   # idle: don't spin refind sweeps in a hot loop
                ms = self._tick(ms)
        return ms

    def _tick(self, ms: MapState) -> MapState:
        t0 = time.perf_counter()

        # 1. integrate a queued MKF first (preempts BA)
        if self.queue:
            if self._ba_kind != "none" and self._ba_state is not None \
                    and int(self._ba_state.accepted) > 0:
                # apply whatever the aborted BA achieved (the reference's
                # two-step AdjustAndUpdate applies partial progress too)
                ms = self._partial_wb_fn(ms, self._ba_prob, self._ba_state)
            self._reset_ba()
            feats, pose, result, cam_active = self.queue.pop(0)
            C = ms.cam_from_base.t.shape[0]
            if cam_active is None:
                cam_active = jnp.ones((C,), bool)
            ms_new, _, n_large, slot_ok = self._integrate(
                ms, feats, pose, result, cam_active
            )
            # a rejected MKF (large-point sanity test, ref :374,397-401 —
            # or a full MKF store) is simply dropped, like the reference
            # deleting the MKF when AddMultiKeyFrameAndCreatePoints
            # returns false
            slot_ok_h, n_large_h = jax.device_get((slot_ok, n_large))
            accepted = bool(slot_ok_h) and (
                not self.mcfg.large_point_test or int(n_large_h) > 0
            )
            if accepted:
                ms = ms_new
            self.last_timing = MapMakerTiming(
                elapsed=time.perf_counter() - t0,
                kind="creation" if accepted else "creation-rejected",
            )
            return ms

        # 2. advance bundle adjustment
        if self._ba_kind == "none":
            if not self._local_done:
                # local BA only once the map is big enough
                # (snRecentMinSize, ref src/BundleAdjusterBase.cc:195-200:
                # below it, mark local converged and fall through to global)
                if int(jax.device_get(self._count_mkfs_fn(ms))) \
                        < self.bcfg.recent_min_size:
                    self._local_done = True
                    return self._tick(ms)
                self._ba_kind = "local"
                # compacted local problem: LM step cost independent of the
                # total map size (edges restricted to the local set, ref
                # src/BundleAdjusterBase.cc:188-265).  D is STATIC here
                # D sized from the data (bucketed, see _local_prob);
                # obs_dropped is still checked and logged when the run
                # completes in case the 64 hard cap clipped a hub point.
                self._ba_prob = self._local_prob_fn(ms)
            elif not self._global_done:
                self._ba_kind = "global"
                # compact the global problem to the live point/measurement
                # counts (bucketed so shapes stay static per bucket): a
                # half-full map must not pay full-capacity LM iterations
                self._ba_prob = self._global_problem(ms)
            else:
                # idle: trash GC + periodic refinds.  The failure queue
                # (outlier pairs awaiting a second chance) is retried as a
                # distinct pass 1-in-20 loops, like ReFindFromFailureQueue
                # (src/MapMaker.cc:270-276); the general sweep
                # (ReFindNewlyMade analogue) runs on the other half of the
                # schedule.  Pairs that fail either pass become
                # never-retry inside refind_in_keyframes.
                ms = self._gc_fn(ms)
                self._idle_ticks += 1
                n_refound = 0
                if self._idle_ticks % 20 == 10:
                    ms, n_refound = self._refind_fn(ms)
                elif self._idle_ticks % 20 == 0 and bool(
                    jax.device_get(self._any_retry_fn(ms))
                ):
                    ms, n_refound = self._refind_retry_fn(ms)
                if int(n_refound) > 0:
                    # new measurements -> re-run BA
                    self._local_done = False
                    self._global_done = False
                return ms
            self._ba_state = create_lm_state(self._ba_prob, self.bcfg)
            self._ba_steps = 0

        # pipelined convergence: dispatch this chunk and read the flag of
        # the chunk dispatched TWO ticks ago — its compute finished during
        # the previous tick's device work and its device->host transfer
        # (started asynchronously at dispatch) has already landed, so the
        # read never blocks on the device or the tunnel (the reference's
        # free-running map-maker thread never blocks the tracker either,
        # src/MapMaker.cc:131-133).  Costs at most two extra chunks of
        # frozen (converged) iterations per BA run.
        self._ba_state = self._lm_run(self._ba_prob, self._ba_state)
        # start the convergence flag's device->host transfer now; the
        # fetch two ticks later is then a local read, not a round-trip
        self._ba_state.converged.copy_to_host_async()
        self._conv_pending.append(self._ba_state.converged)
        self._ba_steps += self.ba_chunk
        converged = False
        if len(self._conv_pending) > 2:
            converged = bool(np.asarray(self._conv_pending.pop(0)))
        exhausted = self._ba_steps >= self.bcfg.max_iterations

        if converged or exhausted:
            accepted, total_iters, n_drop = (int(x) for x in jax.device_get((
                self._ba_state.accepted, self._ba_state.iterations,
                self._ba_prob.obs_dropped,
            )))
            if n_drop > 0:
                import logging
                logging.getLogger(__name__).warning(
                    "%s BA: obs table dropped %d measurements from the "
                    "normal equations (D too small for some point)",
                    self._ba_kind, n_drop,
                )
            if accepted > 0:
                ms = self._finish_fn(ms, self._ba_prob, self._ba_state)
                self.failed_ba_count = 0
            else:
                self.failed_ba_count += 1
            self.last_timing = MapMakerTiming(
                elapsed=time.perf_counter() - t0,
                accepted_iterations=accepted,
                total_iterations=total_iters,
                kind=self._ba_kind,
            )
            if self._ba_kind == "local":
                self._local_done = True
            else:
                self._global_done = True
                # init gate (ref src/MapMaker.cc:288-295): median point
                # depth covariance below threshold -> RUNNING
                if self.state == MM_INITIALIZING:
                    med = self._depth_cov_fn(self._ba_prob, self._ba_state)
                    self.init_point_cov = float(med)
                    if self.init_point_cov < self.mcfg.init_cov_thresh:
                        self.state = MM_RUNNING
            self._ba_kind = "none"
            self._ba_prob = None
            self._ba_state = None
            self._conv_pending = []
        return ms

    def stop_init(self):
        """Force the end of initialization (ref RequestStopInit via the
        ManualAddMKF GUI command, src/System.cc:349-356)."""
        self.state = MM_RUNNING

    def on_map_changed(self):
        """New measurements/points invalidate BA convergence latches."""
        self._local_done = False
        self._global_done = False

    @property
    def reset_requested(self) -> bool:
        """N consecutive failed BAs request a system reset
        (src/MapMaker.cc:216-224, RequestResetInternal)."""
        return self.failed_ba_count >= 5
