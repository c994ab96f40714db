"""Device-mesh sharding for rig-scale and map-scale parallelism.

The reference's parallelism axes (SURVEY §2.11) map onto a JAX mesh:

  * its per-camera independence (every tracker stage loops over cameras,
    src/Tracker.cc:303-333) and per-measurement independence in BA (g2o's
    OpenMP edge parallelism, src/ChainBundle.cc:451-456) both become a
    single data-parallel device axis "d": measurements / (camera x point)
    pairs are sharded, and the 6x6 (pose WLS) or reduced-camera-system
    normal equations are all-reduced over ICI — XLA inserts the psums from
    sharding annotations (the scaling-book recipe);
  * the tracker/map-maker thread split stays on the host schedule — both
    kernels share the mesh.

Multi-chip hardware is validated with a virtual CPU mesh
(xla_force_host_platform_device_count) + the driver's dryrun.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "d"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _spec(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def shard_bundle_problem(mesh: Mesh, prob):
    """Sharding pytree for a BundleProblem: measurement arrays split over
    the device axis, parameters replicated (they're small; the reduced
    camera system is assembled with psums)."""
    rep = _spec(mesh)
    meas = _spec(mesh, AXIS)

    def spec_for(path, leaf):
        name = path[0].name if path else ""
        if name.startswith("m_"):
            return meas
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, prob)


def sharded_lm_run(mesh: Mesh, prob, cams, n_steps: int, bcfg=None):
    """jit an LM run with measurements sharded over the mesh; XLA turns
    the normal-equation scatter-sums into reduce-scatters/psums over ICI."""
    from mcptam_tpu.ba.bundle import lm_run, create_lm_state
    from mcptam_tpu.config import DEFAULT_BUNDLE

    bcfg = bcfg or DEFAULT_BUNDLE
    prob_sharding = shard_bundle_problem(mesh, prob)
    prob = jax.device_put(prob, prob_sharding)
    st = create_lm_state(prob, bcfg)

    fn = jax.jit(
        lambda p, s: lm_run(p, s, cams, n_steps, bcfg),
        in_shardings=(prob_sharding, None),
    )
    return fn(prob, st), prob


_PT_FIELDS = ("points", "movable_pt", "obs_idx", "obs_valid",
              "pt_src_a", "pt_src_b", "pt_index", "pt_index_ok")


def shard_bundle_problem_soa(mesh: Mesh, prob):
    """Sharding pytree for the PRODUCTION obs-table layout (the path
    system/mapmaker.py actually runs: grouped (L, D) observation table +
    ``fixed_b=True``): the point/L axis is split over devices — points,
    their movable mask, the obs table and the source-chain indices — while
    the K-sized measurement arrays and the handful of poses stay
    replicated, so every ``obs_idx`` gather reads replicated operands with
    device-local indices (no cross-chip gather).  The normal-equation
    contractions over N = L*D become psums/reduce-scatters over ICI, the
    TPU analogue of g2o's OpenMP edge parallelism
    (ref src/ChainBundle.cc:451-456)."""
    rep = _spec(mesh)
    ptx0 = _spec(mesh, AXIS)

    def spec_for(path, leaf):
        name = path[0].name if path else ""
        if name in _PT_FIELDS:
            return ptx0
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, prob)


def _shard_lm_state_soa(mesh: Mesh, st):
    rep = _spec(mesh)
    ptx0 = _spec(mesh, AXIS)

    def spec_for(path, leaf):
        name = path[0].name if path else ""
        return ptx0 if name == "points" else rep

    return jax.tree_util.tree_map_with_path(spec_for, st)


def sharded_lm_run_soa(mesh: Mesh, prob_t, cams, n_steps: int, bcfg=None):
    """jit an LM run over the production SoA layout (obs table attached,
    extrinsics statically fixed) with the point axis sharded over the
    mesh.  L must divide the mesh size.  Returns (final LMState, sharded
    problem)."""
    from mcptam_tpu.ba.bundle import lm_run, create_lm_state
    from mcptam_tpu.config import DEFAULT_BUNDLE

    assert prob_t.obs_idx is not None, (
        "sharded_lm_run_soa needs an attached obs table "
        "(ba.bundle.attach_obs_table)"
    )
    bcfg = bcfg or DEFAULT_BUNDLE
    prob_sharding = shard_bundle_problem_soa(mesh, prob_t)
    prob_t = jax.device_put(prob_t, prob_sharding)
    st = create_lm_state(prob_t, bcfg)
    st_sharding = _shard_lm_state_soa(mesh, st)
    st = jax.device_put(st, st_sharding)

    fn = jax.jit(
        lambda p, s: lm_run(p, s, cams, n_steps, bcfg, fixed_b=True),
        in_shardings=(prob_sharding, st_sharding),
    )
    return fn(prob_t, st), prob_t


def shard_map_points(mesh: Mesh, ms):
    """Sharding pytree for a MapState: the point axis (the biggest) is
    split over devices; keyframe imagery and measurement lists are
    replicated.  Used to scale map capacity across chips."""
    rep = _spec(mesh)
    pt = _spec(mesh, AXIS)

    def spec_for(path, leaf):
        names = [p.name for p in path if hasattr(p, "name")]
        if names and names[0] == "points":
            return pt
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, ms)


def sharded_frame_features(mesh: Mesh, images):
    """jit make_frame_features with the image ROW axis sharded over devices
    (the spatial-parallel axis: pyramid half-sampling, FAST scoring and
    nonmax are row-local with small halos, which XLA exchanges over ICI
    via collective-permutes).  The per-camera axis stays untouched so this
    composes with any rig size; corner/candidate reductions all-gather.

    Returns (fn, sharded_images)."""
    from mcptam_tpu.map.keyframe import make_frame_features

    img_sharding = _spec(mesh, None, AXIS, None)  # (C, H, W): shard H
    images = jax.device_put(images, img_sharding)
    fn = jax.jit(make_frame_features, in_shardings=(img_sharding,))
    return fn, images


def sharded_epipolar_match(mesh: Mesh):
    """jit epipolar_match with the CANDIDATE axis sharded over devices —
    the map-maker's hot op (ref AddPointEpipolar,
    src/MapMakerServerBase.cc:604-914): each chip scores its slice of the
    (candidate x hypothesis x window) tensor against the replicated
    keyframe imagery; no cross-candidate reduction exists, so the only
    collective is the output all-gather.

    Returns fn(ms, cams, src_mkf, src_cam, tgt_mkf, tgt_cam, level,
    xy_level, want) with the (Q,)-shaped args sharded; Q must divide by
    the mesh size."""
    from mcptam_tpu.map.epipolar import epipolar_match

    cand = _spec(mesh, AXIS)
    return jax.jit(
        epipolar_match,
        in_shardings=(None, None) + (cand,) * 7,
        out_shardings=cand,
    )


def sharded_track_frame(mesh: Mesh, ms, cams, cams_sbi, tcfg):
    """jit track_frame with the map's point arrays sharded over devices:
    the PVS projection and pair search parallelize over chips, and the
    6-DOF pose normal equations all-reduce (the rig-scale analogue of
    data-parallel gradient aggregation)."""
    from mcptam_tpu.tracker.tracker import track_frame

    ms_sharding = shard_map_points(mesh, ms)
    ms = jax.device_put(ms, ms_sharding)

    fn = jax.jit(
        lambda ts, m, feats: track_frame(ts, m, cams, cams_sbi, feats, tcfg),
        in_shardings=(None, ms_sharding, None),
    )
    return fn, ms
