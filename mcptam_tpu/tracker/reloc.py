"""SBI relocalizer: recover a lost tracker from keyframe appearance.

Re-implements the reference Relocaliser (src/Relocaliser.cc:61-120): score
the current frame's SmallBlurryImage against every stored keyframe SBI of
the same camera (batched ZMSSD over the whole keyframe store), ESM-align to
the best, lift the SE2 to a camera rotation, and compose a recovered base
pose.  Accept when the best score beats sdRecoveryMaxScore.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcptam_tpu.core.se3 import SE3
from mcptam_tpu.core.camera import CameraModel
from mcptam_tpu.map.state import MapState, kf_cam_from_world
from mcptam_tpu.map.keyframe import FrameFeatures
from mcptam_tpu.ops.sbi import esm_align, se3_from_se2, sbi_zmssd

# sdRecoveryMaxScore = 1e5 (src/Relocaliser.cc:50,83).  The unit carries
# over directly: both the reference and this SBI are 40x30 byte-scale
# zero-mean blurred templates, and the accepted quantity is the SSD of the
# ESM-ALIGNED pair (IteratePosRelToTarget's dFinalScore,
# src/SmallBlurryImage.cc:158-246), not the pre-alignment scan score —
# 1e5 over 1200 px ~= 9.1 gray levels RMS residual after alignment.
RECOVERY_MAX_SCORE = 1e5


def attempt_recovery(ms: MapState, cams_sbi: CameraModel,
                     feats: FrameFeatures,
                     max_score: float = RECOVERY_MAX_SCORE,
                     cam_active=None):
    """Try to relocalize against the keyframe store.

    Returns (pose: SE3 base_from_world, success: bool, align_score).
    Every camera scores its SBI against all its stored KF SBIs; the best
    (camera, keyframe) pair is ESM-aligned and ACCEPTED ON THE ALIGNED
    RESIDUAL, exactly as Relocaliser::AttemptRecovery thresholds the
    IteratePosRelToTarget score (src/Relocaliser.cc:61-88)."""
    M = ms.mkfs.capacity
    C = feats.sbi.shape[0]

    # scores (M,C): current cam c vs stored KF SBI (m,c)
    cur = feats.sbi[None, :, :, :]
    scores = sbi_zmssd(cur, ms.mkfs.sbi)
    valid = ms.mkfs.valid[:, None] & ms.mkfs.kf_valid
    if cam_active is not None:
        # a dropped camera's current SBI is stale — exclude it
        valid = valid & cam_active[None, :]
    scores = jnp.where(valid, scores, jnp.inf)

    flat_best = jnp.argmin(scores.reshape(-1))
    best_m = flat_best // C
    best_c = flat_best % C
    best_score = scores.reshape(-1)[flat_best]

    # ESM-align current SBI to the stored KF SBI, lift to SO3
    cur_sbi = feats.sbi[best_c]
    tgt_sbi = ms.mkfs.sbi[best_m, best_c]
    tgt_gx = ms.mkfs.sbi_gx[best_m, best_c]
    tgt_gy = ms.mkfs.sbi_gy[best_m, best_c]
    # the reference uses 6 ESM iterations here (src/Relocaliser.cc:76);
    # a few extra cost nothing under jit and only help convergence
    se2, esm_score = esm_align(cur_sbi, tgt_sbi, tgt_gx, tgt_gy, 12)
    cam_c = jax.tree_util.tree_map(lambda a: a[best_c], cams_sbi)
    # v_cur = R^T v_kf (se3_from_se2 maps target(kf) rays into src(cur))
    R_rel = se3_from_se2(se2, cam_c, cam_c)

    kcw = kf_cam_from_world(ms)
    kf_pose = jax.tree_util.tree_map(
        lambda a: a[best_m, best_c], SE3(R=kcw.R, t=kcw.t)
    )
    # recovered cam pose: rotate the KF pose by the relative rotation
    cam_pose = SE3(R=R_rel, t=jnp.zeros(3)) @ kf_pose
    cfb = ms.cam_from_base
    cam_from_base = jax.tree_util.tree_map(lambda a: a[best_c], cfb)
    base_pose = cam_from_base.inv() @ cam_pose

    # accept on the POST-ALIGNMENT residual (ref src/Relocaliser.cc:76-87);
    # a valid best pair must exist at all (finite scan score)
    success = jnp.isfinite(best_score) & (esm_score < max_score)
    return base_pose, success, esm_score
