"""mcptam_tpu — TPU-native multi-camera parallel tracking and mapping.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of aharmat/mcptam
(multi-camera PTAM with Taylor omnidirectional cameras, pose-chain bundle
adjustment, client/server mapping split, and intrinsic/extrinsic
calibration), designed for TPU: fixed-capacity masked arrays instead of
pointer graphs, vmap over cameras/points instead of per-camera loops, and a
batched Schur-complement Levenberg-Marquardt bundle adjuster instead of
g2o/CHOLMOD.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry chains (camera Jacobians, SE3 composes, normal equations) are
# small matmuls whose accuracy matters at the sub-pixel level; TPU MXU
# defaults to bfloat16 inputs which costs ~0.5 px in projection round
# trips.  Force full f32 matmul precision — the hot image kernels are
# VPU-elementwise and unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")
