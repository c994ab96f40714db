from mcptam_tpu.core.se3 import SE3, so3_exp, so3_ln, hat, vee
from mcptam_tpu.core.camera import (
    CameraModel,
    make_camera,
    stack_cameras,
    project,
    unproject,
    projection_derivs_sphere,
    project_jacobian_point,
)
