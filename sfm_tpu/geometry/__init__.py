"""Numeric/geometry core (SURVEY.md §2.1): pure-JAX, jit/vmap-safe.

Reference-class systems implement this layer in C++ over Eigen; on TPU the
idiomatic realization is pure functional jnp that vmaps over batches and
differentiates cleanly for bundle adjustment.
"""

from sfm_tpu.geometry.rotations import (  # noqa: F401
    aa_to_matrix,
    matrix_to_aa,
    quat_to_matrix,
    matrix_to_quat,
    quat_mul,
    so3_exp,
    so3_log,
    so3_hat,
)
from sfm_tpu.geometry.cameras import (  # noqa: F401
    CAM_FX, CAM_FY, CAM_CX, CAM_CY, CAM_K1, CAM_K2, NUM_INTRINSICS,
    make_intrinsics,
    distort,
    undistort,
    camera_to_pixel,
    pixel_to_camera,
)
from sfm_tpu.geometry.projection import (  # noqa: F401
    world_to_camera,
    camera_to_world,
    project,
    reprojection_residual,
    compose_poses,
    invert_pose,
)
from sfm_tpu.geometry.losses import huber, cauchy, robust_weight  # noqa: F401
