"""World->pixel projection and reprojection residuals (SURVEY.md §2.1).

Pose convention (COLMAP-compatible): a camera pose is (rvec, t) with
world->camera map  x_cam = R(rvec) @ x_world + t.  Camera center is
C = -R^T t. Angle-axis rvec is the bundle-adjustment parametrization; all
functions here are differentiable and vmap over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.geometry.rotations import so3_exp, so3_log
from sfm_tpu.geometry.cameras import camera_to_pixel


def world_to_camera(x_world: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x_cam = R x_world + t, batched over leading axes."""
    R = so3_exp(rvec)
    return jnp.einsum("...ij,...j->...i", R, x_world) + t


def camera_to_world(x_cam: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    R = so3_exp(rvec)
    return jnp.einsum("...ji,...j->...i", R, x_cam - t)


def camera_center(rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """C = -R^T t."""
    R = so3_exp(rvec)
    return -jnp.einsum("...ji,...j->...i", R, t)


def project(x_world: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """World point -> pixel. The single projection shared by triangulation, PnP, BA."""
    return camera_to_pixel(world_to_camera(x_world, rvec, t), intr)


def point_depth(x_world: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Depth (camera-frame z) of a world point; positive => in front of camera."""
    return world_to_camera(x_world, rvec, t)[..., 2]


def reprojection_residual(
    x_world: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray, intr: jnp.ndarray, uv_obs: jnp.ndarray
) -> jnp.ndarray:
    """2-vector residual: project(x) - observed pixel."""
    return project(x_world, rvec, t, intr) - uv_obs


def compose_poses(rvec_a, t_a, rvec_b, t_b):
    """Compose world->cam maps: result = A after B, i.e. x -> A(B(x)).

    R = Ra Rb, t = Ra tb + ta.
    """
    Ra = so3_exp(rvec_a)
    Rb = so3_exp(rvec_b)
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, t_b) + t_a
    return so3_log(R), t


def invert_pose(rvec, t):
    """Inverse of the world->camera map: R' = R^T, t' = -R^T t."""
    R = so3_exp(rvec)
    Rt = jnp.swapaxes(R, -1, -2)
    return so3_log(Rt), -jnp.einsum("...ij,...j->...i", Rt, t)


def relative_pose(rvec_i, t_i, rvec_j, t_j):
    """Pose of camera j relative to camera i: x_j = R_rel x_i + t_rel."""
    rv_i_inv, t_i_inv = invert_pose(rvec_i, t_i)
    return compose_poses(rvec_j, t_j, rv_i_inv, t_i_inv)
