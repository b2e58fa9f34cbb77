"""Camera intrinsic models: pinhole + radial distortion (SURVEY.md §2.1).

A single static layout covers the reference-class model zoo (PINHOLE,
SIMPLE_RADIAL, RADIAL) so per-camera arrays are fixed-width and vmappable:

    intrinsics[..., 6] = [fx, fy, cx, cy, k1, k2]

PINHOLE        -> k1 = k2 = 0
SIMPLE_RADIAL  -> fx == fy, k2 = 0
RADIAL         -> fx == fy

Distortion inversion is a fixed-iteration Newton solve (statically bounded,
jit-friendly) rather than the reference-class variable-iteration loop.
"""

from __future__ import annotations

import jax.numpy as jnp

CAM_FX, CAM_FY, CAM_CX, CAM_CY, CAM_K1, CAM_K2 = 0, 1, 2, 3, 4, 5
NUM_INTRINSICS = 6


def make_intrinsics(fx, fy=None, cx=0.0, cy=0.0, k1=0.0, k2=0.0) -> jnp.ndarray:
    fy = fx if fy is None else fy
    return jnp.asarray([fx, fy, cx, cy, k1, k2], dtype=jnp.float32)


def distort(xy: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Apply radial distortion to normalized camera coords (..., 2)."""
    k1 = intr[..., CAM_K1]
    k2 = intr[..., CAM_K2]
    r2 = jnp.sum(xy * xy, axis=-1)
    scale = 1.0 + r2 * (k1 + r2 * k2)
    return xy * scale[..., None]


def undistort(xy_d: jnp.ndarray, intr: jnp.ndarray, num_iters: int = 8) -> jnp.ndarray:
    """Invert radial distortion by fixed-point/Newton iteration.

    Fixed iteration count => static control flow under jit. At SfM-typical
    |k1| < 0.5, 8 iterations converge to float32 round-off.
    """
    xy = xy_d
    for _ in range(num_iters):
        k1 = intr[..., CAM_K1]
        k2 = intr[..., CAM_K2]
        r2 = jnp.sum(xy * xy, axis=-1)
        scale = 1.0 + r2 * (k1 + r2 * k2)
        xy = xy_d / scale[..., None]
    return xy


def camera_to_pixel(xyz: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points (..., 3) -> pixel coords (..., 2).

    Perspective divide guarded to keep gradients finite for points behind or
    at the camera plane (those observations are masked out by callers).
    """
    z = xyz[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    xy = xyz[..., :2] / z_safe
    xy = distort(xy, intr)
    f = jnp.stack([intr[..., CAM_FX], intr[..., CAM_FY]], axis=-1)
    c = jnp.stack([intr[..., CAM_CX], intr[..., CAM_CY]], axis=-1)
    return xy * f + c


def pixel_to_camera(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (..., 2) -> normalized (undistorted) camera coords (..., 2)."""
    f = jnp.stack([intr[..., CAM_FX], intr[..., CAM_FY]], axis=-1)
    c = jnp.stack([intr[..., CAM_CX], intr[..., CAM_CY]], axis=-1)
    xy_d = (uv - c) / f
    return undistort(xy_d, intr)
