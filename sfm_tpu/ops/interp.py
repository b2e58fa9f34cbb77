"""Bilinear sampling from image stacks — the gather primitive behind
orientation/descriptor patch extraction (SURVEY.md §2.2).

Reference-class SIFT walks pixel neighborhoods with scalar loops; the
TPU-native formulation gathers fixed lattices of sample positions for all
keypoints at once and lets XLA batch the gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H, W] at continuous positions xy [..., 2] (x, y order).

    Out-of-bounds samples clamp to the border (callers mask them out via
    their own validity logic). Returns [...].
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def bilinear_sample_stack(stack: jnp.ndarray, level: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample stack [L, H, W] at integer level [...] and positions xy [..., 2].

    Implemented as a flat gather over (level*H + y, x) so one gather serves
    all keypoints regardless of their level.
    """
    L, H, W = stack.shape
    flat = stack.reshape(L * H, W)
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    base = level.astype(jnp.int32) * H
    r0 = base + y0
    r1 = base + y1
    v00 = flat[r0, x0]
    v01 = flat[r0, x1]
    v10 = flat[r1, x0]
    v11 = flat[r1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
