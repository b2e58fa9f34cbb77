"""Multi-view triangulation (SURVEY.md §2.5): batched masked DLT.

Each track triangulates from up to V observations (padded + masked). The
per-track 4x4 normal matrix AtA is a masked sum of per-observation rank-2
contributions — one einsum over the whole track batch, then a batched eigh.
Filters (cheirality, min triangulation angle, max reprojection error) are
returned as masks, never as shape changes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.rotations import so3_exp


class TriangulationResult(NamedTuple):
    points: jnp.ndarray      # [T, 3]
    valid: jnp.ndarray       # [T] passed all filters
    max_angle_deg: jnp.ndarray  # [T] best pairwise ray angle
    max_error: jnp.ndarray   # [T] worst reprojection error among obs (normalized coords)


@partial(jax.jit, static_argnames=())
def triangulate_tracks(
    rvecs: jnp.ndarray,     # [T, V, 3] world->cam pose per observation slot
    tvecs: jnp.ndarray,     # [T, V, 3]
    xy: jnp.ndarray,        # [T, V, 2] normalized camera coords
    mask: jnp.ndarray,      # [T, V] observation validity
    min_angle_deg: float = 1.5,
    max_error_norm: float = 0.01,
) -> TriangulationResult:
    R = so3_exp(rvecs)                                    # [T, V, 3, 3]
    P = jnp.concatenate([R, tvecs[..., None]], axis=-1)   # [T, V, 3, 4]

    # DLT rows: x*P2 - P0, y*P2 - P1.
    r0 = xy[..., 0:1] * P[..., 2, :] - P[..., 0, :]       # [T, V, 4]
    r1 = xy[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    A = jnp.stack([r0, r1], axis=2) * mask[..., None, None]  # [T, V, 2, 4]
    AtA = jnp.einsum("tvik,tvil->tkl", A, A)              # [T, 4, 4]
    # Condition: normalize by trace so eigh is well-scaled.
    tr = jnp.einsum("tkk->t", AtA)
    AtA = AtA / jnp.maximum(tr, 1e-12)[:, None, None] + 1e-12 * jnp.eye(4)
    _, V4 = jnp.linalg.eigh(AtA)
    Xh = V4[..., 0]
    wcomp = jnp.where(jnp.abs(Xh[:, 3:4]) < 1e-9, 1e-9, Xh[:, 3:4])
    X = Xh[:, :3] / wcomp                                 # [T, 3]

    # Filters.
    xc = jnp.einsum("tvij,tj->tvi", R, X) + tvecs         # [T, V, 3]
    z = xc[..., 2]
    cheiral = jnp.all(jnp.where(mask, z > 1e-4, True), axis=-1) & (jnp.sum(mask, -1) >= 2)

    proj = xc[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-8, 1e-8, z[..., None])
    err = jnp.sqrt(jnp.sum((proj - xy) ** 2, axis=-1))
    max_err = jnp.max(jnp.where(mask, err, 0.0), axis=-1)

    # Max pairwise ray angle via camera centers.
    centers = -jnp.einsum("tvji,tvj->tvi", R, tvecs)      # [T, V, 3]
    rays = X[:, None, :] - centers
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.einsum("tvi,twi->tvw", rays, rays)
    pair_mask = mask[:, :, None] & mask[:, None, :]
    cosang = jnp.where(pair_mask, cosang, 1.0)
    max_angle = jnp.degrees(jnp.arccos(jnp.clip(jnp.min(cosang, axis=(1, 2)), -1.0, 1.0)))

    valid = cheiral & (max_angle >= min_angle_deg) & (max_err < max_error_norm)
    return TriangulationResult(points=X, valid=valid, max_angle_deg=max_angle, max_error=max_err)
