"""Two-view bootstrap reconstruction (SURVEY.md §2.5): relative pose +
initial triangulation, also the M1 end-to-end path for 2-image inputs
(config ladder #1, BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import PipelineConfig
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.geometry.projection import project
from sfm_tpu.ops.solvers import triangulate_linear
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.scene.state import Reconstruction


def triangulation_angles(X: np.ndarray, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Angle at each point between the two camera rays, degrees."""
    r1 = X - c1
    r2 = X - c2
    cos = np.sum(r1 * r2, -1) / np.maximum(
        np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
    )
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def bootstrap_two_view(
    feats: FeatureSet,
    graph: MatchGraph,
    edge: int,
    intrinsics: np.ndarray,
    cfg: PipelineConfig,
) -> Reconstruction:
    """Build a two-camera reconstruction from verified edge `edge`."""
    i, j = graph.pairs[edge]
    rvec_rel = graph.rvec[edge]
    tvec_rel = graph.tvec[edge]
    inl = graph.inlier[edge]
    ki = graph.idx_i[edge][inl]
    kj = graph.idx_j[edge][inl]

    uv1 = feats.xy[i][ki]
    uv2 = feats.xy[j][kj]
    intr1 = jnp.asarray(intrinsics[i])
    intr2 = jnp.asarray(intrinsics[j])
    x1 = np.asarray(pixel_to_camera(jnp.asarray(uv1), intr1))
    x2 = np.asarray(pixel_to_camera(jnp.asarray(uv2), intr2))

    R2 = np.asarray(so3_exp(jnp.asarray(rvec_rel)))
    X = np.asarray(
        triangulate_linear(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R2), jnp.asarray(tvec_rel),
            jnp.asarray(x1), jnp.asarray(x2),
        )
    )

    # Filters: cheirality, triangulation angle, reprojection error.
    z1 = X[:, 2]
    z2 = (X @ R2.T + tvec_rel)[:, 2]
    c1 = np.zeros(3)
    c2 = -R2.T @ tvec_rel
    ang = triangulation_angles(X, c1, c2)
    rv1 = np.zeros(3, dtype=np.float32)
    p1 = np.asarray(project(jnp.asarray(X), jnp.asarray(rv1), jnp.zeros(3), intr1))
    p2 = np.asarray(project(jnp.asarray(X), jnp.asarray(rvec_rel), jnp.asarray(tvec_rel), intr2))
    e1 = np.linalg.norm(p1 - uv1, axis=-1)
    e2 = np.linalg.norm(p2 - uv2, axis=-1)
    keep = (
        (z1 > 1e-4) & (z2 > 1e-4)
        & (ang >= cfg.engine.min_triangulation_angle_deg)
        & (e1 < cfg.engine.max_reprojection_error_px)
        & (e2 < cfg.engine.max_reprojection_error_px)
    )

    B = len(feats.xy)
    rvecs = np.zeros((B, 3), np.float32)
    tvecs = np.zeros((B, 3), np.float32)
    registered = np.zeros(B, bool)
    rvecs[j] = rvec_rel
    tvecs[j] = tvec_rel
    registered[i] = registered[j] = True

    X = X[keep]
    ki, kj = ki[keep], kj[keep]
    uv1, uv2 = uv1[keep], uv2[keep]
    n = len(X)
    obs_point = np.concatenate([np.arange(n), np.arange(n)]).astype(np.int32)
    obs_image = np.concatenate([np.full(n, i), np.full(n, j)]).astype(np.int32)
    obs_kp = np.concatenate([ki, kj]).astype(np.int32)
    obs_uv = np.concatenate([uv1, uv2]).astype(np.float32)

    rec = Reconstruction(
        intrinsics=intrinsics.copy(),
        rvecs=rvecs,
        tvecs=tvecs,
        registered=registered,
        points=X.astype(np.float32),
        point_errors=((e1 + e2)[keep] / 2).astype(np.float32),
        point_valid=np.ones(n, bool),
        obs_point=obs_point,
        obs_image=obs_image,
        obs_kp=obs_kp,
        obs_uv=obs_uv,
    )

    # Two-view bundle adjustment (SURVEY.md §2.5 bootstrap step).
    if n >= 8:
        from sfm_tpu.ba import build_problem, dispatch_bundle_adjust, writeback

        prob, cams, pids = build_problem(rec)
        out, _ = dispatch_bundle_adjust(prob, cfg)
        writeback(rec, out, cams, pids)
    return rec
