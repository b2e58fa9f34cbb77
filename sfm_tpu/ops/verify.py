"""Two-view geometric verification stage (SURVEY.md §3.3).

For each matched pair: batched RANSAC over the essential matrix (calibrated
path), plus a homography RANSAC whose inlier ratio flags planar/rotational
degeneracy (reference-class H/F degeneracy test), then relative pose by E
decomposition with the cheirality vote. Fundamental-matrix verification is
available for the uncalibrated path. One jit serves a whole pair block.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import RansacConfig
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.geometry.rotations import matrix_to_aa
from sfm_tpu.ops import solvers
from sfm_tpu.ops.ransac import ransac, irls_refit


class TwoViewGeometry(NamedTuple):
    """Verified two-view geometry for a block of pairs. Leading axis = pairs."""

    rvec: jnp.ndarray        # [P, 3] relative pose (cam_i -> cam_j), world=cam_i
    tvec: jnp.ndarray        # [P, 3] unit-norm translation
    inliers: jnp.ndarray     # [P, M] bool (over the match slots)
    num_inliers: jnp.ndarray # [P]
    num_h_inliers: jnp.ndarray  # [P] homography support (degeneracy stat)
    ok: jnp.ndarray          # [P] enough inliers and not degenerate
    E: jnp.ndarray           # [P, 3, 3] essential matrices


def verify_pair(
    key: jax.Array,
    uv1: jnp.ndarray, uv2: jnp.ndarray, mask: jnp.ndarray,
    intr1: jnp.ndarray, intr2: jnp.ndarray,
    cfg: RansacConfig,
):
    """uv1/uv2 [M, 2] matched pixels; returns one TwoViewGeometry row."""
    x1 = pixel_to_camera(uv1, intr1)
    x2 = pixel_to_camera(uv2, intr2)
    # Normalized-coords threshold: pixel threshold / focal (geometric mean).
    f1 = (intr1[0] + intr1[1]) * 0.5
    f2 = (intr2[0] + intr2[1]) * 0.5
    thr_norm = (cfg.error_threshold_px / f1) * (cfg.error_threshold_px / f2)

    k_e, k_h = jax.random.split(key)
    res_e = ransac(
        k_e, x1, x2, mask,
        # 4 GN polish steps per hypothesis: 3 recovers most of the manifold
        # projection error, the LO refit below does the precision work.
        solver=lambda a, b: solvers.essential_minimal(a, b, gn_iters=4),
        error_fn=solvers.sampson_error,
        sample_size=8,
        num_hypotheses=cfg.num_hypotheses,
        threshold_sq=thr_norm,
        min_inliers=cfg.min_inliers,
    )
    E, inl = irls_refit(
        res_e.model, x1, x2, mask,
        fit_fn=lambda a, b, w: solvers.essential_minimal(a, b, w),
        error_fn=solvers.sampson_error,
        threshold_sq=thr_norm,
        iters=cfg.refine_iters,
    )
    n_e = jnp.sum(inl)

    # Homography support on pixel coords (degeneracy check).
    res_h = ransac(
        k_h, uv1, uv2, mask,
        solver=solvers.homography_4pt,
        error_fn=solvers.homography_error,
        sample_size=4,
        num_hypotheses=cfg.num_hypotheses // 2,
        threshold_sq=cfg.error_threshold_px**2,
        min_inliers=cfg.min_inliers,
    )

    R, t, n_cheiral = solvers.decompose_essential(E, x1, x2, inl)
    rvec = matrix_to_aa(R)

    ok = (n_e >= cfg.min_inliers) & (n_cheiral >= jnp.maximum(n_e // 2, 1))
    return rvec, t, inl, n_e, res_h.num_inliers, ok, E


@partial(jax.jit, static_argnames=("cfg",))
def verify_block(
    keys: jax.Array,              # [P] PRNG keys (deterministic per pair)
    uv1: jnp.ndarray, uv2: jnp.ndarray, mask: jnp.ndarray,   # [P, M, 2] x2, [P, M]
    intr1: jnp.ndarray, intr2: jnp.ndarray,                  # [P, 6]
    cfg: RansacConfig,
) -> TwoViewGeometry:
    rvec, t, inl, n_e, n_h, ok, E = jax.vmap(
        lambda k, a, b, m, i1, i2: verify_pair(k, a, b, m, i1, i2, cfg)
    )(keys, uv1, uv2, mask, intr1, intr2)
    return TwoViewGeometry(
        rvec=rvec, tvec=t, inliers=inl, num_inliers=n_e, num_h_inliers=n_h, ok=ok, E=E
    )
