"""Two-view geometric verification stage (SURVEY.md §3.3, §2.4).

For each matched pair, one jit region runs:
  - model RANSAC: essential (calibrated path, default) or fundamental
    (uncalibrated path: F in pixels, pose upgraded through the focal prior
    E = K2^T F K1) — config-switched via RansacConfig.model;
  - homography RANSAC, whose inlier ratio is the reference-class H/E
    planar-degeneracy statistic;
  - the degeneracy gate (RansacConfig.degenerate_h_ratio): pairs whose H
    support dominates are planar or rotation-only — the E estimate is
    ambiguous there, so the pose is recovered from the HOMOGRAPHY
    decomposition instead (Faugeras SVD + cheirality/plane vote), and
    pure-rotation pairs (no parallax) are rejected outright;
  - relative pose by E decomposition with the cheirality vote otherwise.
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
    ok: jnp.ndarray          # [P] enough geometrically-consistent matches
    pose_ok: jnp.ndarray     # [P] relative pose is trustworthy (False for
                             #     rotation-only edges kept for track building)
    E: jnp.ndarray           # [P, 3, 3] essential matrices


def _kmat(intr: jnp.ndarray) -> jnp.ndarray:
    K = jnp.eye(3, dtype=intr.dtype)
    return K.at[0, 0].set(intr[0]).at[1, 1].set(intr[1]).at[0, 2].set(intr[2]).at[1, 2].set(intr[3])


def _kinv(intr: jnp.ndarray) -> jnp.ndarray:
    K = jnp.eye(3, dtype=intr.dtype)
    return (
        K.at[0, 0].set(1.0 / intr[0]).at[1, 1].set(1.0 / intr[1])
        .at[0, 2].set(-intr[2] / intr[0]).at[1, 2].set(-intr[3] / intr[1])
    )


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
    thr_px = cfg.error_threshold_px ** 2

    k_e, k_h = jax.random.split(key)
    if cfg.model == "fundamental":
        # Uncalibrated path (SURVEY.md §1.4): 8-point F-RANSAC on raw pixels,
        # then upgrade to E through the prior intrinsics and re-collect the
        # consensus set on normalized coordinates.
        res_f = ransac(
            k_e, uv1, uv2, mask,
            solver=solvers.fundamental_8pt,
            error_fn=solvers.sampson_error,
            sample_size=8,
            num_hypotheses=cfg.num_hypotheses,
            threshold_sq=thr_px,
            min_inliers=cfg.min_inliers,
        )
        F, _ = irls_refit(
            res_f.model, uv1, uv2, mask,
            fit_fn=solvers.fundamental_8pt,
            error_fn=solvers.sampson_error,
            threshold_sq=thr_px,
            iters=cfg.refine_iters,
        )
        E0 = solvers.project_essential(_kmat(intr2).T @ F @ _kmat(intr1))
        E, inl = irls_refit(
            E0, x1, x2, mask,
            fit_fn=lambda a, b, w: solvers.essential_minimal(a, b, w),
            error_fn=solvers.sampson_error,
            threshold_sq=thr_norm,
            iters=2,
        )
    else:
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

    # Homography support on pixel coords (degeneracy check + planar pose).
    res_h = ransac(
        k_h, uv1, uv2, mask,
        solver=solvers.homography_4pt,
        error_fn=solvers.homography_error,
        sample_size=4,
        num_hypotheses=cfg.num_hypotheses // 2,
        threshold_sq=thr_px,
        min_inliers=cfg.min_inliers,
    )
    # LS refit on the H consensus set: a minimal 4-point H carries enough
    # noise to fake parallax, which both degrades the planar pose and defeats
    # the pure-rotation singular-value gate below.
    H, inl_h = irls_refit(
        res_h.model, uv1, uv2, mask,
        fit_fn=solvers.homography_4pt,
        error_fn=solvers.homography_error,
        threshold_sq=thr_px,
        iters=2,
    )
    n_h = jnp.sum(inl_h)

    R, t, n_cheiral = solvers.decompose_essential(E, x1, x2, inl)
    ok_e = (n_e >= cfg.min_inliers) & (n_cheiral >= jnp.maximum(n_e // 2, 1))

    # Degeneracy gate (RansacConfig.degenerate_h_ratio): when H explains the
    # pair as well as E, the epipolar geometry is ambiguous (planar scene or
    # rotation-only motion). Recover the pose from the homography
    # decomposition; reject the edge if that fails (pure rotation).
    h_ratio = n_h.astype(jnp.float32) / jnp.maximum(n_e.astype(jnp.float32), 1.0)
    planar = h_ratio >= cfg.degenerate_h_ratio
    Hn = _kinv(intr2) @ H @ _kmat(intr1)
    # Vote over ALL matches, not only H-inliers: off-plane points are the
    # tiebreaker between the two valid planar interpretations (for exactly
    # coplanar scenes the twofold ambiguity is inherent to two views).
    R_h, t_h, _n_plane, h_votes, h_valid = solvers.decompose_homography(
        Hn, x1, x2, mask
    )
    ok_h_pose = h_valid & (h_votes >= jnp.maximum(n_h // 2, 1))
    ok_h = (n_h >= cfg.min_inliers) & ok_h_pose

    # Rotation-only / zero-parallax pairs: H support is overwhelming but no
    # relative pose is recoverable (the plane-decomposition gate fails). The
    # CORRESPONDENCES are still real, and on dense video-like capture these
    # edges are what chains consecutive frames into tracks — dropping them
    # fragments the match graph and strands registration (the 2k-image
    # ladder failure). Keep the edge for track building / PnP with the
    # rotation taken from the homography's polar factor (H ~ K R K^-1 for a
    # pure rotation) and pose_ok=False so bootstrap ranking and guided
    # matching skip it.
    rot_only = planar & (n_h >= cfg.min_inliers) & ~ok_h_pose
    # Sign-normalize Hn before the polar factor: H is only defined up to
    # scale INCLUDING sign, and for pans past 90 deg the det-corrected polar
    # factor of -Hn lands ~180 deg off. The sign of x2_h . (Hn x1_h) over
    # the matches recovers the projective-scale sign (positive for a true
    # point map in front of both cameras).
    x1_h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2_h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    h_dot = jnp.sum(mask * jnp.sum(x2_h * (x1_h @ Hn.T), axis=-1))
    Hn_signed = Hn * jnp.where(h_dot < 0, -1.0, 1.0)
    U_r, _, Vt_r = jnp.linalg.svd(Hn_signed)
    det_r = jnp.linalg.det(U_r @ Vt_r)
    R_rot = U_r @ jnp.diag(jnp.stack([jnp.ones_like(det_r), jnp.ones_like(det_r), det_r])) @ Vt_r

    use_h = planar & ok_h
    R = jnp.where(use_h, R_h, jnp.where(rot_only, R_rot, R))
    t = jnp.where(use_h, t_h, t)
    inl = jnp.where(use_h | rot_only, inl_h, inl)
    n_out = jnp.where(use_h | rot_only, n_h, n_e)
    ok = jnp.where(planar, ok_h | rot_only, ok_e)
    pose_ok = ok & ~rot_only
    rvec = matrix_to_aa(R)
    # Downstream guided matching consumes E; keep it consistent with the
    # pose actually reported.
    E = jnp.where(use_h, solvers.essential_from_rt(jnp.concatenate([rvec, t])), E)
    return rvec, t, inl, n_out, n_h, ok, pose_ok, E


@partial(jax.jit, static_argnames=("cfg",))
def verify_block(
    keys: jax.Array,              # [P] PRNG keys (deterministic per pair)
    uv1: jnp.ndarray, uv2: jnp.ndarray, mask: jnp.ndarray,   # [P, M, 2] x2, [P, M]
    intr1: jnp.ndarray, intr2: jnp.ndarray,                  # [P, 6]
    cfg: RansacConfig,
) -> TwoViewGeometry:
    rvec, t, inl, n_e, n_h, ok, pose_ok, E = jax.vmap(
        lambda k, a, b, m, i1, i2: verify_pair(k, a, b, m, i1, i2, cfg)
    )(keys, uv1, uv2, mask, intr1, intr2)
    return TwoViewGeometry(
        rvec=rvec, tvec=t, inliers=inl, num_inliers=n_e, num_h_inliers=n_h,
        ok=ok, pose_ok=pose_ok, E=E
    )
