"""Absolute pose (PnP) — next-view registration (SURVEY.md §2.5).

Reference-class realization: C++ P3P/EPnP inside adaptive RANSAC. TPU-native
re-design: batched EPnP (the N=1 nullspace case, which is the linear,
vmappable one) followed by a short Gauss-Newton polish on (rvec, t) over the
sample — the same init+manifold-refine recipe as the essential solver. P3P's
quartic root-finding is branch-heavy and gains nothing on the MXU.

All functions operate in NORMALIZED camera coordinates (intrinsics applied
by the caller) so one compiled kernel serves all cameras.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.rotations import so3_exp, matrix_to_aa
from sfm_tpu.geometry.similarity import umeyama


def _project_norm(X: jnp.ndarray, rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World -> normalized image coords."""
    xc = jnp.einsum("ij,nj->ni", so3_exp(rvec), X) + t
    z = jnp.where(jnp.abs(xc[:, 2:3]) < 1e-8, 1e-8, xc[:, 2:3])
    return xc[:, :2] / z


def pnp_reprojection_error(pose: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Squared reprojection error in normalized coords. pose = [rvec, t] (6,).

    Points behind the camera get a large error (they must not count as
    inliers even if they reproject close)."""
    rvec, t = pose[:3], pose[3:]
    xc = jnp.einsum("ij,nj->ni", so3_exp(rvec), X) + t
    z = xc[:, 2]
    proj = xc[:, :2] / jnp.where(jnp.abs(z[:, None]) < 1e-8, 1e-8, z[:, None])
    err = jnp.sum((proj - uv) ** 2, axis=-1)
    return jnp.where(z > 1e-6, err, 1e6)


def epnp(X: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray | None = None, gn_iters: int = 5) -> jnp.ndarray:
    """EPnP(+GN) absolute pose from [k>=6, 3] world points and [k, 2]
    normalized image coords. Returns pose 6-vector [rvec, t]. vmap-safe.
    """
    k = X.shape[0]
    if w is None:
        w = jnp.ones(k, dtype=X.dtype)
    wn = w / jnp.maximum(jnp.sum(w), 1e-8)

    # Control points: weighted centroid + principal axes scaled to data spread.
    c0 = jnp.sum(X * wn[:, None], axis=0)
    Xc = X - c0
    cov = (Xc * wn[:, None]).T @ Xc
    evals, evecs = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-8))
    ctrl = c0[None, :] + jnp.concatenate(
        [jnp.zeros((1, 3), X.dtype), (evecs * scale[None, :]).T], axis=0
    )  # [4, 3]: c0, c0+s1*v1, ...

    # Barycentric coordinates: X = alphas @ ctrl with sum(alphas) = 1.
    basis = (ctrl[1:] - ctrl[0]).T  # [3, 3]
    basis_inv = jnp.linalg.inv(basis + 1e-9 * jnp.eye(3))
    a123 = Xc @ basis_inv.T + (-(c0 - ctrl[0]) @ basis_inv.T)  # [k, 3]
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, -1, keepdims=True), a123], axis=-1)  # [k, 4]

    # M matrix: each point gives 2 rows over the 12 unknowns (4 ctrl pts in cam frame).
    u, v = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros_like(alphas)
    rows_u = jnp.concatenate([alphas, zeros, -u[:, None] * alphas], axis=-1)  # [k, 12]
    rows_v = jnp.concatenate([zeros, alphas, -v[:, None] * alphas], axis=-1)
    M = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)  # [2k, 12]
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    x = V[:, 0]  # [12]: (cx[4], cy[4], cz[4])
    cc = jnp.stack([x[0:4], x[4:8], x[8:12]], axis=-1)  # [4, 3] cam-frame ctrl pts (up to scale/sign)

    # Resolve scale from inter-control-point distances, sign from depth.
    dw = jnp.linalg.norm(ctrl[1:] - ctrl[0], axis=-1)
    dc = jnp.linalg.norm(cc[1:] - cc[0], axis=-1)
    s = jnp.sum(dw * dc) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    cc = cc * s
    pc = alphas @ cc  # [k, 3] points in camera frame
    sign = jnp.where(jnp.sum(jnp.sign(pc[:, 2]) * w) < 0, -1.0, 1.0)
    pc = pc * sign

    # Rigid alignment world -> camera (Umeyama without scale).
    _, R, _ = umeyama(X * jnp.ones_like(X), pc, w)  # rotation from weighted Procrustes
    t = jnp.sum((pc - X @ R.T) * wn[:, None], axis=0)
    pose = jnp.concatenate([matrix_to_aa(R), t])

    # Gauss-Newton polish on the (weighted) sample reprojection.
    def res(p):
        rvec, tt = p[:3], p[3:]
        xc = jnp.einsum("ij,nj->ni", so3_exp(rvec), X) + tt
        z = jnp.where(jnp.abs(xc[:, 2:3]) < 1e-6, 1e-6, xc[:, 2:3])
        r = (xc[:, :2] / z - uv) * w[:, None]
        return r.reshape(-1)

    for _ in range(gn_iters):
        J = jax.jacfwd(res)(pose)
        r = res(pose)
        pose = pose - jnp.linalg.solve(J.T @ J + 1e-8 * jnp.eye(6), J.T @ r)
    return pose


import functools


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "sample_size", "refine_iters")
)
def pnp_ransac(
    key: jax.Array,
    X: jnp.ndarray,        # [M, 3] world points
    uv: jnp.ndarray,       # [M, 2] normalized image coords
    mask: jnp.ndarray,     # [M]
    num_hypotheses: int,
    threshold_sq: float,   # traced (per-image focal) — no recompile per image
    min_inliers: int,      # traced
    sample_size: int = 8,
    refine_iters: int = 3,
):
    """Batched RANSAC-EPnP + IRLS refinement. Returns (pose [6], inliers, n, ok).

    Jitted as one program: the incremental engine calls this once per
    registration, and eager dispatch would cost hundreds of host->device
    round-trips per call."""
    from sfm_tpu.ops.ransac import ransac, irls_refit

    res = ransac(
        key, X, uv, mask,
        solver=lambda a, b: epnp(a, b),
        error_fn=pnp_reprojection_error,
        sample_size=sample_size,
        num_hypotheses=num_hypotheses,
        threshold_sq=threshold_sq,
        min_inliers=min_inliers,
    )
    pose, inl = irls_refit(
        res.model, X, uv, mask,
        fit_fn=lambda a, b, w: epnp(a, b, w),
        error_fn=pnp_reprojection_error,
        threshold_sq=threshold_sq,
        iters=refine_iters,
    )
    n = jnp.sum(inl)
    return pose, inl, n, n >= min_inliers
