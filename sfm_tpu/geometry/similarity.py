"""Similarity-transform (sim3) estimation — Umeyama alignment.

Used by the divide-and-conquer merge (SURVEY.md §2.7) to align per-cluster
reconstructions via shared cameras/points, and by tests to compare
reconstructions to ground truth up to gauge freedom.
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray | None = None):
    """Least-squares similarity transform mapping src -> dst.

    src, dst: [N, 3]; w: optional [N] weights. Returns (s, R, t) with
    dst ~= s * R @ src + t.
    """
    if w is None:
        w = jnp.ones(src.shape[0], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum  # [3, 3]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.sum(w[:, None] * sc * sc) / wsum
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


def apply_sim3(s, R, t, x: jnp.ndarray) -> jnp.ndarray:
    return s * x @ R.T + t


def umeyama_np(src, dst, w=None):
    """Host-numpy umeyama (same math as `umeyama`).

    The cluster-merge path (pipeline/merge.py) calls this O(n_clusters^2)
    times on small host arrays of pair-specific length; routing those
    through the device would cost a 20-40s remote compile per fresh shape
    on the Axon backend (NOTES.md gotcha 3) or an eager round-trip per op,
    so the merge solves stay on host."""
    import numpy as np

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    w = np.ones(len(src)) if w is None else np.asarray(w, np.float64)
    wsum = max(float(w.sum()), 1e-12)
    mu_s = (src * w[:, None]).sum(0) / wsum
    mu_d = (dst * w[:, None]).sum(0) / wsum
    sc, dc = src - mu_s, dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = float((w[:, None] * sc * sc).sum()) / wsum
    s = float((D * np.diag(S)).sum()) / max(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t
