"""Batched two-view relative-pose refinement by reprojection (SURVEY.md §2.4).

RANSAC hands every verified edge an (R, t) from the essential/homography
solve whose inner objective is epipolar (algebraic) error. On short-baseline
edges the epipolar surface is shallow along the rotation/translation trade
direction, and its minimizer is measurably offset from the reprojection
optimum: on the 512-orbit ladder graph the epipolar-GN edges carry 0.33 deg
median rotation error at span 1-2 while this refinement lands 0.18 deg on
identical correspondences (benchmarks ladder cache, round-4 bias study).
Rotation averaging integrates per-edge error around the whole graph, so
halving edge noise halves the pose-graph drift floor — this op is the
production pre-averaging pass of the global engine.

Method: per-edge joint two-view bundle adjustment, batched over edges. Each
iteration linearizes the symmetric reprojection cost over (omega, dt, {X_k}),
Schur-eliminates the per-point 3x3 blocks (the same elimination the full BA
uses, ba/core.py, shrunk to one edge), solves the damped 6x6 pose system,
back-substitutes the point updates, and restores the ||t|| = 1 gauge by
scaling t AND the points together (projective scale invariance keeps the
residuals bit-identical under that joint rescale). Joint GN converges
quadratically where resection/intersection alternation crawls — an earlier
alternating version left 1.0 deg of a 1.5 deg perturbation after 10 rounds
on noise-free correspondences; this one lands at milli-degrees in the same
iteration budget.

TPU mapping: everything is [E, K, ...] einsum batches (MXU-friendly, no
data-dependent shapes); K is a fixed inlier capacity with a mask, filled by
strided subsampling on the host. fp32 throughout — normalized camera coords
keep conditioning mild, and the 3x3/6x6 solves are Cholesky-scale tiny.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.geometry.rotations import so3_exp


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros(v.shape[:-1], v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def _proj_jac(P: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective projection p = P[:2]/P[2] and its Jacobian [..., 2, 3]."""
    z = jnp.where(jnp.abs(P[..., 2]) < 1e-6,
                  jnp.where(P[..., 2] < 0, -1e-6, 1e-6), P[..., 2])
    p = P[..., :2] / z[..., None]
    zero = jnp.zeros_like(z)
    inv = 1.0 / z
    J = jnp.stack([
        jnp.stack([inv, zero, -P[..., 0] * inv * inv], -1),
        jnp.stack([zero, inv, -P[..., 1] * inv * inv], -1),
    ], -2)
    return p, J


@partial(jax.jit, static_argnames=("iters",))
def refine_relative_poses(
    x1: jnp.ndarray,      # [E, K, 2] normalized camera coords, image i
    x2: jnp.ndarray,      # [E, K, 2] normalized camera coords, image j
    mask: jnp.ndarray,    # [E, K] bool — live correspondence slots
    rvec0: jnp.ndarray,   # [E, 3] initial relative rotation (R_ij = R_j R_i^T)
    tvec0: jnp.ndarray,   # [E, 3] initial relative translation (any scale)
    huber: float = 0.008,  # Huber scale on image-2 residuals, normalized units
    iters: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (rvec [E, 3], unit tvec [E, 3], rms [E] in normalized units).

    rms is the masked image-2 reprojection RMS at the refined pose —
    callers use it to weight or reject edges. Edges whose mask has < 5 live
    slots are returned unchanged (their 6x6 systems would be rank-starved).
    """
    E, K = mask.shape
    f32 = jnp.float32
    x1 = x1.astype(f32)
    x2 = x2.astype(f32)
    m = mask.astype(f32)
    h1 = jnp.concatenate([x1, jnp.ones((E, K, 1), f32)], -1)
    v1 = h1 / jnp.linalg.norm(h1, axis=-1, keepdims=True)
    h2 = jnp.concatenate([x2, jnp.ones((E, K, 1), f32)], -1)

    R0 = so3_exp(rvec0.astype(f32))
    t0 = tvec0.astype(f32)
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-12)
    eye3 = jnp.eye(3, dtype=f32)

    def triangulate(R, t):
        """Midpoint of ray1 (origin, v1) and ray2 (c2, v2) in camera-1 frame."""
        c2 = -jnp.einsum("eji,ej->ei", R, t)
        v2 = jnp.einsum("eji,ekj->eki", R, h2)
        v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
        a = jnp.sum(v1 * v1, -1)
        b = jnp.sum(v1 * v2, -1)
        c = jnp.sum(v2 * v2, -1)
        e1 = jnp.einsum("eki,ei->ek", v1, c2)
        e2 = jnp.einsum("eki,ei->ek", v2, c2)
        den = a * c - b * b
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        d1 = (e1 * c - b * e2) / den
        d2 = (b * e1 - a * e2) / den
        return 0.5 * (v1 * d1[..., None] + c2[:, None, :] + v2 * d2[..., None])

    eye6 = jnp.eye(6, dtype=f32)

    def body(_, carry):
        """One joint GN step with Schur elimination of the points."""
        R, t, X = carry
        p1, J1n = _proj_jac(X)
        r1 = x1 - p1
        Y = jnp.einsum("eij,ekj->eki", R, X) + t[:, None, :]
        p2, J2n = _proj_jac(Y)
        r2 = x2 - p2
        # Huber IRLS weight per residual pair + cheirality/mask gates.
        w1 = jnp.where(jnp.linalg.norm(r1, axis=-1) <= huber, 1.0,
                       huber / jnp.maximum(jnp.linalg.norm(r1, axis=-1), 1e-12))
        w2 = jnp.where(jnp.linalg.norm(r2, axis=-1) <= huber, 1.0,
                       huber / jnp.maximum(jnp.linalg.norm(r2, axis=-1), 1e-12))
        gate = m * (X[..., 2] > 1e-4) * (Y[..., 2] > 1e-4)
        w1 = w1 * gate
        w2 = w2 * gate

        # Jacobians of the PREDICTIONS (r_new = r - J d).
        A1 = J1n                                       # dproj1/dX   [E,K,2,3]
        A2 = jnp.einsum("ekab,ebc->ekac", J2n, R)      # dproj2/dX
        # Left-perturbation R <- exp(omega) R: dY = [omega]x (Y - t).
        Bw = -jnp.einsum("ekab,ekbc->ekac", J2n, _skew(Y - t[:, None, :]))
        B = jnp.concatenate([Bw, J2n], -1)             # dproj2/d(w,t) [E,K,2,6]

        Hpp = (w1[..., None, None] * jnp.einsum("ekai,ekaj->ekij", A1, A1)
               + w2[..., None, None] * jnp.einsum("ekai,ekaj->ekij", A2, A2))
        Hpc = w2[..., None, None] * jnp.einsum("ekai,ekaj->ekij", A2, B)
        Hcc = jnp.einsum("ek,ekai,ekaj->eij", w2, B, B)
        gp = (w1[..., None] * jnp.einsum("ekai,eka->eki", A1, r1)
              + w2[..., None] * jnp.einsum("ekai,eka->eki", A2, r2))
        gc = jnp.einsum("ek,ekai,eka->ei", w2, B, r2)

        trp = jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None]
        Hpp = Hpp + (1e-4 * trp + 1e-10) * eye3
        Hpp = jnp.where(gate[..., None, None] > 0, Hpp, eye3)
        gp = jnp.where(gate[..., None] > 0, gp, 0.0)
        Hpp_inv = jnp.linalg.inv(Hpp)

        S = Hcc - jnp.einsum("ekji,ekjl,ekln->ein", Hpc, Hpp_inv, Hpc)
        rhs = gc - jnp.einsum("ekji,ekjl,ekl->ei", Hpc, Hpp_inv, gp)
        trc = jnp.trace(S, axis1=-2, axis2=-1)[..., None, None]
        S = S + (1e-6 * trc + 1e-12) * eye6
        d = jnp.linalg.solve(S, rhs[..., None])[..., 0]
        dw, dt = d[:, :3], d[:, 3:]
        nw = jnp.linalg.norm(dw, axis=-1, keepdims=True)
        clip = jnp.minimum(1.0, jnp.radians(10.0) / jnp.maximum(nw, 1e-12))
        dw = dw * clip
        dt = dt * clip
        dX = jnp.einsum("ekij,ekj->eki",
                        Hpp_inv, gp - jnp.einsum("ekij,ej->eki", Hpc, d))
        R_new = so3_exp(dw) @ R
        t_new = t + dt
        X_new = X + dX
        # Gauge: scaling t and X together leaves every residual unchanged.
        s = jnp.maximum(jnp.linalg.norm(t_new, axis=-1, keepdims=True), 1e-9)
        return R_new, t_new / s, X_new / s[:, None, :]

    X0 = triangulate(R0, t0)
    R, t, _ = jax.lax.fori_loop(0, iters, body, (R0, t0, X0))

    # Rank guard: < 5 live correspondences cannot support a 6-dof step.
    enough = jnp.sum(mask, -1) >= 5
    R = jnp.where(enough[:, None, None], R, R0)
    t = jnp.where(enough[:, None], t, t0)

    X = triangulate(R, t)
    Y = jnp.einsum("eij,ekj->eki", R, X) + t[:, None, :]
    p2, _ = _proj_jac(Y)
    r2 = jnp.sum((x2 - p2) ** 2, -1) * m
    rms = jnp.sqrt(jnp.sum(r2, -1) / jnp.maximum(jnp.sum(m, -1), 1.0))

    # Rotation matrix -> angle-axis without leaving the device.
    tr_R = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    ang = jnp.arccos(tr_R)
    ax = jnp.stack([R[:, 2, 1] - R[:, 1, 2],
                    R[:, 0, 2] - R[:, 2, 0],
                    R[:, 1, 0] - R[:, 0, 1]], -1)
    sin_a = jnp.linalg.norm(ax, axis=-1) / 2.0
    scale = jnp.where(sin_a < 1e-7, 0.5, ang / jnp.maximum(2.0 * sin_a, 1e-12))
    rvec = ax * scale[:, None]
    return rvec, t, rms


def gather_edge_correspondences(
    graph, feats_xy: np.ndarray, intrinsics: np.ndarray,
    edge_ids: np.ndarray, capacity: int = 128,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side packing: per-edge inlier keypoints -> fixed-capacity
    normalized-coordinate batches (strided subsample past `capacity`).

    Returns (x1 [E, K, 2], x2 [E, K, 2], mask [E, K]) as float32/bool.
    Applies the iterative 2-term undistortion when k1/k2 are present so the
    device op works in ideal normalized coordinates.
    """
    E = len(edge_ids)
    K = capacity
    x1 = np.zeros((E, K, 2), np.float32)
    x2 = np.zeros((E, K, 2), np.float32)
    mask = np.zeros((E, K), bool)

    def _norm(img: int, kp: np.ndarray) -> np.ndarray:
        intr = intrinsics[img]
        xy = (feats_xy[img, kp] - intr[2:4]) / intr[0:2]
        k1, k2 = float(intr[4]), float(intr[5])
        if k1 or k2:
            x = xy.copy()
            for _ in range(4):
                r2 = np.sum(x * x, axis=-1)
                x = xy / (1.0 + k1 * r2 + k2 * r2 * r2)[..., None]
            xy = x
        return xy

    for row, e in enumerate(np.asarray(edge_ids)):
        inl = np.where(graph.inlier[e])[0]
        if len(inl) > K:
            inl = inl[np.linspace(0, len(inl) - 1, K).astype(np.int64)]
        i, j = graph.pairs[e]
        x1[row, :len(inl)] = _norm(int(i), graph.idx_i[e, inl])
        x2[row, :len(inl)] = _norm(int(j), graph.idx_j[e, inl])
        mask[row, :len(inl)] = True
    return x1, x2, mask
