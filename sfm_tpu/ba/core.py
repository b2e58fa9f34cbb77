"""Schur-complement Levenberg-Marquardt core (SURVEY.md §2.6, §3.5).

Design (all shapes static, everything inside one jit):

  residual r_o(c, p) = project(point_p, cam_c) - uv_o          (vmapped)
  J_o = [Jc_o (2x6) | Jp_o (2x3)]                              (vmapped jacfwd)
  robustified by IRLS sqrt-weights (Huber/Cauchy, losses.py)

  Normal equations in segment-sum form:
    Hcc = segsum_c Jc^T Jc   [C, 6, 6]
    Hpp = segsum_p Jp^T Jp   [P, 3, 3]
    W_o = Jc_o^T Jp_o        [O, 6, 3]   (block-sparse coupling, PER OBS —
                                          never materialized as a matrix)
    bc  = -segsum_c Jc^T r;  bp = -segsum_p Jp^T r

  Reduced camera system S dc = rhs, S = Hcc - W Hpp^-1 W^T, applied
  IMPLICITLY per CG step:
    u_o = W_o^T v[cam_o]; g_p = segsum_p u_o; h_p = Hpp_p^-1 g_p
    (S v)_c = Hcc_c v_c - segsum_c W_o h[point_o]
  preconditioned by the Schur-Jacobi block diagonal
    M_c = Hcc_c - segsum_c W_o Hpp_{p(o)}^-1 W_o^T  (6x6 blocks, exact)

  Back-substitution: dp = Hpp^-1 (bp - segsum_p W_o^T dc[cam_o])

  LM outer loop: lax.while_loop, multiplicative damping on the block
  diagonals, accept/reject on true cost decrease.

The cross-chip variant (SURVEY.md §2.7) shards observations by camera and
psum's the CG dot products and per-point segments — see sfm_tpu/dist/.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import BAConfig
from sfm_tpu.geometry.losses import robust_weight, robust_cost
from sfm_tpu.geometry.projection import project
from sfm_tpu.ba.problem import BAProblem, CAM_DIM, PT_DIM


def _kernels_disabled() -> frozenset:
    """Debug/bisection hook: SFM_TPU_BA_DISABLE_KERNELS is a comma list of
    {ne, ne_big, whw, whw_big, mv, mv_big, cost} — each named kernel gate then
    evaluates False and the XLA fallback path runs instead. Used to isolate
    TPU-worker faults to a specific fused kernel (benchmarks/polish_repro.py).

    TRACE-TIME ONLY: the gates are baked into the jitted LM program and the
    jit cache does not key on this env var — set it before the process's
    first solve (one subprocess per configuration, as polish_repro does);
    toggling it mid-process silently reuses the first compilation."""
    import os

    return frozenset(
        s for s in os.environ.get("SFM_TPU_BA_DISABLE_KERNELS", "").split(",") if s
    )


def _maybe_psum(x, axis_name):
    """Cross-shard reduction for the sharded-BA path (SURVEY.md §2.7):
    observations are sharded by camera across the mesh, so every
    segment-sum over observations needs a psum to complete; axis_name=None
    is the single-chip path with zero overhead."""
    return jax.lax.psum(x, axis_name) if axis_name else x


def _cam_reduce(values: jnp.ndarray, obs_cam: jnp.ndarray, C: int, axis_name) -> jnp.ndarray:
    """Observation->camera segment reduction for values [O, ...].

    Cameras are the UNSORTED observation axis, so XLA lowers this to a
    serialized scatter-add; on the single-chip TPU path it is instead an
    MXU one-hot matmul (kernels/schur_spmv.cam_segment_sum). Trailing dims
    are flattened through the kernel. The sharded path keeps the XLA scatter
    (per-shard) — callers psum afterwards."""
    shape = values.shape
    if axis_name is None and jax.default_backend() == "tpu":
        from sfm_tpu.kernels.schur_spmv import _MAX_CAMS, cam_segment_sum

        if C <= _MAX_CAMS:
            flat = values.reshape(shape[0], -1)
            out = cam_segment_sum(flat, obs_cam, C)
            return out.reshape((C,) + shape[1:])
    return jax.ops.segment_sum(values, obs_cam, C)


def _residual_one(cam: jnp.ndarray, point: jnp.ndarray, intr: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """cam is [6] (pose only) or [8] (pose + focal log-scale + k1 delta);
    the width is static at trace time (config-switched, SURVEY.md §2.6)."""
    if cam.shape[-1] >= 8:
        s = jnp.exp(cam[6])
        intr = intr.at[0].mul(s).at[1].mul(s).at[4].add(cam[7])
    return project(point, cam[:3], cam[3:6], intr) - uv


def _residual_jac_analytic(cam, pt, intr, uv):
    """Hand-derived residual + Jacobian blocks for one observation.

    The BA profile shows the normal-equation build (dominated by the
    9/11-tangent jacfwd through the whole projection) is ~70% of an LM
    iteration. Here the projection/distortion chain is differentiated in
    closed form; only d(R X)/d(rvec) uses a 3-tangent jacfwd through
    Rodrigues (cheap, and avoids hand-coding the SO(3) right Jacobian).
    Validated against the full jacfwd in tests/unit/test_ba.py.

    Returns (r [2], Jc [2, D], Jp [2, 3]).
    """
    from sfm_tpu.geometry.rotations import so3_exp

    D = cam.shape[-1]
    rvec, t = cam[:3], cam[3:6]
    fx, fy, cx, cy, k1, k2 = (intr[i] for i in range(6))
    if D >= 8:
        sf = jnp.exp(cam[6])
        fx = fx * sf
        fy = fy * sf
        k1 = k1 + cam[7]

    R = so3_exp(rvec)
    xc = R @ pt + t
    z = xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    xy = xc[:2] / z_safe
    r2 = xy @ xy
    s = 1.0 + r2 * (k1 + r2 * k2)
    xy_d = xy * s
    f = jnp.stack([fx, fy])
    uv_hat = xy_d * f + jnp.stack([cx, cy])
    r = uv_hat - uv

    # d(uv)/d(x_cam) = diag(f) @ [s I + xy (ds/dxy)^T] @ d(xy)/d(x_cam).
    ds_dxy = (k1 + 2.0 * k2 * r2) * 2.0 * xy                       # [2]
    D_dist = s * jnp.eye(2) + jnp.outer(xy, ds_dxy)                # [2, 2]
    inv_z = 1.0 / z_safe
    A_proj = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    ) * inv_z - jnp.outer(xy * inv_z, jnp.array([0.0, 0.0, 1.0]))  # [2, 3]
    M = f[:, None] * (D_dist @ A_proj)                             # [2, 3]

    Jp = M @ R                                                      # d r / d point
    Jt = M                                                          # d r / d t
    # d(R X)/d(rvec): 3-tangent jacfwd through Rodrigues only.
    dRX = jax.jacfwd(lambda w: so3_exp(w) @ pt)(rvec)               # [3, 3]
    Jr = M @ dRX                                                    # d r / d rvec
    blocks = [Jr, Jt]
    if D >= 8:
        # d r / d log-focal-scale: uv - c scales with f.
        blocks.append((xy_d * f)[:, None])
        # d r / d k1-delta: uv = f * xy * s, ds/dk1 = r2.
        blocks.append((f * xy * r2)[:, None])
    Jc = jnp.concatenate(blocks, axis=1)                            # [2, D]
    return r, Jc, Jp


def residuals_and_jacobians(prob: BAProblem, cam_params: jnp.ndarray, points: jnp.ndarray, cfg: BAConfig):
    """Per-observation robustified residuals and Jacobian blocks.

    Returns (r [O,2], Jc [O,2,6], Jp [O,2,3], sqrt_w [O]).
    """
    cams_o = cam_params[prob.obs_cam]
    pts_o = points[prob.obs_point]
    intr_o = prob.intrinsics[prob.obs_cam]

    r, Jc, Jp = jax.vmap(_residual_jac_analytic)(cams_o, pts_o, intr_o, prob.obs_uv)

    s = jnp.sum(r * r, axis=-1)
    w = robust_weight(s, cfg.robust_loss, cfg.robust_scale_px) * prob.obs_w
    sqrt_w = jnp.sqrt(jnp.maximum(w, 0.0))
    return r * sqrt_w[:, None], Jc * sqrt_w[:, None, None], Jp * sqrt_w[:, None, None], sqrt_w


def _residuals_flat(cams_o, pts_o, intr_o, uv):
    """Per-observation residuals in SCALAR-COLUMN form — no [O, 3, 3]
    rotation tensor is ever materialized. The vmapped `_residual_one` builds
    per-obs Rodrigues matrices whose trailing 3x3 dims XLA lays out as
    (4, 128) tiles: a 57x padding expansion that OOM'd HBM at O = 4.2M
    (the C=4096 BA sweep). Same math as geometry.project / the fused NE
    kernel (Taylor-guarded Rodrigues, radial distortion, guarded divide).

    cams_o [O, D>=6], pts_o [O, 3], intr_o [O, 6], uv [O, 2] -> r [O, 2].
    """
    wx, wy, wz = cams_o[:, 0], cams_o[:, 1], cams_o[:, 2]
    tx, ty, tz = cams_o[:, 3], cams_o[:, 4], cams_o[:, 5]
    fx, fy = intr_o[:, 0], intr_o[:, 1]
    cx, cy = intr_o[:, 2], intr_o[:, 3]
    k1, k2 = intr_o[:, 4], intr_o[:, 5]
    if cams_o.shape[-1] >= 8:
        sf = jnp.exp(cams_o[:, 6])
        fx = fx * sf
        fy = fy * sf
        k1 = k1 + cams_o[:, 7]
    px, py, pz = pts_o[:, 0], pts_o[:, 1], pts_o[:, 2]

    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-8
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rot_entries(wx, wy, wz, A, B)
    xc0 = r00 * px + r01 * py + r02 * pz + tx
    xc1 = r10 * px + r11 * py + r12 * pz + ty
    xc2 = r20 * px + r21 * py + r22 * pz + tz
    z = jnp.where(jnp.abs(xc2) < 1e-8, jnp.where(xc2 < 0, -1e-8, 1e-8), xc2)
    x = xc0 / z
    y = xc1 / z
    r2 = x * x + y * y
    s = 1.0 + r2 * (k1 + r2 * k2)
    return jnp.stack([fx * (x * s) + cx - uv[:, 0], fy * (y * s) + cy - uv[:, 1]], axis=-1)


def _obs_depths(prob: BAProblem, cam_params: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame depth z per observation [O] (third row of the Rodrigues
    transform only — scalar columns, no [O, 3, 3] tensor)."""
    cams_o = cam_params[prob.obs_cam]
    pts_o = points[prob.obs_point]
    wx, wy, wz = cams_o[:, 0], cams_o[:, 1], cams_o[:, 2]
    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-8
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2)
    r20 = -a * wy + b * wx * wz
    r21 = a * wx + b * wy * wz
    r22 = 1.0 + b * (wz * wz - t2)
    return r20 * pts_o[:, 0] + r21 * pts_o[:, 1] + r22 * pts_o[:, 2] + cams_o[:, 5]


def _rot_entries(wx, wy, wz, a, b):
    """Rodrigues I + a [w]x + b [w]x^2 as nine [O] scalar columns (the XLA
    twin of kernels/schur_spmv._rot_cols)."""
    t2 = wx * wx + wy * wy + wz * wz
    return (
        1.0 + b * (wx * wx - t2), -a * wz + b * wx * wy, a * wy + b * wx * wz,
        a * wz + b * wx * wy, 1.0 + b * (wy * wy - t2), -a * wx + b * wy * wz,
        -a * wy + b * wx * wz, a * wx + b * wy * wz, 1.0 + b * (wz * wz - t2),
    )


def _use_cost_kernel(prob: BAProblem, cam_params, axis_name) -> bool:
    """Static gate for the fused cost kernel (schur_spmv.fused_cost_sums):
    the XLA path is [O, 8] row-gather bound (VERDICT r4 next #4 — 38 ms at
    O=1M for ~3 ms of math) and it runs 1-2x per LM iteration."""
    O = prob.obs_w.shape[0]
    return (
        axis_name is None
        and "cost" not in _kernels_disabled()
        and cam_params.shape[-1] == CAM_DIM
        and (O % 2048 == 0 or (O < 2048 and O % 128 == 0))
        and jax.default_backend() == "tpu"
    )


def compute_cost(prob: BAProblem, cam_params: jnp.ndarray, points: jnp.ndarray, cfg: BAConfig, axis_name=None,
                 z_floor: jnp.ndarray | None = None,
                 static_t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Robustified mean cost over valid observations.

    z_floor: optional near-plane depth floor — observations whose
    camera-frame depth at THESE parameters is at/below it are excluded,
    matching the NE assembly's gate (see _SolveInvariants.z_floor) so the
    LM accept test compares the same objective the step minimized.
    static_t: optional [8, O] fused-kernel static rows (uv/w), reused from
    _SolveInvariants inside the LM loop.
    """
    if _use_cost_kernel(prob, cam_params, axis_name):
        from sfm_tpu.kernels import schur_spmv

        C = prob.num_cameras
        O = prob.obs_w.shape[0]
        if static_t is None:
            static_t = _ne_static_misc(prob)
        pts_t = jnp.concatenate(
            [jnp.take(points.T, prob.obs_point, axis=1), jnp.zeros((1, O), jnp.float32)],
            axis=0,
        )
        pad = jnp.zeros((C, 2), jnp.float32)
        if C <= schur_spmv._MAX_CAMS:
            num, den = schur_spmv.fused_cost_sums(
                prob.obs_cam, pts_t, static_t,
                jnp.concatenate([cam_params, pad], axis=1),
                jnp.concatenate([prob.intrinsics, pad], axis=1),
                C, cfg.robust_loss, cfg.robust_scale_px, z_floor=z_floor,
            )
        else:
            cams_t = jnp.concatenate([cam_params, pad], axis=1).T[:, prob.obs_cam]
            intr_t = jnp.concatenate([prob.intrinsics, pad], axis=1).T[:, prob.obs_cam]
            num, den = schur_spmv.fused_cost_sums_big(
                pts_t, static_t, cams_t, intr_t,
                cfg.robust_loss, cfg.robust_scale_px, z_floor=z_floor,
            )
        return num / jnp.maximum(den, 1.0)
    cams_o = cam_params[prob.obs_cam]
    pts_o = points[prob.obs_point]
    intr_o = prob.intrinsics[prob.obs_cam]
    w = prob.obs_w
    if z_floor is not None:
        w = jnp.where(_obs_depths(prob, cam_params, points) > z_floor, w, 0.0)
    r = _residuals_flat(cams_o, pts_o, intr_o, prob.obs_uv)
    s = jnp.sum(r * r, axis=-1)
    c = robust_cost(s, cfg.robust_loss, cfg.robust_scale_px) * w
    num = _maybe_psum(jnp.sum(c), axis_name)
    den = _maybe_psum(jnp.sum(w), axis_name)
    return num / jnp.maximum(den, 1.0)


def ba_cost(prob: BAProblem, cfg: BAConfig) -> jnp.ndarray:
    return compute_cost(prob, prob.cam_params, prob.points, cfg)


class _NormalEq(NamedTuple):
    Hcc: jnp.ndarray      # [C, 6, 6] damped
    Hpp_inv: jnp.ndarray  # [P, 3, 3] damped, inverted
    W: jnp.ndarray        # [O, 6, 3]
    bc: jnp.ndarray       # [C, 6]
    bp: jnp.ndarray       # [P, 3]
    M_inv: jnp.ndarray    # [C, 6, 6] Schur-Jacobi preconditioner, inverted
    point_bounds: jnp.ndarray | None = None  # [P+1] segment offsets (sorted path)
    # Fused-matvec views (kernels/schur_spmv.schur_coupling_matvec); present
    # only when the kernel gate is active. mv_tile is a trace-time Python int.
    w_t: jnp.ndarray | None = None      # [18, O] feature-major W
    hinv_t: jnp.ndarray | None = None   # [9, O] per-obs Hpp_inv, feature-major
    lids: jnp.ndarray | None = None     # [O] tile-local point ids
    mv_tile: int = 0
    # Large-C (C > kernels' one-hot cap) camera-sorted reduction views:
    # obs permutation that sorts by camera + [C+1] segment offsets.
    cam_perm: jnp.ndarray | None = None
    cam_bounds: jnp.ndarray | None = None
    mv_big_tile: int = 0
    # sqrt(|diag S|) per camera param [C, D]: the Jacobi equilibration scale
    # shared by the preconditioner inversion and the scaled-space PCG. At
    # merged-polish scale (C~10k) diag(S) spans 1e-6 (damping floor on
    # padding) to ~1e12 (near-plane observations); CG run in the RAW space
    # overflowed fp32 in p.S p (inf * 0 -> NaN) and froze every LM step.
    sdiag: jnp.ndarray | None = None


def _cam_reduce_sorted(values: jnp.ndarray, perm: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Observation->camera reduction via a precomputed camera-sorted
    permutation + prefix sums — the large-C replacement for both the XLA
    scatter-add (serializes on TPU) and the kernels' MXU one-hot (whose
    [C, T] tile exceeds VMEM past ~2048 cameras). One gather + one cumsum,
    both parallel; fp32 prefix-sum cancellation matches the point-side
    sorted reduction's documented ~1e-7*sqrt(O) relative bound."""
    v_sorted = values[perm]
    zeros = jnp.zeros_like(v_sorted[:1])
    cs = jnp.concatenate([zeros, jnp.cumsum(v_sorted, axis=0)], axis=0)
    return cs[bounds[1:]] - cs[bounds[:-1]]


def _point_reduce(values: jnp.ndarray, prob: BAProblem, bounds, axis_name) -> jnp.ndarray:
    """Observation->point segment reduction for values [O, ...].

    Single-chip problems keep observations SORTED by point (ba/problem.py),
    so the reduction is a cumulative sum + gather at segment offsets — no
    scatter-add (which serializes on TPU and runs twice per CG iteration).
    fp32 prefix-sum cancellation is ~1e-7 * sqrt(O) relative, well under the
    solver's own tolerance. The sharded path (reordered by camera) and any
    caller without bounds falls back to the XLA scatter.
    """
    if bounds is None or axis_name is not None:
        return jax.ops.segment_sum(values, prob.obs_point, prob.num_points)
    zeros = jnp.zeros_like(values[:1])
    cs = jnp.concatenate([zeros, jnp.cumsum(values, axis=0)], axis=0)
    return cs[bounds[1:]] - cs[bounds[:-1]]


def _sym_solve3(A: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Closed-form inverse of batched SPD 3x3 blocks (adjugate / det),
    Jacobi-equilibrated: gross-outlier observations (e.g. mis-merged
    cross-cluster tracks at ~1e4 px residual) push block entries to ~1e13,
    where the raw det (~entries^3) overflows fp32 and the inverse goes
    inf/NaN. Scaling by 1/sqrt(diag) makes the adjugate/det O(1) for any
    input scale; A^-1 = D (D A D)^-1 D."""
    dg = jnp.sqrt(jnp.clip(jnp.abs(jnp.einsum("...ii->...i", A)), 1e-18, None))
    Dinv = 1.0 / dg
    A = A * Dinv[..., :, None] * Dinv[..., None, :]
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    inv = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co01, co11, co12], -1),
            jnp.stack([co02, co12, co22], -1),
        ],
        -2,
    )
    inv = inv * inv_det[..., None, None]
    return inv * Dinv[..., :, None] * Dinv[..., None, :]


def _use_fused_ne(prob: BAProblem, cam_params, axis_name) -> bool:
    """Static gate for the fused Pallas normal-equation kernel
    (kernels/schur_spmv.py): single-chip, pose-only camera blocks, camera
    count within the kernel's VMEM accumulator budget, TPU backend."""
    from sfm_tpu.kernels import schur_spmv

    O = prob.obs_w.shape[0]
    return (
        axis_name is None
        and "ne" not in _kernels_disabled()
        and cam_params.shape[-1] == CAM_DIM
        and prob.num_cameras <= schur_spmv._MAX_CAMS
        and (O % 1024 == 0 or O <= schur_spmv._TILE_OBS)  # tile divisibility
        and jax.default_backend() == "tpu"
    )


def _use_fused_ne_big(prob: BAProblem, cam_params, axis_name) -> bool:
    """Large-C gate (C past the one-hot kernels' VMEM cap): pre-gathered
    camera rows + camera-sorted reductions — the C=4k..16k regime of the
    Rome16K-scale merged polish (VERDICT r2 weak #3)."""
    from sfm_tpu.kernels import schur_spmv

    O = prob.obs_w.shape[0]
    return (
        axis_name is None
        and "ne_big" not in _kernels_disabled()
        and cam_params.shape[-1] == CAM_DIM
        and prob.num_cameras > schur_spmv._MAX_CAMS
        and O % 1024 == 0
        and jax.default_backend() == "tpu"
    )


def _ne_static_misc(prob: BAProblem) -> jnp.ndarray:
    """LM-iteration-invariant rows of the fused NE kernel input (uv, weight,
    freeze masks), feature-major [8, O]. Built ONCE per solve and captured by
    the while_loop body — the per-iteration kernel prep is then just the
    point gather."""
    O = prob.obs_w.shape[0]
    return jnp.concatenate(
        [
            prob.obs_uv.T,
            prob.obs_w[None, :],
            (~prob.cam_fixed)[prob.obs_cam][None, :].astype(jnp.float32),
            (~prob.point_fixed)[prob.obs_point][None, :].astype(jnp.float32),
            jnp.zeros((3, O), jnp.float32),
        ],
        axis=0,
    )


def _ne_blocks_fused(prob: BAProblem, cam_params, points, cfg: BAConfig,
                     static_t: jnp.ndarray | None = None,
                     z_floor: jnp.ndarray | None = None):
    """(Hcc, Hpp, W_t [18,O], bc, bp) via the fused Pallas kernel:
    residual+Jacobian blocks formed per observation tile in VMEM, camera side
    reduced on the MXU (one-hot matmul), point side emitted as compact
    feature-major payloads for one sorted segment_sum — the
    [O,6,6]/[O,3,3] outer-product materializations of the XLA path never
    touch HBM, and W stays feature-major for the coupling-matvec and
    preconditioner kernels."""
    from sfm_tpu.kernels.schur_spmv import fused_ne_payloads

    C = prob.num_cameras
    P = prob.num_points
    O = prob.obs_w.shape[0]
    if static_t is None:
        static_t = _ne_static_misc(prob)
    pts_t = jnp.concatenate(
        [jnp.take(points.T, prob.obs_point, axis=1), jnp.zeros((1, O), jnp.float32)],
        axis=0,
    )
    pad = jnp.zeros((C, 2), jnp.float32)
    Wf_t, Yp_t, camred = fused_ne_payloads(
        prob.obs_cam, pts_t, static_t,
        jnp.concatenate([cam_params, pad], axis=1),
        jnp.concatenate([prob.intrinsics, pad], axis=1),
        C, cfg.robust_loss, cfg.robust_scale_px, z_floor=z_floor,
    )
    Hcc = camred[:, :36].reshape(C, 6, 6)
    bc = camred[:, 36:42]
    W_t = Wf_t[:18]
    red = jax.ops.segment_sum(Yp_t[:9].T, prob.obs_point, P)    # sorted by point
    s6 = [red[:, k] for k in range(6)]
    Hpp = jnp.stack(
        [jnp.stack([s6[0], s6[1], s6[2]], -1),
         jnp.stack([s6[1], s6[3], s6[4]], -1),
         jnp.stack([s6[2], s6[4], s6[5]], -1)], -2
    )
    bp = red[:, 6:9]
    return Hcc, Hpp, W_t, bc, bp


def _ne_blocks_fused_big(prob: BAProblem, cam_params, points, cfg: BAConfig,
                         inv: "_SolveInvariants"):
    """Large-C fused NE: the kernel emits per-observation payloads (W_t,
    point payload, camera payload) with no C-shaped VMEM tile; the camera
    side reduces through the camera-sorted prefix-sum view. Same math as
    _ne_blocks_fused (equality-tested)."""
    from sfm_tpu.kernels.schur_spmv import fused_ne_payloads_big

    C = prob.num_cameras
    P = prob.num_points
    O = prob.obs_w.shape[0]
    static_t = inv.static_t if inv.static_t is not None else _ne_static_misc(prob)
    pts_t = jnp.concatenate(
        [jnp.take(points.T, prob.obs_point, axis=1), jnp.zeros((1, O), jnp.float32)],
        axis=0,
    )
    pad = jnp.zeros((C, 2), jnp.float32)
    cams_t = jnp.concatenate([cam_params, pad], axis=1).T[:, prob.obs_cam]   # [8, O]
    intr_t = jnp.concatenate([prob.intrinsics, pad], axis=1).T[:, prob.obs_cam]
    Wf_t, Yp_t, cam_pay = fused_ne_payloads_big(
        pts_t, static_t, cams_t, intr_t, cfg.robust_loss, cfg.robust_scale_px,
        z_floor=inv.z_floor,
    )
    camred = _cam_reduce_sorted(cam_pay[:42].T, inv.cam_perm, inv.cam_bounds)  # [C, 42]
    Hcc = camred[:, :36].reshape(C, 6, 6)
    bc = camred[:, 36:42]
    W_t = Wf_t[:18]
    red = jax.ops.segment_sum(Yp_t[:9].T, prob.obs_point, P)    # sorted by point
    s6 = [red[:, k] for k in range(6)]
    Hpp = jnp.stack(
        [jnp.stack([s6[0], s6[1], s6[2]], -1),
         jnp.stack([s6[1], s6[3], s6[4]], -1),
         jnp.stack([s6[2], s6[4], s6[5]], -1)], -2
    )
    bp = red[:, 6:9]
    return Hcc, Hpp, W_t, bc, bp


class _SolveInvariants(NamedTuple):
    """LM-iteration-invariant precomputations, hoisted out of the while_loop
    (captured as constants by the body): fused-NE static rows, sorted-segment
    offsets, and the coupling-matvec kernel's tile-local point ids."""

    static_t: jnp.ndarray | None    # [8, O] fused-NE static misc rows
    bounds: jnp.ndarray | None      # [P+1] point segment offsets
    lids: jnp.ndarray | None        # [O] tile-local point ids
    mv_tile: int                    # coupling-matvec tile (0 = kernel off)
    cam_perm: jnp.ndarray | None = None    # [O] camera-sorting permutation (large C)
    cam_bounds: jnp.ndarray | None = None  # [C+1] camera segment offsets
    mv_big_tile: int = 0                   # large-C coupling-matvec tile
    # Near-plane depth floor (scalar, from the initial weighted RMS depth).
    # Observations whose CURRENT-params depth falls at/below it are
    # zero-weighted in every NE build and cost evaluation: their f/z^2
    # Jacobians otherwise inflate the normal equations by ~6 decades and the
    # fp32 implicit Schur matvec loses the true curvature to cancellation
    # (negative p.Sp froze the 10k merged polish). Evaluated at the CURRENT
    # parameters each LM iteration — a single large accepted point step can
    # move a fused point across a camera plane mid-solve.
    z_floor: jnp.ndarray | None = None


def _solve_invariants(prob: BAProblem, cam_params, cfg: BAConfig, axis_name) -> _SolveInvariants:
    from sfm_tpu.kernels import schur_spmv

    O = prob.obs_w.shape[0]
    static_t = None
    if _use_fused_ne(prob, cam_params, axis_name) or _use_fused_ne_big(prob, cam_params, axis_name):
        static_t = _ne_static_misc(prob)
    bounds = None
    if axis_name is None:
        # Sorted-by-point contract (build_problem) -> segment offsets for the
        # scatter-free point reductions inside CG and back-substitution.
        bounds = jnp.searchsorted(prob.obs_point, jnp.arange(prob.num_points + 1, dtype=prob.obs_point.dtype))
    mv_tile = _matvec_kernel_tile(prob, cam_params, axis_name)
    lids = None
    if mv_tile:
        op = prob.obs_point.reshape(O // mv_tile, mv_tile)
        lids = (op - op[:, :1]).reshape(O)
    cam_perm = cam_bounds = None
    mv_big_tile = 0
    # Camera-sorted reduction views are needed by (a) every path when no
    # in-kernel coupling matvec is available (mv_tile == 0), and (b) the
    # large-C NE/WHW big kernels (C > _MAX_CAMS) REGARDLESS of the matvec:
    # since the two-level matvec extended in-kernel coverage to
    # _MV_MAX_CAMS = 16384 > _MAX_CAMS = 4096, a point-aligned solve at
    # C in (4096, 16384] has mv_tile > 0 but still reduces Hcc/WHW through
    # _cam_reduce_sorted (r5 regression caught by matvec_parity's solve
    # proof: cam_bounds=None subscript crash — the combination was
    # invisible to the big-C tests, which use point_align=0).
    if axis_name is None and (not mv_tile or prob.num_cameras > schur_spmv._MAX_CAMS):
        # One argsort per solve, O(log O) on device — replaces the one-hot
        # kernels (VMEM-capped) or the XLA scatter (serializes).
        cam_perm = jnp.argsort(prob.obs_cam, stable=True)
        sorted_cams = prob.obs_cam[cam_perm]
        cam_bounds = jnp.searchsorted(
            sorted_cams, jnp.arange(prob.num_cameras + 1, dtype=prob.obs_cam.dtype)
        )
        if (not mv_tile
                and cam_params.shape[-1] == CAM_DIM
                and jax.default_backend() == "tpu"
                and "mv_big" not in _kernels_disabled()):
            T = schur_spmv.matvec_tile_big(prob.point_align)
            if T and O % T == 0:
                mv_big_tile = T
                op = prob.obs_point.reshape(O // T, T)
                lids = (op - op[:, :1]).reshape(O)
    return _SolveInvariants(static_t=static_t, bounds=bounds, lids=lids, mv_tile=mv_tile,
                            cam_perm=cam_perm, cam_bounds=cam_bounds, mv_big_tile=mv_big_tile)


def build_normal_equations(prob: BAProblem, cam_params, points, lam, cfg: BAConfig,
                           axis_name=None, inv: _SolveInvariants | None = None) -> _NormalEq:
    C = prob.num_cameras
    P = prob.num_points
    if inv is None:
        inv = _solve_invariants(prob, cam_params, cfg, axis_name)
    use_f = _use_fused_ne(prob, cam_params, axis_name)
    use_fb = _use_fused_ne_big(prob, cam_params, axis_name)
    if inv.z_floor is not None and not (use_f or use_fb):
        # Near-plane gate at the CURRENT parameters (see _SolveInvariants).
        # The fused NE kernels apply this gate IN-KERNEL (the depth is
        # already in-register there — no separate [O]-wide _obs_depths
        # pass); the XLA paths read prob.obs_w via sqrt_w folding, so gate
        # the weights here.
        z = _obs_depths(prob, cam_params, points)
        w_gated = jnp.where(z > inv.z_floor, prob.obs_w, 0.0)
        prob = prob._replace(obs_w=w_gated)
    W_t = None
    if use_f:
        Hcc, Hpp, W_t, bc, bp = _ne_blocks_fused(prob, cam_params, points, cfg,
                                                 static_t=inv.static_t,
                                                 z_floor=inv.z_floor)
        O = W_t.shape[1]
        W = W_t.T.reshape(O, 6, 3)
    elif use_fb:
        Hcc, Hpp, W_t, bc, bp = _ne_blocks_fused_big(prob, cam_params, points, cfg, inv)
        O = W_t.shape[1]
        # W stays FEATURE-MAJOR on the large-C path: materializing [O, 6, 3]
        # lane-pads 3 -> 128 (a 57x expansion, ~4GB at O = 2^20) and crashed
        # the TPU worker on the 10k merged polish. Every consumer
        # (_schur_matvec / _schur_rhs / _back_substitute) has a W_t row-
        # arithmetic path.
        W = None
    else:
        r, Jc, Jp, _ = residuals_and_jacobians(prob, cam_params, points, cfg)

        # Zero out Jacobians of frozen parameters: their normal-equation rows
        # vanish, so updates are exactly zero (local-BA windowing / padding).
        Jc = jnp.where(prob.cam_fixed[prob.obs_cam][:, None, None], 0.0, Jc)
        Jp = jnp.where(prob.point_fixed[prob.obs_point][:, None, None], 0.0, Jp)

        JcTJc = jnp.einsum("oai,oaj->oij", Jc, Jc)            # [O, 6, 6]
        JpTJp = jnp.einsum("oai,oaj->oij", Jp, Jp)            # [O, 3, 3]
        W = jnp.einsum("oai,oaj->oij", Jc, Jp)                # [O, 6, 3]
        # NOTE: no indices_are_sorted hints here — the camera-sharded path
        # reorders observations by camera, so point sortedness cannot be assumed
        # by this shared code (and the hint measured perf-neutral on v5e).
        bJc = jnp.einsum("oai,oa->oi", Jc, r)
        if inv.cam_perm is not None and axis_name is None:
            # Large-C scatter-free camera reductions (see _cam_reduce_sorted).
            D = cam_params.shape[-1]
            camred = _cam_reduce_sorted(
                jnp.concatenate([JcTJc.reshape(-1, D * D), bJc], axis=1),
                inv.cam_perm, inv.cam_bounds,
            )
            Hcc = camred[:, :D * D].reshape(C, D, D)
            bc = -camred[:, D * D:]
        else:
            Hcc = _maybe_psum(jax.ops.segment_sum(JcTJc, prob.obs_cam, C), axis_name)     # [C, 6, 6]
            bc = -_maybe_psum(jax.ops.segment_sum(bJc, prob.obs_cam, C), axis_name)
        Hpp = _maybe_psum(jax.ops.segment_sum(JpTJp, prob.obs_point, P), axis_name)   # [P, 3, 3]
        bp = -_maybe_psum(jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, r), prob.obs_point, P), axis_name)

    # Multiplicative LM damping on block diagonals (Ceres-style), with an
    # absolute floor so padded/unconstrained blocks stay invertible.
    eyec = jnp.eye(cam_params.shape[-1])
    eyep = jnp.eye(PT_DIM)
    dc = jnp.einsum("cii->ci", Hcc)
    dp = jnp.einsum("pii->pi", Hpp)
    Hcc_d = Hcc + (lam * dc[:, :, None] + 1e-6) * eyec[None]
    Hpp_d = Hpp + (lam * dp[:, :, None] + 1e-6) * eyep[None]
    Hpp_inv = _sym_solve3(Hpp_d)

    # Shared feature-major views for the preconditioner + coupling-matvec
    # kernels (one transpose/gather per LM iteration, not per use).
    from sfm_tpu.kernels import schur_spmv

    O = W_t.shape[1] if W_t is not None else W.shape[0]
    whw_kernel = (
        axis_name is None and jax.default_backend() == "tpu"
        and "whw" not in _kernels_disabled()
        and C <= schur_spmv._MAX_CAMS and cam_params.shape[-1] == CAM_DIM
        and O % min(schur_spmv._TILE_OBS, O) == 0
    )
    whw_big = (
        axis_name is None and jax.default_backend() == "tpu"
        and "whw_big" not in _kernels_disabled()
        and C > schur_spmv._MAX_CAMS and cam_params.shape[-1] == CAM_DIM
        and inv.cam_perm is not None
        and O % min(schur_spmv._TILE_OBS, O) == 0
    )
    mv_any = inv.mv_tile or inv.mv_big_tile
    hinv_t = None
    if whw_kernel or whw_big or mv_any or W is None:
        hinv_t = Hpp_inv.reshape(P, 9)[prob.obs_point].T
    if (whw_kernel or whw_big or mv_any) and W_t is None:
        W_t = W.reshape(O, 18).T

    # Schur-Jacobi preconditioner: exact block diagonal of S.
    if whw_kernel:
        whw_sum = schur_spmv.whw_cam_reduce(W_t, hinv_t, prob.obs_cam, C).reshape(C, 6, 6)
    elif whw_big:
        pay = schur_spmv.whw_payloads_big(W_t, hinv_t)            # [36, O]
        whw_sum = _cam_reduce_sorted(pay.T, inv.cam_perm, inv.cam_bounds).reshape(C, 6, 6)
    elif W is None:
        # Feature-major WHW (large-C path with the whw kernel gated off):
        # never materialize [O, 6, 6] — see the W=None rationale above.
        whw_sum = _cam_reduce_sorted(
            _whw_rows_t(W_t, hinv_t).T, inv.cam_perm, inv.cam_bounds
        ).reshape(Hcc_d.shape)
    else:
        WHW = jnp.einsum("oij,ojk,olk->oil", W, Hpp_inv[prob.obs_point], W)  # [O, 6, 6]
        if inv.cam_perm is not None and axis_name is None:
            whw_sum = _cam_reduce_sorted(
                WHW.reshape(O, -1), inv.cam_perm, inv.cam_bounds
            ).reshape(Hcc_d.shape)
        else:
            whw_sum = _cam_reduce(WHW, prob.obs_cam, C, axis_name)
    M = Hcc_d - _maybe_psum(whw_sum, axis_name)
    M = M + 1e-6 * eyec[None]
    # Jacobi-equilibrated inversion: at merged-polish scale, blocks touched
    # by gross outliers carry ~1e13 entries and the raw fp32 LU det
    # overflows — jnp.linalg.inv returned inf/NaN for ~9% of cameras on the
    # 10k model and every LM step was rejected (NaN cost). D M D has O(1)
    # entries for any input scale; M^-1 = D (D M D)^-1 D.
    dg = jnp.sqrt(jnp.clip(jnp.abs(jnp.einsum("cii->ci", M)), 1e-18, None))
    Dinv = 1.0 / dg
    M_eq = M * Dinv[:, :, None] * Dinv[:, None, :]
    M_inv = jnp.linalg.inv(M_eq) * Dinv[:, :, None] * Dinv[:, None, :]

    keep_t = mv_any or W is None
    return _NormalEq(Hcc=Hcc_d, Hpp_inv=Hpp_inv, W=W, bc=bc, bp=bp, M_inv=M_inv,
                     point_bounds=inv.bounds, sdiag=dg,
                     w_t=W_t if keep_t else None,
                     hinv_t=hinv_t if keep_t else None,
                     lids=inv.lids, mv_tile=inv.mv_tile,
                     cam_perm=inv.cam_perm, cam_bounds=inv.cam_bounds,
                     mv_big_tile=inv.mv_big_tile)


def _matvec_kernel_tile(prob: BAProblem, cam_params, axis_name) -> int:
    """Static gate for the fused Schur coupling matvec kernel: single-chip,
    pose-only camera blocks, point-tile-aligned observations, TPU backend.
    Returns the observation tile (0 = kernel off)."""
    from sfm_tpu.kernels import schur_spmv

    if axis_name is not None or cam_params.shape[-1] != CAM_DIM:
        return 0
    if jax.default_backend() != "tpu" or "mv" in _kernels_disabled():
        return 0
    T = schur_spmv.matvec_tile(prob.num_cameras, prob.point_align)
    if T == 0 or prob.obs_w.shape[0] % T != 0:
        return 0
    return T


def _whw_rows_t(W_t: jnp.ndarray, hinv_t: jnp.ndarray) -> jnp.ndarray:
    """vec(W_o Hinv_o W_o^T) per observation, feature-major:
    W_t [18+, O], hinv_t [9, O] -> [36, O] (no [O, 6, 6] materialization)."""
    O = W_t.shape[1]
    Wm = W_t[:18].reshape(6, 3, O)
    Hm = hinv_t.reshape(3, 3, O)
    u_t = jnp.einsum("iko,klo->ilo", Wm, Hm)
    return jnp.einsum("ilo,jlo->ijo", u_t, Wm).reshape(36, O)


def _wt_apply_T(w_t: jnp.ndarray, x_t: jnp.ndarray) -> jnp.ndarray:
    """u[k] = sum_i W[i, k] * x[i] per observation, feature-major:
    w_t [18, O] (row i*3+k = W[i, k]), x_t [6, O] -> [3, O].

    Strided-row arithmetic only: unit-row slices (w_t[i]) made XLA lay the
    whole loop-resident w_t out with LANES on the feature axis — [1, O]
    slices at 128x padding, four 1GB buffers at O = 2^21 (the 10k#3 polish
    compile OOM). repeat/strided-slice keep observations on lanes."""
    prod = w_t[:18] * jnp.repeat(x_t[:6], 3, axis=0)           # row i*3+k = W[i,k] x[i]
    return jnp.stack([jnp.sum(prod[k::3], axis=0) for k in range(3)])


def _wt_apply(w_t: jnp.ndarray, x_t: jnp.ndarray) -> jnp.ndarray:
    """y[i] = sum_k W[i, k] * x[k] per observation, feature-major:
    w_t [18, O], x_t [3, O] -> [6, O]. See _wt_apply_T for the layout rule."""
    prod = w_t[:18] * jnp.tile(x_t[:3], (6, 1))                # row i*3+k = W[i,k] x[k]
    return prod[0::3] + prod[1::3] + prod[2::3]


def _schur_matvec(ne: _NormalEq, prob: BAProblem, v: jnp.ndarray, axis_name=None,
                  use_kernel: bool = True) -> jnp.ndarray:
    """Implicit S @ v for v [C, 6] without materializing S.

    Sharded mode: W blocks are local to each observation shard; the two
    segment-sums complete across shards via psum (ne.Hcc/Hpp_inv and v are
    replicated, so the CG iterates stay bitwise-identical on all shards).
    use_kernel=False forces the XLA scatter (required under vmap — the
    dense-Schur column assembly batches this function, and a vmapped
    pallas_call does not lower)."""
    if use_kernel and ne.mv_tile:
        from sfm_tpu.kernels.schur_spmv import schur_coupling_matvec

        coupling = schur_coupling_matvec(
            prob.obs_cam, ne.lids, ne.w_t, ne.hinv_t, v, tile=ne.mv_tile
        )
        return jnp.einsum("cij,cj->ci", ne.Hcc, v) - coupling
    if use_kernel and ne.mv_big_tile:
        # Large-C variant: the camera gather (v[obs_cam]) and the final
        # camera reduction run in XLA (gather + camera-sorted prefix sum);
        # the kernel keeps the per-obs compute + tile-local point segments.
        from sfm_tpu.kernels.schur_spmv import schur_coupling_payloads_big

        C = v.shape[0]
        v8 = jnp.zeros((8, C), jnp.float32).at[:6].set(v.T)
        y_t = schur_coupling_payloads_big(
            ne.lids, ne.w_t, ne.hinv_t, v8[:, prob.obs_cam], tile=ne.mv_big_tile
        )
        coupling = _cam_reduce_sorted(y_t[:6].T, ne.cam_perm, ne.cam_bounds)
        return jnp.einsum("cij,cj->ci", ne.Hcc, v) - coupling
    if ne.W is None:
        # Feature-major XLA matvec (large-C path, no usable coupling kernel):
        # all per-observation intermediates are [rows, O] — observations on
        # the LANE axis — so nothing lane-pads (a [O, 3] layout pads 3 -> 128;
        # at O = 2^20 that is ~0.5GB per temporary and the [O, 6, 3] W it
        # would come from is ~4GB — the 10k polish HBM crash).
        u_t = _wt_apply_T(ne.w_t, jnp.take(v.T, prob.obs_cam, axis=1))   # [3, O]
        g = _point_reduce(u_t.T, prob, ne.point_bounds, axis_name)       # [P, 3]
        h = jnp.einsum("pij,pj->pi", ne.Hpp_inv, _maybe_psum(g, axis_name))
        y_t = _wt_apply(ne.w_t, jnp.take(h.T, prob.obs_point, axis=1))   # [6, O]
        Wv = _cam_reduce_sorted(y_t.T, ne.cam_perm, ne.cam_bounds)
        return jnp.einsum("cij,cj->ci", ne.Hcc, v) - Wv
    u = jnp.einsum("oij,oi->oj", ne.W, v[prob.obs_cam])                 # [O, 3]
    g = _maybe_psum(_point_reduce(u, prob, ne.point_bounds, axis_name), axis_name)
    h = jnp.einsum("pij,pj->pi", ne.Hpp_inv, g)                        # [P, 3]
    y = jnp.einsum("oij,oj->oi", ne.W, h[prob.obs_point])              # [O, 6]
    if ne.cam_perm is not None and axis_name is None:
        Wv = _cam_reduce_sorted(y, ne.cam_perm, ne.cam_bounds)
    elif use_kernel:
        Wv = _maybe_psum(_cam_reduce(y, prob.obs_cam, prob.num_cameras, axis_name), axis_name)
    else:
        Wv = _maybe_psum(jax.ops.segment_sum(y, prob.obs_cam, prob.num_cameras), axis_name)
    return jnp.einsum("cij,cj->ci", ne.Hcc, v) - Wv


def _schur_rhs(ne: _NormalEq, prob: BAProblem, axis_name=None) -> jnp.ndarray:
    """rhs = bc - W Hpp^-1 bp."""
    h = jnp.einsum("pij,pj->pi", ne.Hpp_inv, ne.bp)
    if ne.W is None:  # feature-major large-C path (see _schur_matvec)
        y_t = _wt_apply(ne.w_t, jnp.take(h.T, prob.obs_point, axis=1))
        return ne.bc - _cam_reduce_sorted(y_t.T, ne.cam_perm, ne.cam_bounds)
    y = jnp.einsum("oij,oj->oi", ne.W, h[prob.obs_point])
    if ne.cam_perm is not None and axis_name is None:
        return ne.bc - _cam_reduce_sorted(y, ne.cam_perm, ne.cam_bounds)
    return ne.bc - _maybe_psum(_cam_reduce(y, prob.obs_cam, prob.num_cameras, axis_name), axis_name)


def _pcg(ne: _NormalEq, prob: BAProblem, rhs: jnp.ndarray, cfg: BAConfig, axis_name=None) -> jnp.ndarray:
    """Preconditioned CG on the reduced camera system. Fixed iteration cap,
    early termination by freezing updates once converged (static shapes).

    Runs in the Jacobi-equilibrated space: solve (D^-1 S D^-1) y = D^-1 rhs
    with D = diag(sqrt|diag S|) (ne.sdiag, shared with the preconditioner
    inversion), return x = D^-1 y. Mathematically the same solution, but
    every iterate is O(1)-scaled: on the 10k merged polish diag(S) spans
    ~18 decades (1e-6 damping floor on padded cameras to ~1e12 on blocks
    touched by near-plane observations) and RAW-space fp32 CG overflowed in
    p.(S p) — inf * 0 -> NaN poisoned every LM step, freezing the solve
    (the round-3 "bent 10k model" root cause). The equilibrated block
    preconditioner is M_eq^-1 = D M^-1 D (no extra inversion).

    A non-finite or non-positive curvature p.(S p) (indefinite rounding at
    extreme conditioning) permanently freezes further updates — CG keeps
    the best x found instead of diverging.
    """
    d = ne.sdiag
    dinv = 1.0 / d

    def precond(r):
        return d * jnp.einsum("cij,cj->ci", ne.M_inv, d * r)

    b = dinv * rhs
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rhs_norm = jnp.sqrt(jnp.sum(b * b)) + 1e-20

    def body(_, state):
        x, r, p, rz, dead = state
        Ap = dinv * _schur_matvec(ne, prob, dinv * p, axis_name)
        pAp = jnp.sum(p * Ap)
        dead = dead | ~jnp.isfinite(pAp) | (pAp <= 0.0)
        done = dead | (jnp.sqrt(jnp.sum(r * r)) / rhs_norm < cfg.cg_tolerance)
        alpha = jnp.where(done, 0.0, rz / jnp.where(done, 1.0, pAp))
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.where(done, rz, jnp.sum(r * z))
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = jnp.where(done, p, z + beta * p)
        return x, r, p, rz_new, dead

    x, _, _, _, _ = jax.lax.fori_loop(
        0, cfg.cg_iterations, body, (x, r, p, rz, jnp.asarray(False)))
    return dinv * x


def _dense_schur_solve(ne: _NormalEq, prob: BAProblem, rhs: jnp.ndarray, cfg: BAConfig) -> jnp.ndarray:
    """Dense-Cholesky reduced camera solver for small scenes (SURVEY.md §2.6:
    "dense cholesky path for <=~500 cams").

    PCG pays cfg.cg_iterations sequential device steps regardless of problem
    size — at small C that latency dominates the solve. Here S is
    materialized column-block-wise through the same implicit matvec
    (batched: one dispatch per 32 columns instead of one per CG step), then
    factorized. Jacobi equilibration keeps the fp32 Cholesky well-scaled
    (damped-but-fixed camera blocks sit ~1e-6 while active blocks can be
    ~1e+6).
    """
    C, D = rhs.shape
    K = C * D
    chunk = 32
    K_pad = -(-K // chunk) * chunk
    # Unit vectors e_i reshaped to [C, D]; by symmetry S e_i is row i of S.
    eye = jnp.eye(K_pad, K).reshape(K_pad // chunk, chunk, C, D)

    def cols(vblk):
        return jax.vmap(
            lambda v: _schur_matvec(ne, prob, v, None, use_kernel=False)
        )(vblk).reshape(chunk, K)

    S = jax.lax.map(cols, eye).reshape(K_pad, K)[:K]
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    inv_d = 1.0 / d
    S_eq = S * inv_d[:, None] * inv_d[None, :] + 1e-6 * jnp.eye(K)
    cf = jax.scipy.linalg.cho_factor(S_eq, lower=True)
    y = jax.scipy.linalg.cho_solve(cf, rhs.reshape(K) * inv_d)
    return (y * inv_d).reshape(C, D)


def _back_substitute(ne: _NormalEq, prob: BAProblem, dc: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """dp = Hpp^-1 (bp - W^T dc)."""
    if ne.W is None:  # feature-major large-C path (see _schur_matvec)
        u_t = _wt_apply_T(ne.w_t, jnp.take(dc.T, prob.obs_cam, axis=1))
        u = u_t.T
    else:
        u = jnp.einsum("oij,oi->oj", ne.W, dc[prob.obs_cam])
    g = ne.bp - _maybe_psum(_point_reduce(u, prob, ne.point_bounds, axis_name), axis_name)
    return jnp.einsum("pij,pj->pi", ne.Hpp_inv, g)


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray


def bundle_adjust_impl(prob: BAProblem, cfg: BAConfig, axis_name=None) -> tuple[BAProblem, BAStats]:
    """LM driver shared by the single-chip and sharded paths."""

    # Near-plane/cheirality gate: observations whose point sits at or behind
    # the camera plane reproject to finite pixels (x/z double sign flip), so
    # pixel-error filters upstream cannot catch them, and their f/z^2
    # Jacobians inflate the normal equations by ~6 decades (10 such obs on
    # the fused 10k model pushed diag(S) to 1e12 and the fp32 Schur matvec
    # lost the curvature to cancellation). The floor is relative to the
    # scene's weighted RMS depth (psum-reduced: sharded and single-chip
    # paths gate identically) — the problem's absolute scale is gauge, not
    # geometry. The floor is applied at the CURRENT parameters inside every
    # NE build / cost evaluation (see _SolveInvariants.z_floor): one large
    # accepted point step can move a fused point across a camera plane
    # mid-solve.
    z0 = _obs_depths(prob, prob.cam_params, prob.points)
    w_sum = _maybe_psum(jnp.sum(prob.obs_w), axis_name)
    z_rms = jnp.sqrt(
        _maybe_psum(jnp.sum(prob.obs_w * z0 * z0), axis_name) / jnp.maximum(w_sum, 1.0)
    )
    z_floor = 1e-3 * jnp.maximum(z_rms, 1e-9)

    inv = _solve_invariants(prob, prob.cam_params, cfg, axis_name)._replace(z_floor=z_floor)
    cost0 = compute_cost(prob, prob.cam_params, prob.points, cfg, axis_name,
                         z_floor=z_floor, static_t=inv.static_t)

    def cond(state):
        _, _, lam, it, done, _ = state
        return (it < cfg.max_iterations) & jnp.logical_not(done)

    # Reduced-system solver choice is static (num_cameras is a trace-time
    # shape): dense Cholesky for small problems, PCG above the cutoff or when
    # sharded (SURVEY.md §2.6 reduced-system solver). Dense assembles S with
    # 6C implicit matvecs (batched 32 per dispatch) — it beats cg_iterations
    # SEQUENTIAL matvec dispatches until the extra flops (each matvec is
    # O(num_obs)) dominate; the C*O volume gate encodes the crossover
    # measured on v5e (C=32/O=33k: dense 240x faster; C=128/O=131k: 5x
    # slower).
    n_obs = prob.obs_w.shape[0]
    use_dense = (
        axis_name is None
        and prob.num_cameras <= cfg.dense_schur_max_cameras
        and prob.num_cameras * n_obs <= (4 << 20)
    )

    def body(state):
        cam_params, points, lam, it, _, cost = state
        ne = build_normal_equations(prob, cam_params, points, lam, cfg, axis_name, inv=inv)
        rhs = _schur_rhs(ne, prob, axis_name)
        if use_dense:
            dc = _dense_schur_solve(ne, prob, rhs, cfg)
        else:
            dc = _pcg(ne, prob, rhs, cfg, axis_name)
        dp = _back_substitute(ne, prob, dc, axis_name)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)
        dp = jnp.where(prob.point_fixed[:, None], 0.0, dp)
        if prob.cam_params.shape[-1] >= 8:
            # Config-switched intrinsics refinement: freeze whichever of
            # (focal, k1) the config does not ask to refine.
            if not cfg.refine_focal:
                dc = dc.at[:, 6].set(0.0)
            if not cfg.refine_distortion:
                dc = dc.at[:, 7].set(0.0)

        new_cams = cam_params + dc
        new_points = points + dp
        new_cost = compute_cost(prob, new_cams, new_points, cfg, axis_name,
                                z_floor=z_floor, static_t=inv.static_t)

        accept = new_cost < cost
        cam_params = jnp.where(accept, new_cams, cam_params)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / cfg.lambda_down, cfg.min_lambda),
            jnp.minimum(lam * cfg.lambda_up, cfg.max_lambda),
        )
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = accept & (rel_decrease < cfg.function_tolerance)
        cost = jnp.where(accept, new_cost, cost)
        return cam_params, points, lam, it + 1, done, cost

    init = (prob.cam_params, prob.points, jnp.asarray(cfg.initial_lambda, jnp.float32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False), cost0)
    cam_params, points, lam, it, _, cost = jax.lax.while_loop(cond, body, init)

    out = prob._replace(cam_params=cam_params, points=points)
    return out, BAStats(initial_cost=cost0, final_cost=cost, iterations=it, lam=lam)


@partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(prob: BAProblem, cfg: BAConfig) -> tuple[BAProblem, BAStats]:
    """Single-chip LM to convergence (or cfg.max_iterations)."""
    return bundle_adjust_impl(prob, cfg, axis_name=None)
