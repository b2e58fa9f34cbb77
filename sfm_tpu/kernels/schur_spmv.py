"""Pallas block-sparse normal-equation / Schur reductions (SURVEY.md §2.6).

The BA core's sparsity is segment-sum shaped: per-observation payloads reduce
into per-camera blocks (Hcc, bc, the Schur-Jacobi diagonal, and the second
half of every implicit S·v product). On TPU, scatter-adds serialize; the
observation->camera reduction here is instead ONE-HOT MATMUL on the MXU:

    out[c, k] = sum_o [obs_cam[o] == c] * values[o, k]
              = onehot(obs_cam)^T @ values

streamed over observation tiles with the [C, K] accumulator resident in
VMEM. The one-hot tile is built in-registers from an iota compare (never
materialized in HBM), so HBM traffic is exactly one read of `values` — the
XLA scatter path reads the same data but serializes the accumulation.

The point-side reductions stay XLA segment_sums: observations are sorted by
point (ba/problem.py), so those segments are contiguous and XLA handles them
well; cameras are the unsorted axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_OBS = 1024      # observation rows per grid step
_MAX_CAMS = 4096      # VMEM budget: onehot tile [T, C] bf16 = 2MB at the cap
_MV_MAX_CAMS = 16384  # two-level coupling matvec cap (10k merged polish)
                      # (bf16 one-hots + _dot_split halved the footprint
                      # that previously capped this at 2048)

# Fused normal-equation kernel layout (see fused_ne_payloads):
_PTS_ROWS = 4         # point xyz + pad (per LM iteration)
_STATIC_ROWS = 8      # uv(2) w(1) cam_free(1) pt_free(1) pad(3) (per solve)
_CAMRED_COLS = 48     # vec(JcTJc)(36) -Jc^T r(6) pad(6)
_W_COLS = 24          # vec(W = Jc^T Jp)(18) pad(6)
_YP_COLS = 16         # sym(JpTJp)(6) -Jp^T r(3) pad(7)


def _dot_split(x: jnp.ndarray, onehot: jnp.ndarray, dims, nterms: int = 3):
    """x (fp32) contracted with a 0/1 indicator in bf16, multi-term split.

    The session-global jax_default_matmul_precision=highest makes every
    in-kernel fp32 dot_general a SIX-pass bf16 emulation on the MXU — and
    these one-hot gather/scatter dots are the matvec's entire MXU cost
    (measured 12 ms vs ~1 ms roofline at C=1024/O=2^20). The indicator is
    EXACTLY representable in bf16, so splitting only x as
    x = hi + mid + lo (bf16 each) gives fp32-grade results in 3 passes:
    per-term rounding leaves a residual < 2^-24 |x| after three terms,
    matching fp32 multiplication error, while the dot runs at native bf16
    rate with fp32 accumulation.
    """
    oh = onehot.astype(jnp.bfloat16)
    terms = []
    rem = x
    for _ in range(nterms):
        hi = rem.astype(jnp.bfloat16)
        terms.append(hi)
        rem = rem - hi.astype(jnp.float32)
    # Stack the split terms on the FREE (row) axis and issue ONE dot: the
    # MXU pass count of an [M, K] @ [K, N] dot is ceil(M/128)*(K/128)*(N/128)
    # — at M = 8 every split term pays a full 128-row pass for 8 useful
    # rows, so three sequential term dots cost 3x the passes of one stacked
    # [3M, K] dot (matvec M=8 -> 24, NE payload M=48 -> 144 = 2 row tiles
    # instead of 3). Every call site contracts x's axis 1, leaving axis 0
    # free; the fp32 term sum afterwards is the same add order as before.
    assert x.ndim == 2 and dims[0][0] == (1,)
    M = x.shape[0]
    part = jax.lax.dot_general(jnp.concatenate(terms, axis=0), oh, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    acc = part[:M]
    for t in range(1, nterms):
        acc = acc + part[t * M:(t + 1) * M]
    return acc


def _paged_take(tab, ids):
    """In-kernel table gather out[f, t] = tab[f, ids[0, t]] without a [C, T]
    one-hot dot: Mosaic's tpu.dynamic_gather is strictly single-vreg (lane
    gathers only within one (8, 128) register), so the gather is tiled into
    128-lane output chunks and the table into 128-lane pages — per chunk, a
    within-page gather + page-id select accumulates over pages. VPU-only:
    ~4 vreg-ops per (chunk, page) = 4*T*C/16384 ops per tile, vs the one-hot
    MXU dot's 24*C*T MACs (the whole matvec cost at C >= 4096 — measured
    92 ms/matvec at C=4096/O=4.2M, ~16x over its own C=1024 rate). The
    gather is fp32-EXACT, so the 3-term bf16 split (and its
    reduce_precision guard) disappears from the gather side entirely.

    tab must be [8, Cp] with Cp a multiple of 128; ids [1, T] int32 with
    T a multiple of 128. Returns [8, T] fp32.
    """
    F, Cp = tab.shape
    T = ids.shape[1]
    assert F == 8 and Cp % 128 == 0 and T % 128 == 0
    # Sublane-replicate the index row via CONCAT, not broadcast: a plain
    # vector.broadcast of i32 across sublanes fails Mosaic layout inference
    # ("Invalid input layout", measured on v5e), and an add-zeros workaround
    # gets canonicalized back into the same broadcast.
    ids8 = jnp.concatenate([ids] * 8, axis=0)                      # [8, T]
    out_chunks = []
    for j in range(T // 128):
        idx = ids8[:, j * 128:(j + 1) * 128]
        lane = jax.lax.bitwise_and(idx, 127)
        page = jax.lax.shift_right_logical(idx, 7)
        acc = jnp.zeros((8, 128), tab.dtype)
        for p in range(Cp // 128):
            part = jnp.take_along_axis(tab[:, p * 128:(p + 1) * 128], lane, axis=1)
            acc = jnp.where(page == p, part, acc)
        out_chunks.append(acc)
    return jnp.concatenate(out_chunks, axis=1)


def _rot_cols(wx, wy, wz, a, b):
    """Entries of I + a*[w]x + b*[w]x^2 as nine [1,T] row vectors."""
    t2 = wx * wx + wy * wy + wz * wz
    return (
        1.0 + b * (wx * wx - t2), -a * wz + b * wx * wy, a * wy + b * wx * wz,
        a * wz + b * wx * wy, 1.0 + b * (wy * wy - t2), -a * wx + b * wy * wz,
        -a * wy + b * wx * wz, a * wx + b * wy * wz, 1.0 + b * (wz * wz - t2),
    )


def _project_rows(cams, intr, pts, st):
    """Shared closed-form projection for one observation tile (all inputs
    feature-major [rows, T]): Rodrigues rotation, perspective division,
    polynomial distortion, residual. Returns the intermediates the NE
    payload body needs plus the camera-frame depth xc2 (the z-floor gate
    reads it in-kernel — no separate _obs_depths pass over O)."""
    wx, wy, wz = cams[0:1], cams[1:2], cams[2:3]
    tx, ty, tz = cams[3:4], cams[4:5], cams[5:6]
    fx, fy, cx, cy, k1, k2 = (intr[i:i + 1] for i in range(6))
    px, py, pz = pts[0:1], pts[1:2], pts[2:3]
    u_obs, v_obs = st[0:1], st[1:2]

    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-8
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    A = jnp.where(small, 1.0 - t2 / 6.0, sin_t / th)               # sin/t
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - cos_t) / t2)      # (1-cos)/t^2
    C2 = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (th - sin_t) / (t2 * th))

    R = _rot_cols(wx, wy, wz, A, B)
    (r00, r01, r02, r10, r11, r12, r20, r21, r22) = R
    xc0 = r00 * px + r01 * py + r02 * pz + tx
    xc1 = r10 * px + r11 * py + r12 * pz + ty
    xc2 = r20 * px + r21 * py + r22 * pz + tz

    z = jnp.where(jnp.abs(xc2) < 1e-8, jnp.where(xc2 < 0, -1e-8, 1e-8), xc2)
    inv_z = 1.0 / z
    x = xc0 * inv_z
    y = xc1 * inv_z
    r2 = x * x + y * y
    s = 1.0 + r2 * (k1 + r2 * k2)
    ru = fx * (x * s) + cx - u_obs                             # residual
    rv = fy * (y * s) + cy - v_obs
    return (ru, rv, xc2, x, y, r2, s, inv_z, R, (wx, wy, wz), (B, C2),
            (fx, fy, k1, k2), (px, py, pz))


def _ne_tile_rows(robust_loss, robust_scale, cams, intr, pts, st, zf=None):
    """Shared fused-NE tile body: closed-form residual + Jacobian payload
    rows for one observation tile, all inputs feature-major [rows, T].

    Mirrors ba/core._residual_jac_analytic exactly (equality-tested); the
    d(R p)/d rvec term uses the closed-form SO(3) right Jacobian
    J_r(w) = I - (1-cos)/t^2 [w]x + (t-sin)/t^3 [w]x^2 instead of jacfwd.

    Layout: every per-observation scalar lives as a [1, T] ROW vector (lanes
    = observations); a [T, 1] column layout pads each scalar to 128 lanes
    and blows the VMEM budget ~128x.

    Returns (cam_rows: 42 x [1,T] — vec(Jc^T Jc) then -Jc^T r,
             w_rows: 18 x [1,T] — vec(W),
             yp_rows: 9 x [1,T] — sym(Jp^T Jp) then -Jp^T r).
    """
    from sfm_tpu.geometry.losses import robust_weight

    def col(arr, i):
        return arr[i:i + 1, :]                                 # [1, T]

    w_obs, cam_free, pt_free = col(st, 2), col(st, 3), col(st, 4)
    (ru, rv, xc2, x, y, r2, s, inv_z, R, (wx, wy, wz), (B, C2),
     (fx, fy, k1, k2), (px, py, pz)) = _project_rows(cams, intr, pts, st)
    (r00, r01, r02, r10, r11, r12, r20, r21, r22) = R
    if zf is not None:
        # Near-plane gate at the CURRENT parameters (ba/core z_floor): the
        # depth is already in-register here, so the former separate
        # _obs_depths pass (an [O]-wide XLA gather+projection per NE build)
        # folds into the tile body.
        w_obs = jnp.where(xc2 > zf, w_obs, 0.0)

    # M = diag(f) @ D_dist @ A_proj  (rows m0*, m1* of the [2,3] chain).
    dsc = (k1 + 2.0 * k2 * r2) * 2.0
    ds_dx = dsc * x
    ds_dy = dsc * y
    d00 = s + x * ds_dx
    d01 = x * ds_dy
    d10 = y * ds_dx
    d11 = s + y * ds_dy
    m00 = fx * inv_z * d00
    m01 = fx * inv_z * d01
    m02 = -fx * inv_z * (d00 * x + d01 * y)
    m10 = fy * inv_z * d10
    m11 = fy * inv_z * d11
    m12 = -fy * inv_z * (d10 * x + d11 * y)

    # Jp = M @ R.
    jp = [
        m00 * r00 + m01 * r10 + m02 * r20, m00 * r01 + m01 * r11 + m02 * r21,
        m00 * r02 + m01 * r12 + m02 * r22,
        m10 * r00 + m11 * r10 + m12 * r20, m10 * r01 + m11 * r11 + m12 * r21,
        m10 * r02 + m11 * r12 + m12 * r22,
    ]
    # dRX = -R [p]x Jr;  Jr = I - B [w]x + C2 [w]x^2.
    JR = _rot_cols(wx, wy, wz, -B, C2)
    (j00, j01, j02, j10, j11, j12, j20, j21, j22) = JR
    g0 = [-pz * j10 + py * j20, -pz * j11 + py * j21, -pz * j12 + py * j22]
    g1 = [pz * j00 - px * j20, pz * j01 - px * j21, pz * j02 - px * j22]
    g2 = [-py * j00 + px * j10, -py * j01 + px * j11, -py * j02 + px * j12]
    drx = [[-(r00 * g0[k] + r01 * g1[k] + r02 * g2[k]) for k in range(3)],
           [-(r10 * g0[k] + r11 * g1[k] + r12 * g2[k]) for k in range(3)],
           [-(r20 * g0[k] + r21 * g1[k] + r22 * g2[k]) for k in range(3)]]
    # Jc = [ M @ dRX | M ]  -> six columns per residual row.
    jc_row0 = [m00 * drx[0][k] + m01 * drx[1][k] + m02 * drx[2][k] for k in range(3)] + [m00, m01, m02]
    jc_row1 = [m10 * drx[0][k] + m11 * drx[1][k] + m12 * drx[2][k] for k in range(3)] + [m10, m11, m12]
    jp_row0, jp_row1 = jp[:3], jp[3:]

    # Robust IRLS weights on the unweighted residual (matches
    # residuals_and_jacobians), then freeze masks fold into the blocks.
    sq = ru * ru + rv * rv
    w_r = robust_weight(sq, robust_loss, robust_scale) * w_obs
    sw = jnp.sqrt(jnp.maximum(w_r, 0.0))
    ru_w = ru * sw
    rv_w = rv * sw
    swc = sw * cam_free
    swp = sw * pt_free
    a = [c * swc for c in jc_row0]
    b = [c * swc for c in jc_row1]
    p0 = [c * swp for c in jp_row0]
    p1 = [c * swp for c in jp_row1]

    # Camera payload: vec(Jc^T Jc) (36) then -Jc^T r (6).
    cam_rows = [a[i] * a[j] + b[i] * b[j] for i in range(6) for j in range(6)]
    cam_rows += [-(a[i] * ru_w + b[i] * rv_w) for i in range(6)]
    # W = Jc^T Jp, row-major 6x3 = 18 rows, feature-major.
    w_rows = [a[i] * p0[j] + b[i] * p1[j] for i in range(6) for j in range(3)]
    # Point payload: sym(Jp^T Jp) (00,01,02,11,12,22) then -Jp^T r.
    yp_rows = [
        p0[0] * p0[0] + p1[0] * p1[0], p0[0] * p0[1] + p1[0] * p1[1],
        p0[0] * p0[2] + p1[0] * p1[2], p0[1] * p0[1] + p1[1] * p1[1],
        p0[1] * p0[2] + p1[1] * p1[2], p0[2] * p0[2] + p1[2] * p1[2],
    ]
    yp_rows += [-(p0[j] * ru_w + p1[j] * rv_w) for j in range(3)]
    return cam_rows, w_rows, yp_rows


def _pad_rows(rows, total, like):
    rows = rows + [jnp.zeros_like(like)] * (total - len(rows))
    return jnp.concatenate(rows, axis=0)


def _fused_ne_kernel(robust_loss, robust_scale, ids_ref, pts_ref, static_ref,
                     camt_ref, intrt_ref, zf_ref, w_out_ref, yp_out_ref,
                     camred_ref, acc_ref):
    """One observation tile with in-kernel camera handling (C <= _MAX_CAMS):
    camera/intrinsic rows are gathered by the paged VPU dynamic-gather
    (_paged_take — fp32-exact, no C-proportional MXU cost) and the camera
    payload is reduced via the [C, T] one-hot straight into the [48, C]
    VMEM accumulator — it never touches HBM. See _ne_tile_rows for the
    math."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    C = acc_ref.shape[1]
    T = ids_ref.shape[1]
    ids = ids_ref[:]                                           # [1, T]
    onehot_t = (ids == jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)).astype(jnp.bfloat16)
    if T % 128 == 0:
        cams = _paged_take(camt_ref[:], ids)                   # [8, T]
        intr = _paged_take(intrt_ref[:], ids)                  # [8, T]
    else:
        # Small/ragged tiles (O < 1024 problems): single-vreg dynamic-gather
        # needs 128-lane chunks, so fall back to the one-hot MXU gather —
        # C is small in this regime and the dot is cheap.
        cams = _dot_split(camt_ref[:, :C], onehot_t, (((1,), (0,)), ((), ())))
        intr = _dot_split(intrt_ref[:, :C], onehot_t, (((1,), (0,)), ((), ())))
    cam_rows, w_rows, yp_rows = _ne_tile_rows(
        robust_loss, robust_scale, cams, intr, pts_ref[:], static_ref[:],
        zf=zf_ref[0, 0],
    )
    like = cam_rows[0]
    payload_t = _pad_rows(cam_rows, _CAMRED_COLS, like)        # [48, T]
    acc_ref[:] += _dot_split(payload_t, onehot_t, (((1,), (1,)), ((), ())))  # [48, C]

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        camred_ref[:] = acc_ref[:]

    w_out_ref[:] = _pad_rows(w_rows, _W_COLS, like)
    yp_out_ref[:] = _pad_rows(yp_rows, _YP_COLS, like)


def _fused_ne_kernel_big(robust_loss, robust_scale, pts_ref, static_ref,
                         cams_ref, intr_ref, zf_ref, w_out_ref, yp_out_ref,
                         cam_out_ref):
    """Large-C variant: no [C, T] one-hot fits in VMEM past ~2048 cameras,
    so camera/intrinsic rows arrive PRE-GATHERED per observation (an XLA
    gather outside the kernel — gathers parallelize fine on TPU; it is the
    scatter-ADD that serializes) and the camera payload is emitted
    feature-major [48, O] for the caller's camera-sorted scatter-free
    reduction (ba/core._cam_reduce_sorted). C never appears in a kernel
    shape, so this lowers identically at C = 10^4 or 10^6."""
    cam_rows, w_rows, yp_rows = _ne_tile_rows(
        robust_loss, robust_scale, cams_ref[:], intr_ref[:], pts_ref[:],
        static_ref[:], zf=zf_ref[0, 0],
    )
    like = cam_rows[0]
    cam_out_ref[:] = _pad_rows(cam_rows, _CAMRED_COLS, like)
    w_out_ref[:] = _pad_rows(w_rows, _W_COLS, like)
    yp_out_ref[:] = _pad_rows(yp_rows, _YP_COLS, like)


@partial(jax.jit, static_argnames=("num_cameras", "robust_loss", "robust_scale", "interpret"))
def fused_ne_payloads(
    obs_cam: jnp.ndarray,        # [O] int32
    pts_t: jnp.ndarray,          # [4, O] feature-major point xyz (per iteration)
    static_t: jnp.ndarray,       # [8, O] feature-major uv/w/cam_free/pt_free (per solve)
    cam_tab: jnp.ndarray,        # [C, 8] rvec(3) tvec(3) pad
    intr_tab: jnp.ndarray,       # [C, 8]
    num_cameras: int,
    robust_loss: str,
    robust_scale: float,
    z_floor: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Returns (W_t [24,O], Yp_t [16,O], cam_red [C,48]) — see _fused_ne_kernel.

    Everything stays feature-major ([rows, obs]); callers build static_t once
    per solve (it is LM-iteration-invariant) and only refresh pts_t per
    iteration. W_t's first 18 rows feed schur_coupling_matvec directly.
    z_floor (scalar): near-plane depth gate applied in-kernel at the current
    parameters (None = no gate).
    """
    O = obs_cam.shape[0]
    C = num_cameras
    # VMEM budget: the kernel holds ~150 [1,T] scalar rows (each padded to 8
    # sublanes), the [C,T] one-hot (scatter only — the gathers are paged
    # VPU dynamic-gathers now, which freed ~1/3 of the old budget), and the
    # [48,C] accumulator. T=512 at C=4096: ~8.5MB (one-hot 4MB + scalar
    # rows 2.4MB + acc/out 1.6MB + tables 0.5MB).
    T = 1024 if C <= 512 else 512
    T = min(T, O)
    assert O % T == 0, "observation capacity must be a multiple of the tile"
    Cp = -(-C // 128) * 128                  # paged-gather table width
    grid = (O // T,)
    kern = partial(_fused_ne_kernel, robust_loss, robust_scale)
    w_t, yp_t, camred_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PTS_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATIC_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_W_COLS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_YP_COLS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CAMRED_COLS, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_W_COLS, O), jnp.float32),
            jax.ShapeDtypeStruct((_YP_COLS, O), jnp.float32),
            jax.ShapeDtypeStruct((_CAMRED_COLS, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_CAMRED_COLS, C), jnp.float32)],
        interpret=interpret,
    )(
        obs_cam.astype(jnp.int32)[None, :],
        pts_t,
        static_t,
        jnp.zeros((8, Cp), cam_tab.dtype).at[:, :C].set(cam_tab.T),
        jnp.zeros((8, Cp), intr_tab.dtype).at[:, :C].set(intr_tab.T),
        jnp.full((1, 1), -jnp.inf, jnp.float32) if z_floor is None
        else jnp.asarray(z_floor, jnp.float32).reshape(1, 1),
    )
    return w_t, yp_t, camred_t.T


@partial(jax.jit, static_argnames=("robust_loss", "robust_scale", "interpret"))
def fused_ne_payloads_big(
    pts_t: jnp.ndarray,          # [4, O] feature-major point xyz (per iteration)
    static_t: jnp.ndarray,       # [8, O] feature-major uv/w/cam_free/pt_free (per solve)
    cams_t: jnp.ndarray,         # [8, O] PRE-GATHERED camera rows (rvec+tvec+pad)
    intr_t: jnp.ndarray,         # [8, O] pre-gathered intrinsics
    robust_loss: str,
    robust_scale: float,
    z_floor: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Large-C fused NE: returns (W_t [24,O], Yp_t [16,O], cam_payload [48,O]).

    The camera payload is per-OBSERVATION (feature-major); the caller
    reduces it to [C, 48] with the camera-sorted scatter-free reduction
    (ba/core._cam_reduce_sorted). No kernel shape depends on C, so this
    serves C = 4k..16k+ where the one-hot variant's [C, T] tile cannot fit
    in VMEM (VERDICT r2 weak #3)."""
    O = pts_t.shape[1]
    T = min(1024, O)
    assert O % T == 0, "observation capacity must be a multiple of the tile"
    kern = partial(_fused_ne_kernel_big, robust_loss, robust_scale)
    w_t, yp_t, cam_t = pl.pallas_call(
        kern,
        grid=(O // T,),
        in_specs=[
            pl.BlockSpec((_PTS_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATIC_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_W_COLS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_YP_COLS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CAMRED_COLS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_W_COLS, O), jnp.float32),
            jax.ShapeDtypeStruct((_YP_COLS, O), jnp.float32),
            jax.ShapeDtypeStruct((_CAMRED_COLS, O), jnp.float32),
        ],
        interpret=interpret,
    )(pts_t, static_t, cams_t, intr_t,
      jnp.full((1, 1), -jnp.inf, jnp.float32) if z_floor is None
      else jnp.asarray(z_floor, jnp.float32).reshape(1, 1))
    return w_t, yp_t, cam_t


def _cost_accumulate(c, w, step, out_ref, acc_ref):
    """Shared cost-kernel epilogue: lane-group partial sums into the [8,128]
    accumulator (row 0 = cost, row 1 = weight), emitted on the last step.
    A per-tile [*, 1] output column would violate the Pallas output-block
    rule (last dim must be 128-divisible or equal the array's); a single
    [8, 128] block sidesteps it and keeps 128 partial lanes per row, which
    also bounds the fp32 accumulation depth to O/128 per lane."""
    T = c.shape[1]

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cs = sum(c[:, k * 128:(k + 1) * 128] for k in range(T // 128))   # [1,128]
    ws = sum(w[:, k * 128:(k + 1) * 128] for k in range(T // 128))
    acc_ref[0:1, :] += cs
    acc_ref[1:2, :] += ws

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _cost_kernel(robust_loss, robust_scale, ids_ref, pts_ref, static_ref,
                 camt_ref, intrt_ref, zf_ref, out_ref, acc_ref):
    """Robustified cost + weight sums (VERDICT r4 next #4: the XLA
    compute_cost was [O,8] row-gather bound — 38 ms at O=1M for ~3 ms of
    math). Cameras/intrinsics arrive via the paged VPU dynamic-gather; the
    near-plane z-gate folds in (no separate _obs_depths pass)."""
    from sfm_tpu.geometry.losses import robust_cost

    ids = ids_ref[:]
    cams = _paged_take(camt_ref[:], ids)
    intr = _paged_take(intrt_ref[:], ids)
    st = static_ref[:]
    ru, rv, xc2 = _project_rows(cams, intr, pts_ref[:], st)[:3]
    w = jnp.where(xc2 > zf_ref[0, 0], st[2:3], 0.0)
    c = robust_cost(ru * ru + rv * rv, robust_loss, robust_scale) * w
    _cost_accumulate(c, w, pl.program_id(0), out_ref, acc_ref)


def _cost_kernel_big(robust_loss, robust_scale, pts_ref, static_ref,
                     cams_ref, intr_ref, zf_ref, out_ref, acc_ref):
    """Large-C cost tile: cameras pre-gathered per observation (XLA), same
    math as _cost_kernel."""
    from sfm_tpu.geometry.losses import robust_cost

    st = static_ref[:]
    ru, rv, xc2 = _project_rows(cams_ref[:], intr_ref[:], pts_ref[:], st)[:3]
    w = jnp.where(xc2 > zf_ref[0, 0], st[2:3], 0.0)
    c = robust_cost(ru * ru + rv * rv, robust_loss, robust_scale) * w
    _cost_accumulate(c, w, pl.program_id(0), out_ref, acc_ref)


@partial(jax.jit, static_argnames=("num_cameras", "robust_loss", "robust_scale", "interpret"))
def fused_cost_sums(
    obs_cam: jnp.ndarray,        # [O] int32
    pts_t: jnp.ndarray,          # [4, O] feature-major gathered point xyz
    static_t: jnp.ndarray,       # [8, O] rows: u, v, w, ...
    cam_tab: jnp.ndarray,        # [C, 8]
    intr_tab: jnp.ndarray,       # [C, 8]
    num_cameras: int,
    robust_loss: str,
    robust_scale: float,
    z_floor: jnp.ndarray | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum_o cost_o * w_o, sum_o w_o) with the z-floor gate in-kernel."""
    O = obs_cam.shape[0]
    C = num_cameras
    Cp = -(-C // 128) * 128
    T = min(2048, O)
    assert O % T == 0 and T % 128 == 0
    kern = partial(_cost_kernel, robust_loss, robust_scale)
    out = pl.pallas_call(
        kern,
        grid=(O // T,),
        in_specs=[
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PTS_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATIC_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(
        obs_cam.astype(jnp.int32)[None, :], pts_t, static_t,
        jnp.zeros((8, Cp), jnp.float32).at[:, :C].set(cam_tab.T),
        jnp.zeros((8, Cp), jnp.float32).at[:, :C].set(intr_tab.T),
        jnp.full((1, 1), -jnp.inf, jnp.float32) if z_floor is None
        else jnp.asarray(z_floor, jnp.float32).reshape(1, 1),
    )
    return jnp.sum(out[0]), jnp.sum(out[1])


@partial(jax.jit, static_argnames=("robust_loss", "robust_scale", "interpret"))
def fused_cost_sums_big(
    pts_t: jnp.ndarray,          # [4, O]
    static_t: jnp.ndarray,       # [8, O]
    cams_t: jnp.ndarray,         # [8, O] pre-gathered
    intr_t: jnp.ndarray,         # [8, O] pre-gathered
    robust_loss: str,
    robust_scale: float,
    z_floor: jnp.ndarray | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Large-C variant of fused_cost_sums (no C-shaped VMEM block)."""
    O = pts_t.shape[1]
    T = min(2048, O)
    assert O % T == 0 and T % 128 == 0
    kern = partial(_cost_kernel_big, robust_loss, robust_scale)
    out = pl.pallas_call(
        kern,
        grid=(O // T,),
        in_specs=[
            pl.BlockSpec((_PTS_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATIC_ROWS, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(pts_t, static_t, cams_t, intr_t,
      jnp.full((1, 1), -jnp.inf, jnp.float32) if z_floor is None
      else jnp.asarray(z_floor, jnp.float32).reshape(1, 1))
    return jnp.sum(out[0]), jnp.sum(out[1])


def _whw_kernel(ids_ref, w_ref, hinv_ref, out_ref, acc_ref):
    """Per-observation W_o Hpp_inv_{p(o)} W_o^T (6x6) formed in VMEM and
    reduced straight into the per-camera accumulator — the Schur-Jacobi
    preconditioner's [O,6,6] einsum never touches HBM. Feature-major layout
    like the fused NE kernel."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    T = ids_ref.shape[1]
    C = acc_ref.shape[1]
    ids = ids_ref[:]
    onehot_t = (ids == jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)).astype(jnp.float32)
    w = w_ref[:]                                     # [18, T], row i*3+k = W[i, k]
    hv = hinv_ref[:]                                 # [9, T],  row k*3+l = Hinv[k, l]

    def W(i, k):
        return w[i * 3 + k:i * 3 + k + 1, :]

    def Hi(k, l):
        return hv[k * 3 + l:k * 3 + l + 1, :]

    # u[i, l] = sum_k W[i,k] Hinv[k,l];  whw[i, j] = sum_l u[i,l] W[j,l]
    u = [[W(i, 0) * Hi(0, l) + W(i, 1) * Hi(1, l) + W(i, 2) * Hi(2, l) for l in range(3)]
         for i in range(6)]
    rows = [u[i][0] * W(j, 0) + u[i][1] * W(j, 1) + u[i][2] * W(j, 2)
            for i in range(6) for j in range(6)]
    payload_t = jnp.concatenate(rows, axis=0)        # [36, T]
    acc_ref[:] += _dot_split(payload_t, onehot_t, (((1,), (1,)), ((), ())))

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("num_cameras", "interpret"))
def whw_cam_reduce(W_t: jnp.ndarray, hinv_t: jnp.ndarray, obs_cam: jnp.ndarray,
                   num_cameras: int, interpret: bool = False) -> jnp.ndarray:
    """sum_o onehot(cam_o) * vec(W_o Hinv_o W_o^T): [18,O],[9,O] -> [C,36].

    Inputs are feature-major (shared with schur_coupling_matvec, so the BA
    core builds them once per LM iteration)."""
    O = W_t.shape[1]
    C = num_cameras
    if C > _MAX_CAMS or (jax.default_backend() == "cpu" and not interpret):
        WHW = jnp.einsum(
            "oij,ojk,olk->oil", W_t.T.reshape(O, 6, 3),
            hinv_t.T.reshape(O, 3, 3), W_t.T.reshape(O, 6, 3),
        ).reshape(O, 36)
        return jax.ops.segment_sum(WHW, obs_cam, C)
    T = min(_TILE_OBS if C <= 1024 else 512, O)
    assert O % T == 0
    out_t = pl.pallas_call(
        _whw_kernel,
        grid=(O // T,),
        in_specs=[
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((36, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((36, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((36, C), jnp.float32)],
        interpret=interpret,
    )(obs_cam.astype(jnp.int32)[None, :], W_t, hinv_t)
    return out_t.T


def _whw_kernel_big(w_ref, hinv_ref, out_ref):
    """Large-C WHW: per-observation vec(W_o Hinv_o W_o^T) emitted
    feature-major [36, O] for the caller's camera-sorted reduction — no
    [C, T] one-hot, no C in any kernel shape."""
    w = w_ref[:]                                     # [18, T]
    hv = hinv_ref[:]                                 # [9, T]

    def W(i, k):
        return w[i * 3 + k:i * 3 + k + 1, :]

    def Hi(k, l):
        return hv[k * 3 + l:k * 3 + l + 1, :]

    u = [[W(i, 0) * Hi(0, l) + W(i, 1) * Hi(1, l) + W(i, 2) * Hi(2, l) for l in range(3)]
         for i in range(6)]
    rows = [u[i][0] * W(j, 0) + u[i][1] * W(j, 1) + u[i][2] * W(j, 2)
            for i in range(6) for j in range(6)]
    out_ref[:] = jnp.concatenate(rows, axis=0)       # [36, T]


@partial(jax.jit, static_argnames=("interpret",))
def whw_payloads_big(W_t: jnp.ndarray, hinv_t: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """vec(W_o Hinv_o W_o^T) per observation: [18,O],[9,O] -> [36,O]."""
    O = W_t.shape[1]
    T = min(_TILE_OBS, O)
    assert O % T == 0
    return pl.pallas_call(
        _whw_kernel_big,
        grid=(O // T,),
        in_specs=[
            pl.BlockSpec((18, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((36, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((36, O), jnp.float32),
        interpret=interpret,
    )(W_t, hinv_t)


def _cam_segsum_kernel(ids_ref, vals_ref, out_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ids = ids_ref[:]                                   # [T, 1] int32
    C = acc_ref.shape[0]
    onehot = (ids == jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], C), 1)).astype(
        jnp.bfloat16
    )                                                   # [T, C], registers only
    # 3-term bf16 split of `vals` against the exact 0/1 indicator — see
    # _dot_split (here the indicator is the LEFT operand).
    rem = vals_ref[:]
    total = None
    for _ in range(3):
        hi = rem.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            onehot, hi, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        total = part if total is None else total + part
        rem = rem - hi.astype(jnp.float32)
    acc_ref[:] += total

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("num_cameras", "interpret"))
def cam_segment_sum(values: jnp.ndarray, obs_cam: jnp.ndarray, num_cameras: int,
                    interpret: bool = False) -> jnp.ndarray:
    """segment_sum(values, obs_cam, num_cameras) for values [O, K] -> [C, K].

    MXU one-hot reduction (see module docstring). Padding rows must carry
    zero values (the BA problem's obs_w=0 contract already guarantees their
    payloads vanish). Falls back to jax.ops.segment_sum beyond the camera
    cap or off-TPU.
    """
    O, K = values.shape
    if num_cameras > _MAX_CAMS or (jax.default_backend() == "cpu" and not interpret):
        return jax.ops.segment_sum(values, obs_cam, num_cameras)

    # [T, C] one-hot + compare intermediates bound the tile: T=512 at
    # C=4096 hit the 16MB scoped-vmem stack limit (17.29M measured).
    T = min(_TILE_OBS if num_cameras <= 1024
            else (512 if num_cameras <= 2048 else 256), O)
    pad = (-O) % T
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
        obs_cam = jnp.pad(obs_cam, (0, pad), constant_values=0)
    ids2d = obs_cam.astype(jnp.int32)[:, None]

    grid = (values.shape[0] // T,)
    return pl.pallas_call(
        _cam_segsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_cameras, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_cameras, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((num_cameras, K), jnp.float32)],
        interpret=interpret,
    )(ids2d, values.astype(jnp.float32))


# ---- Fused Schur-complement coupling matvec --------------------------------


def _matvec_lo_width(num_cameras: int) -> int:
    """LO-level width of the two-level camera indexing (power of two)."""
    L = 128
    while L < min(num_cameras, 512):
        L *= 2
    return L


def matvec_tile(num_cameras: int, point_align: int) -> int:
    """Observation-tile choice for the fused coupling matvec.

    Must be a multiple of the problem's point_align (so no point segment
    straddles a tile), large enough for MXU efficiency, and small enough
    that the VMEM residents fit: the [8, Cp] fp32 v table (paged-gather
    source), the [L,T] lo one-hot and [n_hi*24, T] staging of the
    two-level SCATTER, the [T,T] local-point pair indicator, and the
    [n_hi*24, L] blocked accumulator. The gather side is the paged VPU
    dynamic-gather (_paged_take) — no [C, T] one-hot, no gather staging.
    Returns 0 when the kernel is not usable; past _MV_MAX_CAMS the big
    variant (matvec_tile_big) applies instead.
    """
    if point_align <= 0 or num_cameras > _MV_MAX_CAMS:
        return 0
    L = _matvec_lo_width(num_cameras)
    n_hi = -(-num_cameras // L)
    T = max(512, point_align)
    while T >= max(256, point_align):
        vmem = (12 * T * T + 4 * L * T + 100 * n_hi * T
                + 250 * n_hi * L + (1 << 20))
        if vmem <= 14 * (1 << 20):
            return T
        T //= 2
        if point_align and T % point_align:
            break
    return 0


def matvec_tile_big(point_align: int) -> int:
    """Tile for the large-C coupling matvec (no [C,T] one-hot — camera
    gather/reduce happen outside the kernel, so only the [T,T] point
    indicator bounds the tile)."""
    if point_align <= 0:
        return 0
    T = max(512, point_align)
    if 16 * T * T + (1 << 20) > 14 * (1 << 20):
        return 0
    return T


def _schur_coupling_kernel(ids_ref, lids_ref, lidc_ref, w_ref, hinv_ref, v8_ref,
                           out_ref, acc_ref):
    """One observation tile of the implicit Schur coupling term
    (W Hpp^-1 W^T v), the hot op of every PCG iteration (ba/core.py):

      u_o = W_o^T v[cam_o];  g_p = sum_{o in p} u_o;  h_p = Hpp_p^-1 g_p
      out_c = sum_{o in c} W_o h_{p(o)}

    The camera GATHER (v[cam_o]) is a paged VPU dynamic-gather from the
    [8, Cp] fp32 table resident in VMEM (_paged_take): exact, and free of
    the 24*C*T-MAC one-hot dot that made the gather half of this kernel
    scale linearly in C (C=4096: 92 ms/matvec, 16x the C=1024 per-obs
    rate). The SCATTER half stays a TWO-LEVEL one-hot MXU reduction
    (cam = hi * L + lo, L <= 512): bf16-split y hi-masked into an
    [n_hi*24, T] block stack, one [*, T] @ [T, L] dot into the blocked
    VMEM accumulator — scatter-add has no VPU dual (Mosaic has no
    dynamic_scatter), so the MXU indicator dot remains the right tool, at
    half the previous total MAC count.

    The point segment-sum-broadcast is one dot against the [T,T] TILE-LOCAL
    same-point PAIR indicator P[o1,o2] = [point(o1) == point(o2)] — valid
    because BAProblem.point_align certifies no point segment straddles a
    tile boundary. Feature-major layout throughout ([rows, obs]; a [T,k]
    column layout pads every per-observation scalar to 128 lanes).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    T = ids_ref.shape[1]
    L = acc_ref.shape[1]
    n_hi = acc_ref.shape[0] // 24
    ids = ids_ref[:]
    ids_lo = jax.lax.bitwise_and(ids, L - 1)
    ids_hi = jax.lax.shift_right_logical(ids, L.bit_length() - 1)
    oh_lo = (ids_lo == jax.lax.broadcasted_iota(jnp.int32, (L, T), 0)).astype(jnp.bfloat16)
    masks = [(ids_hi == h) for h in range(n_hi)]                           # [1, T]

    v_obs = _paged_take(v8_ref[:], ids)                                    # [8, T] exact
    w = w_ref[:]                                                           # [18, T]

    def W(i, k):
        return w[i * 3 + k:i * 3 + k + 1, :]

    u_rows = [sum(W(i, k) * v_obs[i:i + 1, :] for i in range(6)) for k in range(3)]
    u = jnp.concatenate(u_rows + [jnp.zeros((5, T), jnp.float32)], axis=0)  # [8, T]

    # Same-point pair indicator (symmetric): broadcast compare of the
    # column-form lids against the row form — VPU only, no iota dot.
    P_pair = (lidc_ref[:] == lids_ref[:]).astype(jnp.bfloat16)             # [T, T]
    g_obs = _dot_split(u, P_pair, (((1,), (0,)), ((), ())))                # [8, T]

    hv = hinv_ref[:]                                                       # [9, T]
    h = [sum(hv[k * 3 + l:k * 3 + l + 1, :] * g_obs[l:l + 1, :] for l in range(3))
         for k in range(3)]
    y_rows = [sum(W(i, k) * h[k] for k in range(3)) for i in range(6)]
    y = jnp.concatenate(y_rows + [jnp.zeros((2, T), jnp.float32)], axis=0)  # [8, T]

    # Scatter to cameras, two-level: bf16-split y, hi-mask each block (the
    # 0/1 mask keeps terms bf16-exact), one lo-level dot into the blocked
    # accumulator. The wrapper sums the split terms per (hi, lo) column.
    t0 = y.astype(jnp.bfloat16)
    r1 = y - t0.astype(jnp.float32)
    t1 = r1.astype(jnp.bfloat16)
    t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
    y24 = jnp.concatenate([t0, t1, t2], axis=0)                            # [24, T]
    Y = jnp.concatenate([y24 * masks[h].astype(jnp.bfloat16) for h in range(n_hi)],
                        axis=0)                                            # [n_hi*24, T]
    acc_ref[:] += jax.lax.dot_general(Y, oh_lo, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _schur_coupling_kernel_big(lids_ref, lidc_ref, w_ref, hinv_ref, vobs_ref,
                               y_out_ref):
    """Large-C coupling matvec tile: v arrives PRE-GATHERED per observation
    ([8, T] feature-major — an XLA gather of v[obs_cam] outside the kernel)
    and y_o = W_o Hpp^-1_{p(o)} (segsum_p W^T v) goes out per observation
    for the caller's camera-sorted reduction. The point-side segment
    sum-broadcast uses the [T, T] tile-local same-point pair indicator
    (valid by the point_align certificate — see _schur_coupling_kernel);
    no kernel shape depends on C."""
    T = lids_ref.shape[1]
    v_obs = vobs_ref[:]                                                    # [8, T]
    w = w_ref[:]                                                           # [18, T]

    def W(i, k):
        return w[i * 3 + k:i * 3 + k + 1, :]

    u_rows = [sum(W(i, k) * v_obs[i:i + 1, :] for i in range(6)) for k in range(3)]
    u = jnp.concatenate(u_rows + [jnp.zeros((5, T), jnp.float32)], axis=0)  # [8, T]

    P_pair = (lidc_ref[:] == lids_ref[:]).astype(jnp.bfloat16)             # [T, T]
    g_obs = _dot_split(u, P_pair, (((1,), (0,)), ((), ())))                # [8, T]

    hv = hinv_ref[:]                                                       # [9, T]
    h = [sum(hv[k * 3 + l:k * 3 + l + 1, :] * g_obs[l:l + 1, :] for l in range(3))
         for k in range(3)]
    y_rows = [sum(W(i, k) * h[k] for k in range(3)) for i in range(6)]
    y_out_ref[:] = jnp.concatenate(y_rows + [jnp.zeros((2, T), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def schur_coupling_payloads_big(lids: jnp.ndarray, w_t: jnp.ndarray,
                                hinv_t: jnp.ndarray, v_obs_t: jnp.ndarray,
                                tile: int, interpret: bool = False) -> jnp.ndarray:
    """Per-observation y_o of the coupling term, feature-major [8, O].

    v_obs_t [8, O]: rows of v gathered per observation (v.T[:, obs_cam],
    zero-padded to 8 rows). The caller camera-reduces y to [C, 6]."""
    O = w_t.shape[1]
    return pl.pallas_call(
        _schur_coupling_kernel_big,
        grid=(O // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, O), jnp.float32),
        interpret=interpret,
    )(lids.astype(jnp.int32)[None, :], lids.astype(jnp.int32)[:, None],
      w_t, hinv_t, v_obs_t)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def schur_coupling_matvec(obs_cam: jnp.ndarray, lids: jnp.ndarray, w_t: jnp.ndarray,
                          hinv_t: jnp.ndarray, v: jnp.ndarray, tile: int,
                          interpret: bool = False) -> jnp.ndarray:
    """(W Hpp^-1 W^T) v for v [C,6] -> [C,6].

    Feature-major inputs: w_t [18,O] (row i*3+k = W[i,k]), hinv_t [9,O]
    (row k*3+l = Hpp_inv[k,l], gathered per observation), obs_cam [O],
    lids [O] (point id minus the first point id of the observation's tile).
    tile must come from matvec_tile() and divide O.

    v enters as a plain [8, Cp] fp32 table (zero-padded rows/columns): the
    in-kernel paged dynamic-gather is exact, so the gather-side 3-term bf16
    split (and its reduce_precision anti-folding guard) no longer exists.
    The SCATTER half still leaves in the blocked [n_hi*24, L] bf16-split
    layout; the term-sum happens here.
    """
    O = w_t.shape[1]
    C = v.shape[0]
    L = _matvec_lo_width(C)
    Cp = -(-C // L) * L
    n_hi = Cp // L
    v8 = jnp.zeros((8, Cp), jnp.float32).at[:6, :C].set(v.T)
    acc = pl.pallas_call(
        _schur_coupling_kernel,
        grid=(O // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_hi * 24, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_hi * 24, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_hi * 24, L), jnp.float32)],
        interpret=interpret,
    )(obs_cam.astype(jnp.int32)[None, :], lids.astype(jnp.int32)[None, :],
      lids.astype(jnp.int32)[:, None], w_t, hinv_t, v8)
    out = acc.reshape(n_hi, 3, 8, L).sum(axis=1).transpose(1, 0, 2).reshape(8, Cp)
    return out[:6, :C].T
