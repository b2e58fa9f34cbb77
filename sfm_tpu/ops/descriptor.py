"""SIFT 128-D descriptors (SURVEY.md §2.2).

Reference-class realization: C++ per-pixel loops over a rotated circular
window with trilinear histogram accumulation. TPU-native re-design: every
keypoint samples the SAME fixed 16x16 lattice in its rotated, sigma-scaled
descriptor frame. Because the lattice is axis-aligned with the 4x4 cell
grid, the spatial bilinear weights are compile-time constants — a [256, 16]
matrix — and the whole histogram accumulation becomes one einsum on the MXU:

    desc[k, cell, ori] = sum_p W_spatial[p, cell] * (mag * w_gauss)[k, p] * W_ori[k, p, ori]

Only the 8-bin orientation soft-binning depends on data. This replaces the
reference's scatter-heavy inner loop with dense matmul work, which is the
whole game on TPU.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.detect import OctaveKeypoints
from sfm_tpu.ops.interp import bilinear_sample_stack

_NUM_CELLS = 4        # 4x4 spatial cells
_NUM_ORI = 8          # orientation bins
_SAMPLES = 16         # 16x16 sample lattice
_CELL_SIGMA = 3.0     # cell width in units of keypoint sigma (Lowe)
_DESC_CLIP = 0.2


def _lattice_and_weights() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static sample lattice (cell units), Gaussian window, spatial weights.

    Lattice: 16x16 points at 0.25-cell spacing spanning [-2, 2) cells,
    offset so samples sit at cell-relative positions matching trilinear
    accumulation. Spatial weight of sample p to cell (cx, cy) is the
    standard bilinear hat max(0, 1 - |u - center|).
    """
    step = _NUM_CELLS / _SAMPLES  # 0.25 cells
    coords = (np.arange(_SAMPLES) + 0.5) * step - _NUM_CELLS / 2.0  # [-1.875 .. 1.875]
    uu, vv = np.meshgrid(coords, coords, indexing="xy")
    lattice = np.stack([uu.reshape(-1), vv.reshape(-1)], -1)  # [P, 2] cell units

    # Gaussian window sigma = half descriptor width (Lowe).
    w_gauss = np.exp(-np.sum(lattice**2, -1) / (2.0 * (_NUM_CELLS / 2.0) ** 2))

    centers = np.arange(_NUM_CELLS) - (_NUM_CELLS - 1) / 2.0  # [-1.5, -.5, .5, 1.5]
    wx = np.maximum(0.0, 1.0 - np.abs(lattice[:, 0:1] - centers[None, :]))  # [P, 4]
    wy = np.maximum(0.0, 1.0 - np.abs(lattice[:, 1:2] - centers[None, :]))
    w_spatial = (wy[:, :, None] * wx[:, None, :]).reshape(-1, _NUM_CELLS * _NUM_CELLS)  # [P, 16]
    return lattice.astype(np.float32), w_gauss.astype(np.float32), w_spatial.astype(np.float32)


_LATTICE, _W_GAUSS, _W_SPATIAL = _lattice_and_weights()


_WIN = 64  # descriptor sampling window (covers ~8*sigma at sigma <= 3.9)


def sample_gradients_windowed(dx_stack, dy_stack, level, x, y, off_x, off_y):
    """Sample both gradient channels at per-keypoint lattice offsets via
    contiguous windows + separable bilinear MATMULS instead of pointwise
    gathers.

    The XLA pointwise-gather formulation (bilinear_sample_stack) issues
    K*P*2*4 scattered loads and dominated the whole feature stage. Here each
    keypoint pulls one contiguous [64, 64] window per gradient channel
    (vmapped dynamic_slice — contiguous, DMA-friendly), and bilinear
    interpolation becomes hat-function weight matrices contracted on the
    MXU: sample[k,p] = wy[k,p,:] @ win[k] @ wx[k,p,:]. Exactly equal to
    4-tap bilinear for any patch inside the window (equality-tested); the
    window covers descriptor patches up to sigma ~3.9, beyond the
    per-octave maximum. off_x/off_y: [K, P] lattice offsets in pixels.
    """
    L, H, Wd = dx_stack.shape
    half = _WIN // 2
    glev = jnp.clip(jnp.round(level).astype(jnp.int32), 0, L - 1)
    x0 = jnp.clip(jnp.round(x).astype(jnp.int32) - half, 0, max(Wd - _WIN, 0))
    y0 = jnp.clip(jnp.round(y).astype(jnp.int32) - half, 0, max(H - _WIN, 0))

    def slice_one(stack, lev, yy, xx):
        return jax.lax.dynamic_slice(stack, (lev, yy, xx), (1, _WIN, _WIN))[0]

    win_gx = jax.vmap(lambda l, yy, xx: slice_one(dx_stack, l, yy, xx))(glev, y0, x0)
    win_gy = jax.vmap(lambda l, yy, xx: slice_one(dy_stack, l, yy, xx))(glev, y0, x0)

    # Lattice positions relative to each window, clamped inside it (matches
    # the gather path's border clamp whenever the patch fits the window).
    px = jnp.clip(x[:, None] + off_x - x0[:, None].astype(jnp.float32), 0.0, _WIN - 1.000001)
    py = jnp.clip(y[:, None] + off_y - y0[:, None].astype(jnp.float32), 0.0, _WIN - 1.000001)
    grid = jnp.arange(_WIN, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - grid))   # [K, P, 64]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - grid))   # [K, P, 64]

    def samp(win):
        rows = jnp.einsum("kpr,krc->kpc", wy, win, preferred_element_type=jnp.float32)
        return jnp.sum(rows * wx, axis=-1)                        # [K, P]

    return samp(win_gx), samp(win_gy)


def compute_descriptors(
    kps: OctaveKeypoints,
    dx_stack: jnp.ndarray,
    dy_stack: jnp.ndarray,
    cfg: SiftConfig,
    use_windows: bool = True,
) -> jnp.ndarray:
    """Descriptors for one octave's keypoints. Returns [K, 128] float32.

    dx_stack/dy_stack: [L, H, W] gradients of the octave gaussian stack.
    """
    lattice = jnp.asarray(_LATTICE)
    w_gauss = jnp.asarray(_W_GAUSS)
    w_spatial = jnp.asarray(_W_SPATIAL)

    cos_t = jnp.cos(kps.angle)
    sin_t = jnp.sin(kps.angle)
    # Rotate the lattice into image coords, scale by cell width (3 sigma).
    scale = kps.sigma * _CELL_SIGMA
    du = lattice[None, :, 0] * scale[:, None]
    dv = lattice[None, :, 1] * scale[:, None]
    off_x = cos_t[:, None] * du - sin_t[:, None] * dv
    off_y = sin_t[:, None] * du + cos_t[:, None] * dv

    if use_windows and min(dx_stack.shape[1], dx_stack.shape[2]) >= _WIN:
        gx, gy = sample_gradients_windowed(
            dx_stack, dy_stack, kps.level, kps.x, kps.y, off_x, off_y
        )
    else:
        pos = jnp.stack([kps.x[:, None] + off_x, kps.y[:, None] + off_y], -1)  # [K, P, 2]
        glev = jnp.clip(jnp.round(kps.level).astype(jnp.int32), 0, dx_stack.shape[0] - 1)
        lev = jnp.broadcast_to(glev[:, None], pos.shape[:2])
        gx = bilinear_sample_stack(dx_stack, lev, pos)
        gy = bilinear_sample_stack(dy_stack, lev, pos)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12) * w_gauss[None, :]
    ang = jnp.arctan2(gy, gx) - kps.angle[:, None]

    # Soft orientation binning into 8 circular bins.
    binf = (ang / (2.0 * jnp.pi) * _NUM_ORI) % _NUM_ORI
    b0 = jnp.floor(binf)
    frac = binf - b0
    bins = jnp.arange(_NUM_ORI, dtype=jnp.float32)
    d0 = (bins[None, None, :] - b0[..., None]) % _NUM_ORI
    w_ori = jnp.where(d0 == 0, 1.0 - frac[..., None], jnp.where(d0 == 1, frac[..., None], 0.0))
    contrib = mag[..., None] * w_ori  # [K, P, 8]

    # The MXU step: [P, 16]^T x [K, P, 8] -> [K, 16, 8].
    desc = jnp.einsum("pc,kpo->kco", w_spatial, contrib, preferred_element_type=jnp.float32)
    desc = desc.reshape(desc.shape[0], _NUM_CELLS * _NUM_CELLS * _NUM_ORI)

    # Normalize -> clip 0.2 -> renormalize (Lowe illumination invariance).
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.minimum(desc, _DESC_CLIP)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    if cfg.root_sift:
        desc = jnp.sqrt(desc / jnp.maximum(jnp.sum(desc, -1, keepdims=True), 1e-8))
    return desc
