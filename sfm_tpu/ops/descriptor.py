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


def compute_descriptors(
    kps: OctaveKeypoints,
    dx_stack: jnp.ndarray,
    dy_stack: jnp.ndarray,
    cfg: SiftConfig,
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
