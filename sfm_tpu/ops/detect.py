"""Scale-space keypoint detection (SURVEY.md §2.2).

Reference-class realization: C++ per-pixel scans with early-exit branches.
TPU-native realization: the whole octave is processed as dense array ops —
3x3x3 extremum test via reduce_window, candidate selection via top_k on the
response map (static budget), subpixel refinement as a vmapped batch of 3x3
linear solves. No data-dependent shapes anywhere: rejected candidates carry
valid=False through the padding contract.

Matches the Lowe/VLFeat semantics: contrast threshold on the interpolated
DoG value, edge rejection by the 2x2 spatial Hessian trace/det ratio,
orientation from a Gaussian-weighted 36-bin gradient histogram with
parabolic peak interpolation.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.interp import bilinear_sample_stack


class OctaveKeypoints(NamedTuple):
    """Per-octave candidate keypoints, octave-local coordinates. All [K]."""

    x: jnp.ndarray          # octave pixels (continuous)
    y: jnp.ndarray
    level: jnp.ndarray      # refined continuous DoG level index
    sigma: jnp.ndarray      # octave-relative blur
    response: jnp.ndarray   # |interpolated DoG contrast|
    angle: jnp.ndarray      # radians, filled by assign_orientation
    valid: jnp.ndarray      # bool


def extrema_score_map(dog: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """Score map [Ld, H, W]: |dog| where a voxel is the max/min of its 26
    neighbours and clears the pre-threshold, else 0. This is the jnp
    reference for the fused Pallas kernel (sfm_tpu/kernels/dog_extrema.py).
    """
    Ld, H, W = dog.shape
    wmax = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    wmin = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME")
    pre_thresh = 0.8 * cfg.contrast_threshold / cfg.scales_per_octave
    is_ext = ((dog >= wmax) & (dog > pre_thresh)) | ((dog <= wmin) & (dog < -pre_thresh))

    # Interior only: need a full 3x3x3 neighbourhood and a refinement margin.
    lev = jnp.arange(Ld).reshape(Ld, 1, 1)
    yy = jnp.arange(H).reshape(1, H, 1)
    xx = jnp.arange(W).reshape(1, 1, W)
    margin = 5
    interior = (
        (lev >= 1) & (lev <= Ld - 2)
        & (yy >= margin) & (yy < H - margin)
        & (xx >= margin) & (xx < W - margin)
    )
    return jnp.where(is_ext & interior, jnp.abs(dog), 0.0)


def select_candidates(score: jnp.ndarray, k_budget: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a score map: (flat indices [K], scores [K]).

    On TPU, approx_max_k is the native single-pass top-k; exact recall does
    not matter for candidate selection — missed near-threshold extrema are
    the weakest candidates anyway.
    """
    flat = score.reshape(-1)
    if jax.default_backend() == "tpu":
        vals, idx = jax.lax.approx_max_k(flat, k_budget, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(flat, k_budget)
    return idx, vals


def find_extrema(gauss: jnp.ndarray, cfg: SiftConfig, k_budget: int, use_pallas: bool | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian stack [L, H, W] -> (flat DoG candidate indices [K], scores [K]).

    A voxel is a candidate iff it is the strict max or min of its 26
    neighbours and exceeds ~80% of the contrast threshold (the final
    threshold is applied after subpixel interpolation, like the reference
    class does). On TPU with cfg.use_pallas, the fused DoG+extrema kernel
    computes the score map in one pass over the gaussian volume.
    """
    from sfm_tpu.kernels import on_tpu

    if use_pallas is None:
        use_pallas = cfg.use_pallas
    H = gauss.shape[1]
    pre_thresh = 0.8 * cfg.contrast_threshold / cfg.scales_per_octave
    if use_pallas and on_tpu() and H % 128 == 0:
        from sfm_tpu.kernels.dog_extrema import dog_extrema_scores

        score = dog_extrema_scores(gauss, pre_thresh)
    else:
        score = extrema_score_map(gauss[1:] - gauss[:-1], cfg)
    return select_candidates(score, k_budget)


def _gather_dog_cube(gauss_flat: jnp.ndarray, H: int, W: int, l, y, x) -> jnp.ndarray:
    """3x3x3 DoG neighbourhood around DoG voxel (l, y, x), gathered from the
    GAUSSIAN stack (dog[l] = G[l+1] - G[l]) — the full DoG volume is never
    materialized on the Pallas-kernel path. Returns [..., 3, 3, 3]."""
    offs_l = jnp.arange(-1, 3)  # gaussian levels l-1 .. l+2
    offs = jnp.arange(-1, 2)
    li = (l[..., None, None, None] + offs_l.reshape(4, 1, 1))
    yi = (y[..., None, None, None] + offs.reshape(1, 3, 1))
    xi = (x[..., None, None, None] + offs.reshape(1, 1, 3))
    flat_idx = (li * H + yi) * W + xi
    g4 = gauss_flat[flat_idx]           # [..., 4, 3, 3]
    return g4[..., 1:, :, :] - g4[..., :-1, :, :]


def refine_candidates(gauss: jnp.ndarray, idx: jnp.ndarray, scores: jnp.ndarray, cfg: SiftConfig) -> OctaveKeypoints:
    """Subpixel/sublevel refinement by iterated 3D quadratic fit (SURVEY.md §2.2).

    gauss is the octave GAUSSIAN stack [L, H, W]; idx are flat indices into
    the DoG volume [L-1, H, W] (from find_extrema / the Pallas score kernel).
    Fixed iteration count; each iteration moves the integer base voxel toward
    the offset if it exceeds 0.6 (clamped to the interior), re-fits, and the
    final validity folds in convergence, contrast, and edge tests.
    """
    L, H, W = gauss.shape
    Ld = L - 1
    gauss_flat = gauss.reshape(-1)
    l = jnp.clip((idx // (H * W)).astype(jnp.int32), 1, Ld - 2)
    rem = idx % (H * W)
    y = jnp.clip((rem // W).astype(jnp.int32), 2, H - 3)
    x = jnp.clip((rem % W).astype(jnp.int32), 2, W - 3)
    alive = scores > 0.0

    offset = jnp.zeros((idx.shape[0], 3), dtype=jnp.float32)
    grad = jnp.zeros_like(offset)
    for _ in range(cfg.refine_iters):
        cube = _gather_dog_cube(gauss_flat, H, W, l, y, x)  # [K, 3, 3, 3] (l, y, x)
        # First derivatives (central differences on the cube).
        dl = 0.5 * (cube[:, 2, 1, 1] - cube[:, 0, 1, 1])
        dy = 0.5 * (cube[:, 1, 2, 1] - cube[:, 1, 0, 1])
        dx = 0.5 * (cube[:, 1, 1, 2] - cube[:, 1, 1, 0])
        c = cube[:, 1, 1, 1]
        dll = cube[:, 2, 1, 1] + cube[:, 0, 1, 1] - 2 * c
        dyy = cube[:, 1, 2, 1] + cube[:, 1, 0, 1] - 2 * c
        dxx = cube[:, 1, 1, 2] + cube[:, 1, 1, 0] - 2 * c
        dly = 0.25 * (cube[:, 2, 2, 1] - cube[:, 2, 0, 1] - cube[:, 0, 2, 1] + cube[:, 0, 0, 1])
        dlx = 0.25 * (cube[:, 2, 1, 2] - cube[:, 2, 1, 0] - cube[:, 0, 1, 2] + cube[:, 0, 1, 0])
        dyx = 0.25 * (cube[:, 1, 2, 2] - cube[:, 1, 2, 0] - cube[:, 1, 0, 2] + cube[:, 1, 0, 0])
        Hm = jnp.stack(
            [
                jnp.stack([dll, dly, dlx], -1),
                jnp.stack([dly, dyy, dyx], -1),
                jnp.stack([dlx, dyx, dxx], -1),
            ],
            -2,
        )  # [K, 3, 3]
        g = jnp.stack([dl, dy, dx], -1)
        # Regularized solve: H may be near-singular for rejected candidates.
        Hm = Hm + 1e-6 * jnp.eye(3)
        offset = -jnp.linalg.solve(Hm, g[..., None])[..., 0]
        offset = jnp.clip(offset, -1.5, 1.5)
        grad = g
        # Move base voxel where the fit wants to step to a neighbour.
        step = jnp.where(jnp.abs(offset) > 0.6, jnp.sign(offset).astype(jnp.int32), 0)
        l = jnp.clip(l + step[:, 0], 1, Ld - 2)
        y = jnp.clip(y + step[:, 1], 2, H - 3)
        x = jnp.clip(x + step[:, 2], 2, W - 3)

    cube = _gather_dog_cube(gauss_flat, H, W, l, y, x)
    c = cube[:, 1, 1, 1]
    contrast = c + 0.5 * jnp.sum(grad * offset, axis=-1)
    converged = jnp.max(jnp.abs(offset), axis=-1) < 1.0

    # Edge response: 2x2 spatial Hessian at the final voxel.
    dyy = cube[:, 1, 2, 1] + cube[:, 1, 0, 1] - 2 * c
    dxx = cube[:, 1, 1, 2] + cube[:, 1, 1, 0] - 2 * c
    dyx = 0.25 * (cube[:, 1, 2, 2] - cube[:, 1, 2, 0] - cube[:, 1, 0, 2] + cube[:, 1, 0, 0])
    tr = dxx + dyy
    det = dxx * dyy - dyx * dyx
    r = cfg.edge_threshold
    not_edge = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)

    good_contrast = jnp.abs(contrast) >= cfg.contrast_threshold / cfg.scales_per_octave
    valid = alive & converged & good_contrast & not_edge

    level = l.astype(jnp.float32) + offset[:, 0]
    fy = y.astype(jnp.float32) + offset[:, 1]
    fx = x.astype(jnp.float32) + offset[:, 2]
    # DoG level i sits between gaussian levels i and i+1; blur follows the
    # gaussian ladder sigma0 * 2^(level/s).
    sigma = cfg.sigma0 * jnp.exp2(level / cfg.scales_per_octave)
    return OctaveKeypoints(
        x=fx, y=fy, level=level, sigma=sigma,
        response=jnp.abs(contrast), angle=jnp.zeros_like(fx), valid=valid,
    )


# Orientation sampling lattice: 13x13 at 0.75*sigma spacing covers the
# Lowe/OpenCV window radius of 3 * 1.5 * sigma = 4.5 sigma.
_ORI_GRID_N = 13
_ORI_SPACING = 0.75
_ORI_SIGMA_W = 1.5


def assign_orientation(kps: OctaveKeypoints, dx_stack: jnp.ndarray, dy_stack: jnp.ndarray, cfg: SiftConfig) -> OctaveKeypoints:
    """Dominant gradient orientation per keypoint (SURVEY.md §2.2).

    dx_stack/dy_stack: [L, H, W] gradients of the octave's gaussian stack.
    A fixed lattice of samples (scaled by each keypoint's sigma) is gathered
    bilinearly; the 36-bin Gaussian-weighted histogram is smoothed and the
    peak interpolated parabolically. Fully batched over keypoints.
    """
    nb = cfg.num_orientation_bins
    g = jnp.arange(_ORI_GRID_N, dtype=jnp.float32) - (_ORI_GRID_N - 1) / 2.0
    uu, vv = jnp.meshgrid(g, g, indexing="xy")
    lattice = jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1) * _ORI_SPACING  # [P, 2] sigma units
    w_gauss = jnp.exp(-jnp.sum(lattice**2, -1) / (2.0 * _ORI_SIGMA_W**2))       # [P]

    # Gradient level nearest to the keypoint blur (gaussian level = dog level).
    # Sampling goes through the windowed separable-matmul path when the
    # octave is big enough (see descriptor.sample_gradients_windowed) —
    # pointwise gathers dominated the orientation stage otherwise.
    from sfm_tpu.ops.descriptor import _WIN, sample_gradients_windowed

    off_x = lattice[None, :, 0] * kps.sigma[:, None]
    off_y = lattice[None, :, 1] * kps.sigma[:, None]
    if min(dx_stack.shape[1], dx_stack.shape[2]) >= _WIN:
        gx, gy = sample_gradients_windowed(
            dx_stack, dy_stack, kps.level, kps.x, kps.y, off_x, off_y
        )
    else:
        glev = jnp.clip(jnp.round(kps.level).astype(jnp.int32), 0, dx_stack.shape[0] - 1)
        pos = jnp.stack([kps.x, kps.y], -1)[:, None, :] + jnp.stack([off_x, off_y], -1)
        lev = jnp.broadcast_to(glev[:, None], pos.shape[:2])
        gx = bilinear_sample_stack(dx_stack, lev, pos)
        gy = bilinear_sample_stack(dy_stack, lev, pos)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]

    # Soft-binned circular histogram.
    binf = (ang / (2.0 * jnp.pi) * nb) % nb
    b0 = jnp.floor(binf)
    frac = binf - b0
    bins = jnp.arange(nb, dtype=jnp.float32)
    w = mag * w_gauss[None, :]
    d0 = (bins[None, None, :] - b0[..., None]) % nb
    contrib = jnp.where(d0 == 0, 1.0 - frac[..., None], jnp.where(d0 == 1, frac[..., None], 0.0))
    hist = jnp.sum(w[..., None] * contrib, axis=1)  # [K, nb]

    # Two passes of [1, 4, 6, 4, 1]/16 circular smoothing.
    for _ in range(2):
        hist = (
            6.0 * hist
            + 4.0 * (jnp.roll(hist, 1, -1) + jnp.roll(hist, -1, -1))
            + (jnp.roll(hist, 2, -1) + jnp.roll(hist, -2, -1))
        ) / 16.0

    def peak_angle(h, peak):
        hp = jnp.take_along_axis(h, peak[:, None], 1)[:, 0]
        hl = jnp.take_along_axis(h, ((peak - 1) % nb)[:, None], 1)[:, 0]
        hr = jnp.take_along_axis(h, ((peak + 1) % nb)[:, None], 1)[:, 0]
        denom = hl - 2.0 * hp + hr
        interp = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
        angle = ((peak.astype(jnp.float32) + interp) / nb) * 2.0 * jnp.pi
        return jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle), hp

    peak1 = jnp.argmax(hist, axis=-1)
    angle1, h1 = peak_angle(hist, peak1)

    # Second orientation (Lowe's multi-orientation rule): the strongest
    # remaining LOCAL peak with height >= peak_ratio * max spawns a duplicate
    # keypoint (emitted by the caller with `angle2`/`valid2`).
    is_local_peak = (hist >= jnp.roll(hist, 1, -1)) & (hist >= jnp.roll(hist, -1, -1))
    masked = jnp.where(is_local_peak, hist, -1.0)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, hist.shape, 1) == peak1[:, None], -1.0, masked
    )
    peak2 = jnp.argmax(masked, axis=-1)
    angle2, h2 = peak_angle(hist, peak2)
    valid2 = (h2 >= cfg.orientation_peak_ratio * h1) & (jnp.take_along_axis(masked, peak2[:, None], 1)[:, 0] > 0)
    return kps._replace(angle=angle1), angle2, valid2


def detect_octave(gauss: jnp.ndarray, dx_stack: jnp.ndarray, dy_stack: jnp.ndarray, cfg: SiftConfig, k_budget: int):
    """Full single-octave detection: extrema -> refine -> orientation.

    gauss: octave GAUSSIAN stack [L, H, W]. Returns (keypoints, second
    orientation angles [K], second-orientation validity [K]) — the caller
    duplicates rows for multi-orientation keypoints (Lowe's 0.8-peak rule)."""
    idx, scores = find_extrema(gauss, cfg, k_budget)
    kps = refine_candidates(gauss, idx, scores, cfg)
    return assign_orientation(kps, dx_stack, dy_stack, cfg)
