"""Fused DoG + 26-neighbour extrema Pallas kernel (SURVEY.md §2.2) — native
component #1's hot loop.

The XLA path materializes the DoG stack plus two reduce_window volumes in
HBM (4+ full-volume round trips). This kernel streams the GAUSSIAN stack
through VMEM in row tiles (manual halo DMA), computes the level differences
and the separable 3x3x3 max/min in registers, and writes only the sparse
score map — one read of the gaussian volume, one write of the score volume.

Layout: input padded to [L, H+16, W] (8 halo rows each side — Mosaic DMA
slices must be 8-sublane aligned; only the innermost of those rows is a real
neighbourhood halo); grid over H tiles; each step DMAs [L, TILE_H+16, W]
into scratch. x-axis neighbourhoods use wrap-around rolls — wrapped values
land outside the 5-pixel interior margin and are masked exactly as in the
jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfm_tpu.config import SiftConfig

_TILE_H = 128
_NEG = -1e30
_POS = 1e30


def _kernel(gauss_hbm, score_ref, scratch, sem, *, L, W, pre_thresh, margin_lo, num_tiles, H):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # Halo DMA: rows [i*TILE_H, i*TILE_H + TILE_H + 16) of the padded input
    # (8-row halo each side keeps the slice 8-sublane aligned for Mosaic).
    dma = pltpu.make_async_copy(
        gauss_hbm.at[b, :, pl.ds(i * _TILE_H, _TILE_H + 16), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    g = scratch[:]                                  # [L, TILE_H+16, W]
    dog = g[1:] - g[:-1]                            # [Ld, TILE_H+16, W]

    def shift_x(a, s):
        return pltpu.roll(a, s % W, axis=2)  # pltpu.roll requires s >= 0

    # Separable window extrema: x then y then level.
    mx_x = jnp.maximum(jnp.maximum(shift_x(dog, 1), dog), shift_x(dog, -1))
    mn_x = jnp.minimum(jnp.minimum(shift_x(dog, 1), dog), shift_x(dog, -1))
    # y-shifts come free from the halo rows (slicing).
    Ld = L - 1
    T = _TILE_H
    # Center rows live at offset 8 in the haloed tile.
    mx_xy = jnp.maximum(jnp.maximum(mx_x[:, 7:7 + T], mx_x[:, 8:8 + T]), mx_x[:, 9:9 + T])
    mn_xy = jnp.minimum(jnp.minimum(mn_x[:, 7:7 + T], mn_x[:, 8:8 + T]), mn_x[:, 9:9 + T])
    # level-shifts by padding with +-inf sentinels at the stack ends.
    neg = jnp.full((1, T, W), _NEG, mx_xy.dtype)
    pos = jnp.full((1, T, W), _POS, mn_xy.dtype)
    mx_lo = jnp.concatenate([neg, mx_xy[:-1]], axis=0)
    mx_hi = jnp.concatenate([mx_xy[1:], neg], axis=0)
    wmax = jnp.maximum(jnp.maximum(mx_lo, mx_xy), mx_hi)
    mn_lo = jnp.concatenate([pos, mn_xy[:-1]], axis=0)
    mn_hi = jnp.concatenate([mn_xy[1:], pos], axis=0)
    wmin = jnp.minimum(jnp.minimum(mn_lo, mn_xy), mn_hi)

    center = dog[:, 8:8 + T]
    is_ext = ((center >= wmax) & (center > pre_thresh)) | ((center <= wmin) & (center < -pre_thresh))

    # Interior mask (identical to the jnp reference): level in [1, Ld-2],
    # global row/col at least `margin_lo` from every border.
    del b  # batch only selects the DMA source and the output block
    lev = jax.lax.broadcasted_iota(jnp.int32, (Ld, T, W), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (Ld, T, W), 1) + i * _TILE_H
    col = jax.lax.broadcasted_iota(jnp.int32, (Ld, T, W), 2)
    interior = (
        (lev >= 1) & (lev <= Ld - 2)
        & (row >= margin_lo) & (row < H - margin_lo)
        & (col >= margin_lo) & (col < W - margin_lo)
    )
    score_ref[0] = jnp.where(is_ext & interior, jnp.abs(center), 0.0)


@functools.partial(jax.jit, static_argnames=("pre_thresh", "interpret"))
def dog_extrema_scores_batch(gauss: jnp.ndarray, pre_thresh: float, interpret: bool = False) -> jnp.ndarray:
    """Gaussian octave stacks [B, L, H, W] -> extrema score maps [B, L-1, H, W].

    The batch is a grid dimension (NOT vmap: ANY-memory-space inputs cannot
    be batched by vmap). H must be a multiple of 128 (canvas sizes are).
    """
    B, L, H, W = gauss.shape
    assert H % _TILE_H == 0, f"H={H} must be a multiple of {_TILE_H}"
    Ld = L - 1
    num_tiles = H // _TILE_H

    # Eight edge-value halo rows on each side (DMA alignment; border rows
    # fall outside the interior margin anyway).
    pad_lo = jnp.repeat(gauss[:, :, :1], 8, axis=2)
    pad_hi = jnp.repeat(gauss[:, :, -1:], 8, axis=2)
    padded = jnp.concatenate([pad_lo, gauss, pad_hi], axis=2)  # [B, L, H+16, W]

    kernel = functools.partial(
        _kernel, L=L, W=W, pre_thresh=pre_thresh, margin_lo=5, num_tiles=num_tiles, H=H
    )
    return pl.pallas_call(
        kernel,
        grid=(B, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, Ld, _TILE_H, W), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ld, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, _TILE_H + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * B * Ld * H * W, bytes_accessed=B * (L + Ld) * H * W * 4, transcendentals=0
        ),
        interpret=interpret,
    )(padded)


def dog_extrema_scores(gauss: jnp.ndarray, pre_thresh: float, interpret: bool = False) -> jnp.ndarray:
    """Single-stack convenience wrapper: [L, H, W] -> [L-1, H, W]."""
    return dog_extrema_scores_batch(gauss[None], pre_thresh, interpret=interpret)[0]
