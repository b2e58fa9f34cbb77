"""Fused descriptor match + top-2 Pallas kernel (SURVEY.md §2.3) — the
pipeline's headline hot op (BASELINE metric: pairs matched/sec/chip).

The jnp path materializes the full [N1, N2] squared-distance matrix in HBM,
then runs top_k over it — 64MB of HBM traffic per 4096^2 pair. This kernel
tiles rows through VMEM, computes the bf16 Gram block on the MXU, reduces it
to (d1, d2, argmin) per row in-register, and writes only 3 numbers per
keypoint: HBM traffic drops from O(N1*N2) to O(N1 + N2).

The mutual cross-check reuses the same kernel with arguments swapped (the
reverse direction needs only the argmin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256
_BIG = 1e9


def _kernel(a_ref, bt_ref, vb_ref, d1_ref, d2_ref, idx_ref):
    # a_ref: [TILE_M, 128] bf16 row tile; bt_ref: [128, N2] bf16 (resident,
    # pre-transposed so the MXU sees a standard [M,K]x[K,N] contraction —
    # Mosaic rejects bf16 dots contracting on the rhs minor dim);
    # vb_ref: [1, N2] f32 column validity.
    # precision=DEFAULT: the package pins fp32 matmuls to 'highest' globally,
    # but bf16 operands + fp32 contract precision is rejected by Mosaic (and
    # meaningless — the MXU is natively bf16 here).
    gram = jnp.dot(
        a_ref[:], bt_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # MXU
    a32 = a_ref[:].astype(jnp.float32)
    b32 = bt_ref[:].astype(jnp.float32)
    na = jnp.sum(a32 * a32, axis=1, keepdims=True)           # [TILE_M, 1]
    nb = jnp.sum(b32 * b32, axis=0)[None, :]                 # [1, N2]
    dist = na + nb - 2.0 * gram
    # where (not additive) masking: invalid/padded columns may hold garbage
    # (even NaN) and must not propagate into the row minima.
    dist = jnp.where(vb_ref[:] > 0, jnp.maximum(dist, 0.0), _BIG)

    m1 = jnp.min(dist, axis=1, keepdims=True)                # [TILE_M, 1]
    i1 = jnp.argmin(dist, axis=1).astype(jnp.int32)          # [TILE_M]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(cols == i1[:, None], _BIG, dist)
    m2 = jnp.min(dist2, axis=1, keepdims=True)

    d1_ref[:] = m1
    d2_ref[:] = m2
    idx_ref[:] = i1[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_topk2(da: jnp.ndarray, db: jnp.ndarray, vb: jnp.ndarray, interpret: bool = False):
    """Top-2 nearest neighbours of each row of da among valid rows of db.

    da: [N1, 128], db: [N2, 128] (any float dtype; cast to bf16 for the MXU),
    vb: [N2] bool. Returns (d1 [N1], d2 [N1], idx [N1] int32).
    N1 must be a multiple of 256; N2 a multiple of 128 (budget configs are).
    """
    N1, D = da.shape
    N2 = db.shape[0]
    assert N1 % _TILE_M == 0, f"N1={N1} must be a multiple of {_TILE_M}"
    assert N2 % 128 == 0, f"N2={N2} must be a multiple of 128"

    grid = (N1 // _TILE_M,)
    d1, d2, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N1, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N1 * N2 * D, bytes_accessed=(N1 + N2) * D * 2 + N1 * 12, transcendentals=0
        ),
        interpret=interpret,
    )(da.astype(jnp.bfloat16), db.astype(jnp.bfloat16).T, vb.astype(jnp.float32)[None, :])
    return d1[:, 0], d2[:, 0], idx[:, 0]


def match_pair_pallas(da, va, db, vb, cfg, interpret: bool = False):
    """Drop-in replacement for ops.match.match_pair using the fused kernel."""
    d1, d2, nn = match_topk2(da, db, vb, interpret=interpret)
    _, _, nn_back = match_topk2(db, da, va, interpret=interpret)

    ok = (d1 < _BIG / 2) & (d1 < cfg.ratio_threshold**2 * d2) & va
    if cfg.mutual_check:
        ok = ok & (nn_back[nn] == jnp.arange(da.shape[0]))

    score = jnp.where(ok, -d1, -_BIG)
    M = cfg.max_matches
    top_scores, idx_a = jax.lax.top_k(score, min(M, score.shape[0]))
    idx_b = nn[idx_a]
    valid = top_scores > -_BIG / 2
    if M > idx_a.shape[0]:
        pad = M - idx_a.shape[0]
        idx_a = jnp.pad(idx_a, (0, pad))
        idx_b = jnp.pad(idx_b, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return idx_a, idx_b, valid
