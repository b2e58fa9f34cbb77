"""Pairwise descriptor matching (SURVEY.md §2.3) — native component #2.

Reference-class realization: C++ brute-force/FLANN nearest-neighbour search.
TPU-native re-design: the 128-D L2 NN search lowers to a dense Gram matmul
on the MXU — distances d(i,j) = |a_i|^2 + |b_j|^2 - 2 a_i.b_j, with the
cross term computed in bf16 (descriptors are unit-norm, so bf16's ~3
decimal digits cost < 1e-2 in distance — far below the 0.8 ratio margin)
and reduced in fp32. Top-2 per row (for Lowe's ratio test) plus an argmin
per column (mutual check) come straight off the distance tile. One jit
serves a whole [P]-pair block: vmap over pairs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import MatchConfig


class PairMatches(NamedTuple):
    """Correspondences for a block of image pairs, fixed budget M."""

    idx_i: jnp.ndarray   # [P, M] keypoint index in image i
    idx_j: jnp.ndarray   # [P, M] keypoint index in image j
    valid: jnp.ndarray   # [P, M] bool

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)


def descriptor_distances(da: jnp.ndarray, db: jnp.ndarray, use_bf16: bool) -> jnp.ndarray:
    """Squared L2 distances [Na, Nb] between unit-norm descriptor sets."""
    if use_bf16:
        gram = jnp.dot(
            da.astype(jnp.bfloat16), db.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    else:
        gram = jnp.dot(da, db.T, preferred_element_type=jnp.float32)
    # Unit-norm descriptors: |a|^2 = |b|^2 = 1 for valid rows; padded rows are
    # zero so their distance is 2.0 (harmless — masked below anyway).
    na = jnp.sum(da * da, axis=-1, keepdims=True)
    nb = jnp.sum(db * db, axis=-1, keepdims=True)
    return jnp.maximum(na + nb.T - 2.0 * gram, 0.0)


def match_pair(
    da: jnp.ndarray, va: jnp.ndarray, db: jnp.ndarray, vb: jnp.ndarray, cfg: MatchConfig
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Match one descriptor pair: (idx_a [M], idx_b [M], valid [M]).

    Ratio test on the two nearest neighbours, optional mutual (cross-check),
    results compacted to the static budget cfg.max_matches ordered by
    distance.
    """
    BIG = 1e9
    d = descriptor_distances(da, db, cfg.use_bf16_matmul)
    d = jnp.where(va[:, None] & vb[None, :], d, BIG)

    # Top-2 per row for the ratio test.
    neg2, idx2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg2[:, 0], -neg2[:, 1]
    nn = idx2[:, 0]
    ok = (d1 < BIG / 2) & (d1 < cfg.ratio_threshold**2 * d2) & va

    if cfg.mutual_check:
        nn_back = jnp.argmin(d, axis=0)  # best a for each b
        ok = ok & (nn_back[nn] == jnp.arange(d.shape[0]))

    # Compact to the match budget, best (smallest) distances first.
    score = jnp.where(ok, -d1, -BIG)
    M = cfg.max_matches
    top_scores, idx_a = jax.lax.top_k(score, min(M, score.shape[0]))
    idx_b = nn[idx_a]
    valid = top_scores > -BIG / 2
    if M > idx_a.shape[0]:  # budget exceeds keypoint count: pad
        pad = M - idx_a.shape[0]
        idx_a = jnp.pad(idx_a, (0, pad))
        idx_b = jnp.pad(idx_b, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return idx_a, idx_b, valid


@partial(jax.jit, static_argnames=("cfg",))
def match_block(
    desc_i: jnp.ndarray, valid_i: jnp.ndarray,
    desc_j: jnp.ndarray, valid_j: jnp.ndarray,
    cfg: MatchConfig,
) -> PairMatches:
    """Match a block of pairs: desc_i/desc_j [P, N, 128], valid [P, N].

    On TPU with cfg.use_pallas, the fused match+top-2 kernel replaces the
    materialized distance matrix (sfm_tpu/kernels/match_topk.py); the jnp
    path is the reference implementation and the CPU fallback.
    """
    from sfm_tpu.kernels import on_tpu

    if cfg.use_pallas and on_tpu() and desc_i.shape[1] % 256 == 0:
        from sfm_tpu.kernels.match_topk import match_pair_pallas

        pair_fn = lambda a, vaa, b, vbb: match_pair_pallas(a, vaa, b, vbb, cfg)
    else:
        pair_fn = lambda a, vaa, b, vbb: match_pair(a, vaa, b, vbb, cfg)
    idx_a, idx_b, ok = jax.vmap(pair_fn)(desc_i, valid_i, desc_j, valid_j)
    return PairMatches(idx_i=idx_a, idx_j=idx_b, valid=ok)
