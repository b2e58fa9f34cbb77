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


def guided_match_pair(
    da: jnp.ndarray, va: jnp.ndarray, xy_a: jnp.ndarray,
    db: jnp.ndarray, vb: jnp.ndarray, xy_b: jnp.ndarray,
    E: jnp.ndarray, intr_a: jnp.ndarray, intr_b: jnp.ndarray,
    cfg: MatchConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Guided matching (SURVEY.md §2.4): re-match inside the epipolar band.

    After two-view verification, candidates are restricted to pairs whose
    Sampson error under the verified E is inside a narrow band, and the
    ratio test is relaxed — recovering correct matches that failed the
    global ratio test under repetitive structure. The epipolar gate is two
    outer-product matmuls (MXU), not a per-pair loop.
    """
    from sfm_tpu.geometry.cameras import pixel_to_camera

    BIG = 1e9
    x1 = pixel_to_camera(xy_a, intr_a)
    x2 = pixel_to_camera(xy_b, intr_b)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)  # [N1, 3]
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)  # [N2, 3]
    l1 = x1h @ E.T                                             # E x1   [N1, 3]
    l2 = x2h @ E                                               # E^T x2 [N2, 3]
    num = (l1 @ x2h.T) ** 2                                    # [N1, N2]
    den = (l1[:, 0] ** 2 + l1[:, 1] ** 2)[:, None] + (l2[:, 0] ** 2 + l2[:, 1] ** 2)[None, :]
    sampson = num / jnp.maximum(den, 1e-12)
    f = (intr_a[0] + intr_a[1] + intr_b[0] + intr_b[1]) * 0.25
    gate = sampson < (cfg.guided_band_px / f) ** 2

    d = descriptor_distances(da, db, cfg.use_bf16_matmul)
    d = jnp.where(gate & va[:, None] & vb[None, :], d, BIG)

    neg2, idx2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg2[:, 0], -neg2[:, 1]
    nn = idx2[:, 0]
    # Relaxed ratio; accept unambiguous singles (d2 masked out) too.
    ok = (d1 < BIG / 2) & ((d1 < cfg.guided_ratio**2 * d2) | (d2 > BIG / 2)) & va
    nn_back = jnp.argmin(d, axis=0)
    ok = ok & (nn_back[nn] == jnp.arange(d.shape[0]))

    score = jnp.where(ok, -d1, -BIG)
    M = cfg.max_matches
    top_scores, idx_a = jax.lax.top_k(score, min(M, score.shape[0]))
    idx_b = nn[idx_a]
    valid = top_scores > -BIG / 2
    if M > idx_a.shape[0]:
        pad = M - idx_a.shape[0]
        idx_a = jnp.pad(idx_a, (0, pad))
        idx_b = jnp.pad(idx_b, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return idx_a, idx_b, valid


@partial(jax.jit, static_argnames=("cfg",))
def guided_match_block(
    desc_i, valid_i, xy_i, desc_j, valid_j, xy_j, E, intr_i, intr_j, cfg: MatchConfig
) -> PairMatches:
    idx_a, idx_b, ok = jax.vmap(
        lambda a, vaa, xa, b, vbb, xb, e, ia, ib: guided_match_pair(a, vaa, xa, b, vbb, xb, e, ia, ib, cfg)
    )(desc_i, valid_i, xy_i, desc_j, valid_j, xy_j, E, intr_i, intr_j)
    return PairMatches(idx_i=idx_a, idx_j=idx_b, valid=ok)


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
