"""Batched fixed-size RANSAC engine (SURVEY.md §2.4, §7 hard part 4).

Reference-class realization: sequential adaptive RANSAC (sample, solve,
score, update the iteration bound N = log(1-p)/log(1-w^s), early-exit).
TPU-native re-design: a STATIC batch of B hypotheses is sampled, solved
(vmapped minimal solver), and scored (one [B, M] error matrix) in a single
jit region — no data-dependent trip count, no host round-trips. B is sized
from the config confidence target for the worst planned inlier ratio; with
B = 1024 and 8-point samples, inlier ratios down to ~40% reach >99.99%
confidence, matching the adaptive loop's guarantee without its control flow.

Sampling uses the Gumbel-top-k trick: per-hypothesis uniform keys masked by
match validity give k distinct valid indices with no rejection loop.
Deterministic per-pair PRNG keys make the whole pipeline replayable
(SURVEY.md §5.2 determinism-over-race-detection).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray        # best model (solver-shaped)
    inliers: jnp.ndarray      # [M] bool
    num_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray           # scalar bool: enough inliers


def sample_minimal_sets(key: jax.Array, mask: jnp.ndarray, num_hypotheses: int, k: int) -> jnp.ndarray:
    """[B, k] distinct indices into the valid entries of mask (Gumbel top-k).

    If fewer than k valid entries exist, indices repeat into invalid slots;
    callers guard via the inlier threshold.
    """
    M = mask.shape[0]
    u = jax.random.uniform(key, (num_hypotheses, M))
    u = jnp.where(mask[None, :], u, -1.0)
    _, idx = jax.lax.top_k(u, k)
    return idx


def ransac(
    key: jax.Array,
    x1: jnp.ndarray,            # [M, ...] first data array (e.g. points/pixels)
    x2: jnp.ndarray,            # [M, ...] second data array
    mask: jnp.ndarray,          # [M] bool
    solver: Callable,           # ([k,...],[k,...]) -> model
    error_fn: Callable,         # (model, [M,...], [M,...]) -> [M] squared errors
    sample_size: int,
    num_hypotheses: int,
    threshold_sq: float,
    min_inliers: int,
) -> RansacResult:
    """Generic batched RANSAC. All shapes static; returns best model + inliers.

    x1/x2 carry any per-datum trailing shape — 2D-2D correspondences for
    E/F/H, 3D-2D for absolute pose (PnP).
    """
    idx = sample_minimal_sets(key, mask, num_hypotheses, sample_size)
    s1 = x1[idx]  # [B, k, ...]
    s2 = x2[idx]

    models = jax.vmap(solver)(s1, s2)
    errs = jax.vmap(lambda m: error_fn(m, x1, x2))(models)      # [B, M]
    inl = (errs < threshold_sq) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    # MSAC-style score: truncated error, breaks ties toward tighter fits.
    score = jnp.sum(jnp.where(inl, errs, threshold_sq), axis=-1)
    best = jnp.argmin(jnp.where(counts > 0, score, jnp.inf))

    best_model = jax.tree.map(lambda m: m[best], models)
    best_inl = inl[best]
    n = counts[best]
    return RansacResult(model=best_model, inliers=best_inl, num_inliers=n, ok=n >= min_inliers)


def irls_refit(
    model: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    fit_fn: Callable,           # ([M,2],[M,2],w[M]) -> model (weighted least squares)
    error_fn: Callable,
    threshold_sq: float,
    iters: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local optimization: iteratively refit on current inliers (weighted).

    The TPU analog of LO-RANSAC's inner refinement: a static number of
    refit/rescore rounds, each a dense op over all M matches. The inlier
    threshold anneals from 4x down to 1x across rounds (LO-RANSAC's
    threshold multiplier schedule) so a mediocre minimal-sample model can
    pull in the truth's consensus set instead of locking onto its own.
    """
    best_model = model
    best_count = jnp.sum((error_fn(model, x1, x2) < threshold_sq) & mask)
    for it in range(iters):
        anneal = 4.0 ** (1.0 - it / max(iters - 1, 1))  # 4 -> 1
        errs = error_fn(model, x1, x2)
        w = ((errs < threshold_sq * anneal) & mask).astype(x1.dtype)
        model = fit_fn(x1, x2, w)
        count = jnp.sum((error_fn(model, x1, x2) < threshold_sq) & mask)
        better = count >= best_count
        best_model = jax.tree.map(lambda n, o: jnp.where(better, n, o), model, best_model)
        best_count = jnp.where(better, count, best_count)
    errs = error_fn(best_model, x1, x2)
    return best_model, (errs < threshold_sq) & mask
