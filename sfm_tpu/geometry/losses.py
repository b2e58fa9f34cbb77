"""Robust losses for bundle adjustment (SURVEY.md §2.1).

Ceres-class rho(s) formulation where s is the squared residual norm. BA uses
the IRLS weight w(s) = rho'(s): residuals and Jacobian blocks are scaled by
sqrt(w) before forming normal equations, which is exact for the Gauss-Newton
approximation of a robustified cost.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(s: jnp.ndarray, scale: float) -> jnp.ndarray:
    """rho(s) for Huber with outlier threshold `scale` (pixels); s = ||r||^2."""
    d2 = scale * scale
    return jnp.where(s <= d2, s, 2.0 * scale * jnp.sqrt(jnp.maximum(s, 1e-20)) - d2)


def cauchy(s: jnp.ndarray, scale: float) -> jnp.ndarray:
    d2 = scale * scale
    return d2 * jnp.log1p(s / d2)


def robust_weight(s: jnp.ndarray, loss: str, scale: float) -> jnp.ndarray:
    """IRLS weight rho'(s). loss is config-static so the branch is at trace time."""
    if loss == "none":
        return jnp.ones_like(s)
    if loss == "huber":
        d2 = scale * scale
        return jnp.where(s <= d2, 1.0, scale / jnp.sqrt(jnp.maximum(s, 1e-20)))
    if loss == "cauchy":
        d2 = scale * scale
        return 1.0 / (1.0 + s / d2)
    raise ValueError(f"unknown robust loss: {loss}")


def robust_cost(s: jnp.ndarray, loss: str, scale: float) -> jnp.ndarray:
    if loss == "none":
        return s
    if loss == "huber":
        return huber(s, scale)
    if loss == "cauchy":
        return cauchy(s, scale)
    raise ValueError(f"unknown robust loss: {loss}")
