"""Gaussian scale-space pyramid (SURVEY.md §2.2).

Reference-class realization: C++ per-pixel loops (VLFeat) or CUDA separable
blurs (SiftGPU). TPU-native: separable depthwise convolutions via
lax.conv_general_dilated over a batch of images — XLA maps these onto the
vector units and fuses the level chain. All level counts/kernel widths are
static (derived from config), so one compile serves the whole run.

Octave o, level i has absolute blur sigma(o, i) = sigma0 * 2^(o + i/s);
levels are produced incrementally (blur the previous level by the sigma
delta), and each next octave starts by 2x-decimating level s of the previous
one, exactly the Lowe recipe.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig


def gaussian_kernel1d(sigma: float) -> jnp.ndarray:
    """Odd-width normalized Gaussian; width = 2*ceil(4*sigma)+1 (static)."""
    radius = max(1, int(math.ceil(4.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def blur(images: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of images [B, H, W] with REFLECT padding.

    Reflect (not zero) padding avoids fake DoG extrema on image borders.
    """
    if sigma <= 0:
        return images
    k = gaussian_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    x = images[:, None, :, :]  # [B, C=1, H, W]
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)), mode="reflect")
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn)
    return x[:, 0]


def downsample2(images: jnp.ndarray) -> jnp.ndarray:
    """2x decimation (every other pixel), the scale-space octave step."""
    return images[:, ::2, ::2]


def build_pyramid(images: jnp.ndarray, cfg: SiftConfig) -> list[jnp.ndarray]:
    """images [B, H, W] float32 in [0,1] -> list over octaves of [B, L, H_o, W_o]
    Gaussian stacks, L = scales_per_octave + 3.

    The raw image is assumed to carry cfg.assumed_blur; the first level is
    brought up to cfg.sigma0 by the blur delta (Lowe initialization).
    """
    s = cfg.scales_per_octave
    num_levels = s + 3
    k = 2.0 ** (1.0 / s)

    base = images
    base_sigma = cfg.assumed_blur
    if cfg.upsample_first_octave:
        B, H, W = base.shape
        base = jax.image.resize(base, (B, H * 2, W * 2), method="bilinear")
        base_sigma = cfg.assumed_blur * 2.0

    delta0 = math.sqrt(max(cfg.sigma0**2 - base_sigma**2, 0.01))
    level0 = blur(base, delta0)

    octaves = []
    current = level0
    for _o in range(cfg.num_octaves):
        levels = [current]
        sigma_prev = cfg.sigma0
        for i in range(1, num_levels):
            sigma_i = cfg.sigma0 * (k**i)
            delta = math.sqrt(sigma_i**2 - sigma_prev**2)
            levels.append(blur(levels[-1], delta))
            sigma_prev = sigma_i
        stack = jnp.stack(levels, axis=1)  # [B, L, H, W]
        octaves.append(stack)
        # Next octave seeds from the level with blur 2*sigma0 (index s).
        current = downsample2(stack[:, s])
    return octaves


def pyramid_gradients(stack: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of a Gaussian stack [B, L, H, W] -> (dx, dy)."""
    dx = 0.5 * (jnp.roll(stack, -1, axis=-1) - jnp.roll(stack, 1, axis=-1))
    dy = 0.5 * (jnp.roll(stack, -1, axis=-2) - jnp.roll(stack, 1, axis=-2))
    return dx, dy


@partial(jax.jit, static_argnames=("cfg",))
def dog_stacks(images: jnp.ndarray, cfg: SiftConfig) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """Convenience: (gaussian octaves, DoG octaves [B, L-1, H, W])."""
    octs = build_pyramid(images, cfg)
    dogs = [o[:, 1:] - o[:, :-1] for o in octs]
    return octs, dogs
