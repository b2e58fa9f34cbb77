"""Gaussian pyramid: matmul-Toeplitz blur vs scipy reference (SURVEY.md §2.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

scipy_ndimage = pytest.importorskip("scipy.ndimage")

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.pyramid import blur, build_pyramid


def test_blur_matches_scipy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 128, 128)).astype(np.float32)
    for sigma in [0.8, 1.6, 3.2]:
        ours = np.asarray(blur(jnp.asarray(img), sigma))
        ref = np.stack([
            scipy_ndimage.gaussian_filter(img[b].astype(np.float64), sigma, mode="mirror", truncate=4.0)
            for b in range(2)
        ])
        assert np.abs(ours - ref).max() < 2e-4, sigma


def test_pyramid_shapes_and_blur_ladder():
    cfg = SiftConfig(num_octaves=3, scales_per_octave=3, image_max_dim=128)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, 128, 128)).astype(np.float32)
    octs = build_pyramid(jnp.asarray(img), cfg)
    assert len(octs) == 3
    assert octs[0].shape == (2, 6, 128, 128)
    assert octs[1].shape == (2, 6, 64, 64)
    # Level i of octave o equals a direct blur of the input with the total
    # sigma (consistency of the scale-space ladder), checked at octave 0.
    import math
    for i in [1, 3, 5]:
        target = cfg.sigma0 * 2 ** (i / 3)
        delta = math.sqrt(max(target**2 - cfg.assumed_blur**2, 0.0))
        direct = np.asarray(blur(jnp.asarray(img), delta))
        np.testing.assert_allclose(np.asarray(octs[0][:, i]), direct, atol=3e-4)


def test_pyramid_energy_decreases():
    # Blur can only smooth: per-level total variation is non-increasing.
    cfg = SiftConfig(num_octaves=2, image_max_dim=64)
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    octs = build_pyramid(jnp.asarray(img), cfg)
    tv = [float(np.abs(np.diff(np.asarray(octs[0][0, i]), axis=0)).mean()) for i in range(6)]
    assert all(tv[i + 1] < tv[i] + 1e-6 for i in range(5))
