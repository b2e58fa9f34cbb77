"""Windowed separable-matmul gradient sampling == pointwise bilinear gathers
(SURVEY.md §2.2 descriptor kernel; VERDICT r1 item 10)."""

import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.descriptor import compute_descriptors, sample_gradients_windowed
from sfm_tpu.ops.detect import OctaveKeypoints
from sfm_tpu.ops.interp import bilinear_sample_stack


def _fixture(K=160, L=5, H=256, W=256, seed=0):
    rng = np.random.default_rng(seed)
    dx = jnp.asarray(rng.normal(size=(L, H, W)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(L, H, W)).astype(np.float32))
    kps = OctaveKeypoints(
        x=jnp.asarray(rng.uniform(36, W - 36, K).astype(np.float32)),
        y=jnp.asarray(rng.uniform(36, H - 36, K).astype(np.float32)),
        level=jnp.asarray(rng.integers(1, L - 1, K).astype(np.float32)),
        sigma=jnp.asarray(rng.uniform(1.6, 3.2, K).astype(np.float32)),
        angle=jnp.asarray(rng.uniform(-3.1, 3.1, K).astype(np.float32)),
        response=jnp.ones(K, jnp.float32),
        valid=jnp.ones(K, bool),
    )
    return kps, dx, dy


def test_windowed_sampling_equals_gather():
    kps, dx, dy = _fixture()
    rng = np.random.default_rng(1)
    P = 64
    off_x = jnp.asarray(rng.uniform(-24, 24, (len(kps.x), P)).astype(np.float32))
    off_y = jnp.asarray(rng.uniform(-24, 24, (len(kps.x), P)).astype(np.float32))
    gx_w, gy_w = sample_gradients_windowed(dx, dy, kps.level, kps.x, kps.y, off_x, off_y)
    pos = jnp.stack([kps.x[:, None] + off_x, kps.y[:, None] + off_y], -1)
    lev = jnp.broadcast_to(
        jnp.round(kps.level).astype(jnp.int32)[:, None], pos.shape[:2]
    )
    gx_g = bilinear_sample_stack(dx, lev, pos)
    gy_g = bilinear_sample_stack(dy, lev, pos)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_g), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gy_w), np.asarray(gy_g), atol=2e-6)


def test_descriptors_windowed_equals_gather_path():
    kps, dx, dy = _fixture(seed=2)
    cfg = SiftConfig()
    d_w = np.asarray(compute_descriptors(kps, dx, dy, cfg, use_windows=True))
    d_g = np.asarray(compute_descriptors(kps, dx, dy, cfg, use_windows=False))
    np.testing.assert_allclose(d_w, d_g, atol=1e-5)
