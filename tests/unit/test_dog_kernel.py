"""Fused DoG+extrema Pallas kernel vs jnp reference (SURVEY.md §2.2, §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.detect import extrema_score_map, find_extrema, refine_candidates
from sfm_tpu.ops.pyramid import build_pyramid
from sfm_tpu.kernels.dog_extrema import dog_extrema_scores

INTERP = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def octave_stack():
    cfg = SiftConfig(num_octaves=1, image_max_dim=128)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 128, 128)).astype(np.float32)
    return build_pyramid(jnp.asarray(img), cfg)[0][0], cfg  # [L, H, W]


def test_kernel_equals_reference(octave_stack):
    stack, cfg = octave_stack
    ref = np.asarray(extrema_score_map(stack[1:] - stack[:-1], cfg))
    pre = 0.8 * cfg.contrast_threshold / cfg.scales_per_octave
    out = np.asarray(dog_extrema_scores(stack, pre, interpret=INTERP))
    np.testing.assert_array_equal(out, ref)
    assert (ref > 0).sum() > 0  # fixture actually contains extrema


def test_refine_from_stack_matches_dog(octave_stack):
    """Gathering DoG cubes from the gaussian stack must reproduce the same
    refined keypoints as materializing the DoG volume would."""
    stack, cfg = octave_stack
    idx, scores = find_extrema(stack, cfg, 64, use_pallas=False)
    kps = refine_candidates(stack, idx, scores, cfg)
    v = np.asarray(kps.valid)
    assert v.sum() > 0
    # Refined positions stay near their integer candidates.
    H, W = stack.shape[1:]
    y0 = (np.asarray(idx) % (H * W)) // W
    x0 = np.asarray(idx) % W
    assert np.abs(np.asarray(kps.x)[v] - x0[v]).max() < 3.0
    assert np.abs(np.asarray(kps.y)[v] - y0[v]).max() < 3.0
