"""SIFT feature extraction stage: images -> fixed-budget keypoints+descriptors.

The jit boundary for the feature stage (SURVEY.md §3.2). Batched over images
([B, H, W] canvases from ingest); the octave loop is a static Python loop
(unrolled at trace time), everything inside is vmapped over the batch.
Output obeys the padding contract: exactly cfg.max_keypoints slots per image
with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops import pyramid as pyr
from sfm_tpu.ops.detect import (
    extrema_score_map, select_candidates, refine_candidates, assign_orientation,
)
from sfm_tpu.ops.descriptor import compute_descriptors


class Features(NamedTuple):
    """Per-image feature sets, fixed budget N = cfg.max_keypoints."""

    xy: jnp.ndarray        # [B, N, 2] pixel coords in the original image
    sigma: jnp.ndarray     # [B, N] absolute scale
    angle: jnp.ndarray     # [B, N] radians
    response: jnp.ndarray  # [B, N]
    desc: jnp.ndarray      # [B, N, 128] L2-normalized
    valid: jnp.ndarray     # [B, N] bool

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(images: jnp.ndarray, cfg: SiftConfig, valid_hw: jnp.ndarray | None = None) -> Features:
    """images: [B, H, W] float32 grayscale in [0, 1].

    valid_hw: optional [B, 2] (height, width) of the un-padded content in
    each canvas; keypoints outside are masked out.
    """
    B = images.shape[0]
    octaves = pyr.build_pyramid(images, cfg)
    factor0 = 0.5 if cfg.upsample_first_octave else 1.0

    from sfm_tpu.kernels import on_tpu

    per_oct = []
    k_budget = max(cfg.max_candidates // cfg.num_octaves, 32)
    for o, stack in enumerate(octaves):
        dx, dy = pyr.pyramid_gradients(stack)
        k_this = min(
            k_budget,
            int((stack.shape[1] - 1) * stack.shape[2] * stack.shape[3]),
        )

        desc_budget = min(cfg.desc_per_octave, k_this)

        # Score maps for the whole batch: the fused Pallas DoG+extrema
        # kernel on TPU (grid over batch x row tiles; ANY-memory inputs
        # cannot go through vmap), jnp reference elsewhere.
        pre_thresh = 0.8 * cfg.contrast_threshold / cfg.scales_per_octave
        if cfg.use_pallas and on_tpu() and stack.shape[2] % 128 == 0:
            from sfm_tpu.kernels.dog_extrema import dog_extrema_scores_batch

            score_maps = dog_extrema_scores_batch(stack, pre_thresh)
        else:
            score_maps = jax.vmap(lambda s: extrema_score_map(s[1:] - s[:-1], cfg))(stack)

        def per_image(stack_i, score_i, dx_i, dy_i):
            idx, scores = select_candidates(score_i, k_this)
            kps = refine_candidates(stack_i, idx, scores, cfg)
            # Compact to the survivors BEFORE the gather-heavy orientation
            # and descriptor stages: detection over-provisions candidates,
            # most of which fail the refine filters.
            sc = jnp.where(kps.valid, kps.response, -1.0)
            _, keep = jax.lax.top_k(sc, desc_budget)
            kps = jax.tree.map(lambda a: a[keep], kps)
            kps, angle2, valid2 = assign_orientation(kps, dx_i, dy_i, cfg)
            if cfg.multi_orientation:
                # Lowe's rule: secondary orientation peaks spawn duplicate
                # keypoints (same position/scale, different angle).
                second = kps._replace(angle=angle2, valid=kps.valid & valid2)
                kps = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), kps, second)
            desc = compute_descriptors(kps, dx_i, dy_i, cfg)
            return kps, desc

        kps, desc = jax.vmap(per_image)(stack, score_maps, dx, dy)
        scale = factor0 * (2.0**o)
        xy = jnp.stack([kps.x, kps.y], -1) * scale
        per_oct.append(
            dict(
                xy=xy,
                sigma=kps.sigma * scale,
                angle=kps.angle,
                response=kps.response,
                desc=desc,
                valid=kps.valid,
            )
        )

    cat = {k: jnp.concatenate([p[k] for p in per_oct], axis=1) for k in per_oct[0]}

    if valid_hw is not None:
        margin = 1.0
        inside = (
            (cat["xy"][..., 0] >= margin)
            & (cat["xy"][..., 0] < valid_hw[:, None, 1] - margin)
            & (cat["xy"][..., 1] >= margin)
            & (cat["xy"][..., 1] < valid_hw[:, None, 0] - margin)
        )
        cat["valid"] = cat["valid"] & inside

    # Keypoint budget: top max_keypoints by response among valid slots.
    score = jnp.where(cat["valid"], cat["response"], -1.0)
    n = min(cfg.max_keypoints, score.shape[1])
    _, top = jax.lax.top_k(score, n)

    def take(a):
        return jnp.take_along_axis(a, top.reshape(B, n, *([1] * (a.ndim - 2))), axis=1) if a.ndim > 2 \
            else jnp.take_along_axis(a, top, axis=1)

    feats = Features(
        xy=take(cat["xy"]),
        sigma=take(cat["sigma"]),
        angle=take(cat["angle"]),
        response=take(cat["response"]),
        desc=take(cat["desc"]),
        valid=take(cat["valid"]) & (jnp.take_along_axis(score, top, axis=1) > 0),
    )
    return feats
