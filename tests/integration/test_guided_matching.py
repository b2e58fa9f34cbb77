"""Guided (epipolar-gated) re-matching densifies verified edges
(SURVEY.md §2.4)."""

import dataclasses

import numpy as np
import pytest

from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.utils.synthetic import render_blob_scene


def test_guided_matching_adds_inliers():
    imgs, _ = render_blob_scene(image_size=(256, 256), num_images=2, arc_fraction=0.04)
    base = PipelineConfig(
        sift=SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256),
        match=MatchConfig(max_matches=256, min_matches=8, ratio_threshold=0.7),  # strict ratio
        ransac=RansacConfig(num_hypotheses=512, min_inliers=10, error_threshold_px=2.0),
        verbose=False,
    )
    batch = ingest.load_images(list(imgs), base.sift)
    feats = stages.extract_stage(batch, base)
    pairs = stages.exhaustive_pairs(2)

    g0 = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, base, seed=0)
    assert g0.ok[0]

    guided_cfg = dataclasses.replace(
        base, match=dataclasses.replace(base.match, guided=True)
    )
    g1 = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, guided_cfg, seed=0)
    assert g1.ok[0]
    # The strict first-pass ratio loses matches; the epipolar-gated pass
    # recovers them.
    assert g1.num_inliers[0] > g0.num_inliers[0], (g0.num_inliers[0], g1.num_inliers[0])
    # And guided matches must still be one-to-one.
    inl = g1.inlier[0]
    assert len(np.unique(g1.idx_i[0][inl])) == inl.sum()
    assert len(np.unique(g1.idx_j[0][inl])) == inl.sum()
