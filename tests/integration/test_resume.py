"""Checkpoint/resume + fault injection (SURVEY.md §5.3/5.4).

A killed run must resume from the last completed stage's artifacts and
produce identical results; completed stages must not re-execute.
"""

import numpy as np
import pytest

import sfm_tpu
from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
from sfm_tpu.pipeline import stages
from sfm_tpu.utils.synthetic import render_blob_scene


def _cfg(art_dir):
    return PipelineConfig(
        sift=SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256),
        match=MatchConfig(max_matches=256, min_matches=8),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=10, error_threshold_px=2.0),
        artifact_dir=str(art_dir),
        verbose=False,
    )


def test_resume_and_fault_injection(tmp_path, monkeypatch):
    imgs, _ = render_blob_scene(image_size=(256, 256), num_images=2, arc_fraction=0.04)
    imgs = list(imgs)

    # Phase 1: fault injection — kill the pipeline after the feature stage.
    real_match = stages.match_and_verify_stage

    def boom(*a, **k):
        raise KeyboardInterrupt("injected fault between stages")

    monkeypatch.setattr(stages, "match_and_verify_stage", boom)
    with pytest.raises(KeyboardInterrupt):
        sfm_tpu.reconstruct(imgs, _cfg(tmp_path / "run"))
    assert (tmp_path / "run" / "features.npz").exists()
    assert not (tmp_path / "run" / "matches.npz").exists()

    # Phase 2: resume — completes without re-running features.
    monkeypatch.setattr(stages, "match_and_verify_stage", real_match)

    def no_extract(*a, **k):
        raise AssertionError("feature stage re-ran despite completed artifact")

    monkeypatch.setattr(stages, "extract_stage", no_extract)
    rec1 = sfm_tpu.reconstruct(imgs, _cfg(tmp_path / "run"))
    assert rec1.num_registered == 2

    # Phase 3: full re-run from artifacts is identical (nothing recomputes).
    monkeypatch.setattr(stages, "match_and_verify_stage", boom)  # must not be called
    rec2 = sfm_tpu.reconstruct(imgs, _cfg(tmp_path / "run"))
    np.testing.assert_array_equal(rec1.points, rec2.points)
    np.testing.assert_array_equal(rec1.rvecs, rec2.rvecs)
    np.testing.assert_array_equal(rec1.obs_uv, rec2.obs_uv)

    # Phase 4: a config change invalidates the cache key.
    cfg3 = _cfg(tmp_path / "run")
    from sfm_tpu.config import apply_overrides

    cfg3 = apply_overrides(cfg3, {"sift.max_keypoints": 256})
    with pytest.raises(AssertionError, match="feature stage re-ran"):
        sfm_tpu.reconstruct(imgs, cfg3)
