"""Streaming (prefetch-overlapped) ingest path equals the eager path
(SURVEY.md §7 hard part 7)."""

import numpy as np
import pytest

from sfm_tpu.config import PipelineConfig, SiftConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.utils.synthetic import render_blob_scene


def test_streaming_features_equal_eager(tmp_path):
    cv2 = pytest.importorskip("cv2")
    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=2, arc_fraction=0.04)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(40):  # above the streaming threshold
        img = imgs[i % 2] + rng.normal(0, 0.01, imgs[0].shape).astype(np.float32)
        p = tmp_path / f"im_{i:03d}.png"
        cv2.imwrite(str(p), (np.clip(img, 0, 1) * 255).astype(np.uint8))
        paths.append(str(p))

    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=128, max_candidates=512, num_octaves=2, image_max_dim=128),
        verbose=False,
    )
    feats_s, intr_s, hw_s, names_s = stages.extract_stage_streaming(paths, cfg)

    batch = ingest.load_images(paths, cfg.sift)
    feats_e = stages.extract_stage(batch, cfg)

    np.testing.assert_array_equal(feats_s.valid, feats_e.valid)
    np.testing.assert_array_equal(feats_s.xy, feats_e.xy)
    np.testing.assert_array_equal(feats_s.desc, feats_e.desc)
    np.testing.assert_array_equal(intr_s, batch.intrinsics)
    assert names_s == batch.names


def test_resolve_paths(tmp_path):
    cv2 = pytest.importorskip("cv2")
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"x_{i}.png"), np.zeros((8, 8), np.uint8))
    (tmp_path / "notes.txt").write_text("not an image")
    paths = ingest.resolve_paths(str(tmp_path))
    assert len(paths) == 3
    assert ingest.resolve_paths(paths) == paths
    assert ingest.resolve_paths([np.zeros((8, 8))]) is None
