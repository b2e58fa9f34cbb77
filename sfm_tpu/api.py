"""Public API (SURVEY.md L6): image list in -> cameras, poses, points out."""

from __future__ import annotations

from typing import Sequence

from sfm_tpu.config import PipelineConfig


def reconstruct(images: Sequence, config: PipelineConfig | None = None, **overrides):
    """Run the full SfM pipeline.

    Args:
      images: a directory path, a list of image file paths, or a list/array of
        grayscale float32 arrays.
      config: optional PipelineConfig; kwargs are dotted-path overrides
        (e.g. ``reconstruct(imgs, **{"sift.max_keypoints": 8192})``).

    Returns:
      A ``Reconstruction`` (sfm_tpu.scene.state) with per-image intrinsics,
      world->camera poses, the sparse point cloud, and observation tracks.
    """
    from sfm_tpu.config import apply_overrides
    from sfm_tpu.pipeline.run import run_pipeline

    cfg = config or PipelineConfig()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return run_pipeline(images, cfg)
