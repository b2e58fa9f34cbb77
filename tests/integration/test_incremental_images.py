"""Config ladder #2, full vertical: incremental SfM from RAW PIXELS through
SIFT -> matching -> verification -> engine -> BA (the image-based
counterpart of test_incremental.py, which isolates the engine).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import sfm_tpu
from sfm_tpu.config import (
    PipelineConfig, SiftConfig, MatchConfig, RansacConfig, EngineConfig, BAConfig,
)
from sfm_tpu.geometry.similarity import umeyama, apply_sim3
from sfm_tpu.geometry.projection import camera_center
from sfm_tpu.utils.synthetic import render_blob_scene


@pytest.fixture(scope="module")
def pipeline_result():
    imgs, scene = render_blob_scene(
        image_size=(256, 256), num_images=6, num_blobs=140, arc_fraction=0.10, seed=5,
    )
    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256),
        match=MatchConfig(max_matches=256, min_matches=8),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=10, error_threshold_px=2.0),
        engine=EngineConfig(
            init_min_inliers=20, abs_pose_min_inliers=8, local_ba_window=4, global_ba_every=3,
        ),
        ba=BAConfig(max_iterations=15),
        verbose=False,
    )
    rec = sfm_tpu.reconstruct(list(imgs), cfg)
    return rec, scene


def test_most_images_register(pipeline_result):
    rec, scene = pipeline_result
    assert rec.num_registered >= 5  # one failure tolerated at the arc ends


def test_reprojection_error(pipeline_result):
    rec, _ = pipeline_result
    assert rec.mean_reprojection_error() < 1.2


def test_camera_geometry_vs_gt(pipeline_result):
    rec, scene = pipeline_result
    reg = np.where(rec.registered)[0]
    est = np.stack([
        np.asarray(camera_center(jnp.asarray(rec.rvecs[i]), jnp.asarray(rec.tvecs[i]))) for i in reg
    ])
    gt = np.stack([
        np.asarray(camera_center(jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]))) for i in reg
    ])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    rmse = np.sqrt(((np.asarray(apply_sim3(s, R, t, jnp.asarray(est))) - gt) ** 2).sum(-1).mean())
    assert rmse < 0.15, rmse  # <4% of orbit radius from raw pixels


def test_points_in_scene_volume(pipeline_result):
    rec, scene = pipeline_result
    assert rec.num_points >= 40
    # Scene points live in a box of extent 1.2 around the origin; after sim3
    # alignment of cameras, reconstructed points should mostly fall inside
    # a generous multiple of it.
    reg = np.where(rec.registered)[0]
    est = np.stack([
        np.asarray(camera_center(jnp.asarray(rec.rvecs[i]), jnp.asarray(rec.tvecs[i]))) for i in reg
    ])
    gt = np.stack([
        np.asarray(camera_center(jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]))) for i in reg
    ])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    pts = np.asarray(apply_sim3(s, R, t, jnp.asarray(rec.points[rec.point_valid])))
    inside = (np.abs(pts) < 2.5).all(axis=1)
    assert inside.mean() > 0.9


def test_vocab_mode_with_densify():
    """Vocab-tree pair pruning end-to-end, including the graph-distance
    ladder densification pass (run.py wires it for pruned pair modes):
    the pruned + densified graph must still reconstruct the scene."""
    imgs, scene = render_blob_scene(
        image_size=(256, 256), num_images=8, num_blobs=140, arc_fraction=0.12, seed=7,
    )
    from sfm_tpu.config import VocabConfig

    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256),
        match=MatchConfig(max_matches=256, min_matches=8, densify_scales=3),
        vocab=VocabConfig(branching=4, depth=2, num_neighbors=3),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=10, error_threshold_px=2.0),
        engine=EngineConfig(
            init_min_inliers=20, abs_pose_min_inliers=8, local_ba_window=4, global_ba_every=3,
        ),
        ba=BAConfig(max_iterations=15),
        pair_mode="vocab_tree",
        verbose=False,
    )
    rec = sfm_tpu.reconstruct(list(imgs), cfg)
    assert rec.num_registered >= 6
    assert rec.mean_reprojection_error() < 1.2
