"""Config ladder #1 (BASELINE.md): two-view toy, end-to-end (SURVEY.md §4.4).

features -> matches -> E-RANSAC -> pose -> triangulation, asserting pose
accuracy against ground truth and bounded reprojection error.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import sfm_tpu
from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
from sfm_tpu.geometry.projection import relative_pose
from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.utils.synthetic import render_blob_scene


@pytest.fixture(scope="module")
def two_view_result():
    imgs, scene = render_blob_scene(image_size=(256, 256), num_images=2, arc_fraction=0.04)
    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256),
        match=MatchConfig(max_matches=256, min_matches=8),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=10, error_threshold_px=2.0),
        verbose=False,
    )
    rec = sfm_tpu.reconstruct(list(imgs), cfg)
    return rec, scene


def test_planar_scene_two_view_bootstraps_via_homography():
    """A purely planar scene trips the H/E degeneracy gate; the two-view
    bootstrap must still produce a reconstruction from the homography-
    decomposed pose (SURVEY.md §2.4; VERDICT r1 items 5-6)."""
    from sfm_tpu.utils.synthetic import render_checkerboard_scene

    imgs, _ = render_checkerboard_scene(num_images=2)
    rec = sfm_tpu.reconstruct(list(imgs), PipelineConfig(verbose=False))
    assert rec.num_registered == 2
    assert rec.num_points >= 15
    assert rec.mean_reprojection_error() < 1.0


def test_both_registered(two_view_result):
    rec, _ = two_view_result
    assert rec.num_registered == 2


def test_points_triangulated(two_view_result):
    rec, _ = two_view_result
    assert rec.num_points >= 15
    # All points in front of both cameras (cam0 is identity).
    assert (rec.points[rec.point_valid][:, 2] > 0).all()


def test_reprojection_error_bounded(two_view_result):
    rec, _ = two_view_result
    assert rec.mean_reprojection_error() < 1.5


def test_pose_accuracy(two_view_result):
    rec, scene = two_view_result
    rv_gt, t_gt = relative_pose(
        jnp.asarray(scene.rvecs[0]), jnp.asarray(scene.tvecs[0]),
        jnp.asarray(scene.rvecs[1]), jnp.asarray(scene.tvecs[1]),
    )
    R_est = np.asarray(so3_exp(jnp.asarray(rec.rvecs[1])))
    R_gt = np.asarray(so3_exp(rv_gt))
    rot_err = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)))
    t_est = rec.tvecs[1] / np.linalg.norm(rec.tvecs[1])
    t_gtn = np.asarray(t_gt / jnp.linalg.norm(t_gt))
    t_err = np.degrees(np.arccos(np.clip(abs(t_est @ t_gtn), -1, 1)))
    assert rot_err < 2.0, rot_err
    assert t_err < 8.0, t_err


def test_exports(two_view_result, tmp_path):
    rec, _ = two_view_result
    from sfm_tpu.scene.export import write_ply, write_colmap_text

    write_ply(rec, str(tmp_path / "cloud.ply"))
    assert (tmp_path / "cloud.ply").read_text().startswith("ply")
    write_colmap_text(rec, str(tmp_path / "sparse"))
    for f in ["cameras.txt", "images.txt", "points3D.txt"]:
        assert (tmp_path / "sparse" / f).exists()
    # COLMAP images.txt has 2 lines per registered image.
    lines = [l for l in (tmp_path / "sparse" / "images.txt").read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 4
