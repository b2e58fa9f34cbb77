"""Global-SfM engine mode (config.engine_mode="global"): rotation +
translation averaging over the pose graph, one batched triangulation, and a
global BA polish reconstruct the whole ring at once (SURVEY.md §4.5 bar:
all images register, loop closes, geometry matches GT up to sim3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.config import PipelineConfig, BAConfig
from sfm_tpu.geometry.similarity import umeyama, apply_sim3
from sfm_tpu.pipeline.global_engine import global_reconstruct
from sfm_tpu.utils.synthetic import make_orbit_scene

from tests.integration.test_incremental import scene_to_features_and_graph


@pytest.fixture(scope="module")
def global_result():
    scene = make_orbit_scene(num_cameras=12, num_points=150, noise_px=0.0,
                             seed=10, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, noise=0.3, seed=11)
    cfg = PipelineConfig(ba=BAConfig(max_iterations=20), verbose=False)
    rec = global_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    return rec, scene


def test_all_images_register(global_result):
    rec, scene = global_result
    assert rec.num_registered == scene.num_cameras


def test_reprojection_error(global_result):
    rec, _ = global_result
    assert rec.mean_reprojection_error() < 0.6  # 0.3px noise floor


def test_camera_recovery_up_to_similarity(global_result):
    rec, scene = global_result
    assert rec.num_points > 100
    from sfm_tpu.geometry.projection import camera_center
    est = np.stack([
        np.asarray(camera_center(jnp.asarray(rec.rvecs[i]), jnp.asarray(rec.tvecs[i])))
        for i in range(scene.num_cameras)
    ])
    gt = np.stack([
        np.asarray(camera_center(jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i])))
        for i in range(scene.num_cameras)
    ])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    aligned = np.asarray(apply_sim3(s, R, t, jnp.asarray(est)))
    rmse = np.sqrt(((aligned - gt) ** 2).sum(-1).mean())
    assert rmse < 0.04, rmse  # <1% of the 4.0 orbit radius


def test_outlier_edges_tolerated():
    """10% gross-outlier relative poses: the robust averaging + BA polish
    still recover the ring (the incremental engine never sees these edges
    as poses; the global engine must reject them itself)."""
    scene = make_orbit_scene(num_cameras=12, num_points=150, noise_px=0.0,
                             seed=10, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, noise=0.3, seed=11)
    rng = np.random.default_rng(12)
    E = len(graph.pairs)
    bad = rng.random(E) < 0.10
    rvec = np.asarray(graph.rvec).copy()
    tvec = np.asarray(graph.tvec).copy()
    rvec[bad] = rng.normal(0, 1.5, (int(bad.sum()), 3)).astype(np.float32)
    tvec[bad] = rng.normal(0, 1.0, (int(bad.sum()), 3)).astype(np.float32)
    tvec[bad] /= np.linalg.norm(tvec[bad], axis=1, keepdims=True)
    from sfm_tpu.pipeline.stages import MatchGraph
    graph = MatchGraph(
        pairs=graph.pairs, idx_i=graph.idx_i, idx_j=graph.idx_j,
        inlier=graph.inlier, num_inliers=graph.num_inliers,
        num_h_inliers=graph.num_h_inliers, rvec=rvec, tvec=tvec, ok=graph.ok,
    )
    cfg = PipelineConfig(ba=BAConfig(max_iterations=20), verbose=False)
    rec = global_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    assert rec.num_registered == scene.num_cameras
    assert rec.mean_reprojection_error() < 0.8


def test_unknown_engine_mode_rejected():
    from sfm_tpu.config import apply_overrides
    cfg = apply_overrides(PipelineConfig(), {"engine_mode": "warp"})
    assert cfg.engine_mode == "warp"  # config carries it; run.py rejects it
