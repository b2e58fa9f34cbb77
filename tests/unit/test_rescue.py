"""Post-merge registration rescue (pipeline/partition._rescue_unregistered):
images that failed inside their cluster register against the merged model
via match-graph 2D-3D links (VERDICT r2 missing #2)."""

import numpy as np

from sfm_tpu.config import PipelineConfig, RansacConfig
from sfm_tpu.geometry.projection import camera_center
from sfm_tpu.pipeline.partition import _rescue_unregistered
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.utils.synthetic import make_orbit_scene
from tests.unit.test_ba import scene_to_reconstruction


def _feats_from_scene(scene):
    """FeatureSet where keypoint id == point id and xy = exact projections."""
    K, M = scene.num_cameras, scene.num_points
    return FeatureSet(
        xy=scene.pixels.astype(np.float32),
        sigma=np.ones((K, M), np.float32),
        angle=np.zeros((K, M), np.float32),
        response=np.ones((K, M), np.float32),
        desc=np.zeros((K, M, 8), np.float32),
        valid=scene.visible.copy(),
    )


def test_rescue_registers_leftover_images():
    scene = make_orbit_scene(num_cameras=10, num_points=80, noise_px=0.0, seed=44)
    merged = scene_to_reconstruction(scene)

    # Drop cameras 7..9 from the "merged" model entirely.
    lost = [7, 8, 9]
    merged.registered[lost] = False
    keep = ~np.isin(merged.obs_image, lost)
    merged.obs_point = merged.obs_point[keep]
    merged.obs_image = merged.obs_image[keep]
    merged.obs_kp = merged.obs_kp[keep]
    merged.obs_uv = merged.obs_uv[keep]
    gt_rvecs, gt_tvecs = merged.rvecs.copy(), merged.tvecs.copy()
    merged.rvecs[lost] = 0.0
    merged.tvecs[lost] = 0.0

    # Match graph: each lost image q has one verified edge to registered
    # image q-3 with inlier correspondences on commonly visible points
    # (keypoint id == point id in this fixture).
    pairs, idx_i, idx_j, inlier = [], [], [], []
    M = 64
    for q in lost:
        r = q - 3
        common = np.where(scene.visible[q] & scene.visible[r])[0][:M]
        ii = np.zeros(M, np.int32)
        jj = np.zeros(M, np.int32)
        ok = np.zeros(M, bool)
        ii[: len(common)] = common
        jj[: len(common)] = common
        ok[: len(common)] = True
        pairs.append((r, q))  # r < q
        idx_i.append(ii)
        idx_j.append(jj)
        inlier.append(ok)
    E = len(pairs)
    graph = MatchGraph(
        pairs=np.asarray(pairs, np.int32),
        idx_i=np.stack(idx_i), idx_j=np.stack(idx_j), inlier=np.stack(inlier),
        num_inliers=np.asarray([i.sum() for i in inlier], np.int32),
        num_h_inliers=np.zeros(E, np.int32),
        rvec=np.zeros((E, 3), np.float32), tvec=np.zeros((E, 3), np.float32),
        ok=np.ones(E, bool), pose_ok=np.ones(E, bool),
    )

    # num_hypotheses=512 matches the integration tests' pnp_ransac shape:
    # a FRESH late-suite XLA CPU compile of the default-1024 program
    # segfaulted the whole suite (compiler crash under accumulated
    # process state; fine in a fresh process). Same coverage, shared
    # executable.
    cfg = PipelineConfig(ransac=RansacConfig(num_hypotheses=512), verbose=False)
    feats = _feats_from_scene(scene)
    n = _rescue_unregistered(merged, feats, graph, scene.intrinsics, cfg)

    assert n == 3
    assert merged.registered.all()
    # Recovered poses are metrically right (exact projections, noiseless).
    import jax.numpy as jnp

    for q in lost:
        c_est = np.asarray(camera_center(jnp.asarray(merged.rvecs[q]), jnp.asarray(merged.tvecs[q])))
        c_gt = np.asarray(camera_center(jnp.asarray(gt_rvecs[q]), jnp.asarray(gt_tvecs[q])))
        assert np.linalg.norm(c_est - c_gt) < 0.05, (q, c_est, c_gt)
    # Inlier links were appended as observations for the follow-up polish.
    assert np.isin(np.asarray(lost), merged.obs_image).all()


def test_rescue_noop_when_all_registered():
    scene = make_orbit_scene(num_cameras=6, num_points=40, seed=45)
    merged = scene_to_reconstruction(scene)
    graph = MatchGraph(
        pairs=np.zeros((0, 2), np.int32), idx_i=np.zeros((0, 8), np.int32),
        idx_j=np.zeros((0, 8), np.int32), inlier=np.zeros((0, 8), bool),
        num_inliers=np.zeros(0, np.int32), num_h_inliers=np.zeros(0, np.int32),
        rvec=np.zeros((0, 3), np.float32), tvec=np.zeros((0, 3), np.float32),
        ok=np.zeros(0, bool), pose_ok=np.zeros(0, bool),
    )
    # num_hypotheses=512 matches the integration tests' pnp_ransac shape:
    # a FRESH late-suite XLA CPU compile of the default-1024 program
    # segfaulted the whole suite (compiler crash under accumulated
    # process state; fine in a fresh process). Same coverage, shared
    # executable.
    cfg = PipelineConfig(ransac=RansacConfig(num_hypotheses=512), verbose=False)
    feats = _feats_from_scene(scene)
    assert _rescue_unregistered(merged, feats, graph, scene.intrinsics, cfg) == 0
