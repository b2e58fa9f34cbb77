"""Config ladder #2 (BASELINE.md): Temple-Ring-style incremental SfM
(SURVEY.md §4.5) — a full ring of cameras, all must register, the loop must
close, reprojection error bounded, geometry must match ground truth up to a
similarity transform.

Features and verified matches are synthesized directly from the ground-truth
scene (keypoints = exact projections + noise), isolating the engine
(tracks/PnP/triangulation/BA) from the feature stage, which has its own
integration test.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.config import PipelineConfig, EngineConfig, RansacConfig, BAConfig
from sfm_tpu.geometry.similarity import umeyama, apply_sim3
from sfm_tpu.geometry.projection import relative_pose
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.pipeline.engine import incremental_reconstruct
from sfm_tpu.utils.synthetic import make_orbit_scene


def scene_to_features_and_graph(scene, max_kp=256, max_matches=256, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    B = scene.num_cameras
    M = scene.num_points

    kp_of = -np.ones((B, M), np.int32)  # point -> keypoint slot per image
    xy = np.zeros((B, max_kp, 2), np.float32)
    valid = np.zeros((B, max_kp), bool)
    for i in range(B):
        vis = np.where(scene.visible[i])[0]
        vis = vis[:max_kp]
        kp_of[i, vis] = np.arange(len(vis))
        xy[i, : len(vis)] = scene.pixels[i][vis] + rng.normal(0, noise, (len(vis), 2))
        valid[i, : len(vis)] = True

    feats = FeatureSet(
        xy=xy, sigma=np.ones((B, max_kp), np.float32), angle=np.zeros((B, max_kp), np.float32),
        response=np.ones((B, max_kp), np.float32), desc=np.zeros((B, max_kp, 8), np.float32),
        valid=valid,
    )

    pairs, idx_i, idx_j, inlier, n_inl, rvs, tvs = [], [], [], [], [], [], []
    for i in range(B):
        for j in range(i + 1, B):
            common = np.where(scene.visible[i] & scene.visible[j] & (kp_of[i] >= 0) & (kp_of[j] >= 0))[0]
            if len(common) < 16:
                continue
            ii = np.zeros(max_matches, np.int32)
            jj = np.zeros(max_matches, np.int32)
            ok = np.zeros(max_matches, bool)
            n = min(len(common), max_matches)
            ii[:n] = kp_of[i, common[:n]]
            jj[:n] = kp_of[j, common[:n]]
            ok[:n] = True
            rv, tv = relative_pose(
                jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]),
                jnp.asarray(scene.rvecs[j]), jnp.asarray(scene.tvecs[j]),
            )
            tv = tv / jnp.linalg.norm(tv)
            pairs.append((i, j)); idx_i.append(ii); idx_j.append(jj); inlier.append(ok)
            n_inl.append(n); rvs.append(np.asarray(rv)); tvs.append(np.asarray(tv))

    E = len(pairs)
    return feats, MatchGraph(
        pairs=np.asarray(pairs, np.int32), idx_i=np.stack(idx_i), idx_j=np.stack(idx_j),
        inlier=np.stack(inlier), num_inliers=np.asarray(n_inl, np.int32),
        num_h_inliers=np.zeros(E, np.int32), rvec=np.stack(rvs), tvec=np.stack(tvs),
        ok=np.ones(E, bool),
    )


@pytest.fixture(scope="module")
def ring_result():
    scene = make_orbit_scene(num_cameras=12, num_points=150, noise_px=0.0, seed=10, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, noise=0.3, seed=11)
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        verbose=False,
    )
    rec = incremental_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    return rec, scene


def test_all_images_register(ring_result):
    rec, scene = ring_result
    assert rec.num_registered == scene.num_cameras


def test_reprojection_error(ring_result):
    rec, _ = ring_result
    assert rec.mean_reprojection_error() < 0.6  # 0.3px noise floor ~0.38


def test_point_recovery_up_to_similarity(ring_result):
    rec, scene = ring_result
    assert rec.num_points > 100
    # Camera centers vs ground truth, aligned by sim3 (gauge freedom).
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
    # Orbit radius is 4.0; require <1% of it.
    assert rmse < 0.04, rmse


def test_loop_closes(ring_result):
    """First and last ring cameras see shared structure with low error —
    drift around the loop stayed bounded."""
    rec, scene = ring_result
    err = rec.reprojection_errors()
    for i in [0, scene.num_cameras - 1]:
        sel = rec.obs_image == i
        assert sel.any()
        assert err[sel].mean() < 1.0


def test_track_lengths(ring_result):
    rec, _ = ring_result
    tl = rec.track_lengths()
    assert tl.max() >= 6  # long tracks survive across the ring
    assert (tl >= 2).all()


def test_stall_rescue_registers_sparse_frontier():
    """Adaptive PnP-floor stall rescue (ladder #2 regression: 38/48).

    Only a handful of points chain across 3+ images (the rest form length-2
    tracks that never yield 2D-3D links for an unregistered frontier image),
    so each new image sees fewer triangulated points than
    abs_pose_min_inliers. Without the rescue the march stalls after the
    first pair's neighbours; with it, every image registers and accuracy
    holds."""
    scene = make_orbit_scene(num_cameras=12, num_points=150, noise_px=0.0, seed=10, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, noise=0.2, seed=11)

    # Keep only adjacent-ring edges, and on each edge keep the 8 chaining
    # points (ids 0..7, visible everywhere on this orbit) plus an
    # edge-alternating subset whose tracks cannot span 3 images.
    keep_e = np.abs(graph.pairs[:, 0] - graph.pairs[:, 1]) == 1
    ok = graph.ok & keep_e
    inlier = graph.inlier.copy()
    kp_pt = {}  # (img, kp) -> point id, from construction in the fixture
    for i in range(scene.num_cameras):
        vis = np.where(scene.visible[i])[0][:256]
        for slot, p in enumerate(vis):
            kp_pt[(i, slot)] = int(p)
    for e in range(len(graph.pairs)):
        if not ok[e]:
            continue
        i, j = graph.pairs[e]
        for m in np.where(inlier[e])[0]:
            p = kp_pt[(int(i), int(graph.idx_i[e, m]))]
            if p < 8:
                continue  # chaining point: keep on every edge
            if (p % 2) != (int(i) % 2):
                inlier[e, m] = False
    n_inl = inlier.sum(1).astype(np.int32)
    ok &= n_inl >= 12
    graph = MatchGraph(
        pairs=graph.pairs, idx_i=graph.idx_i, idx_j=graph.idx_j, inlier=inlier,
        num_inliers=n_inl, num_h_inliers=graph.num_h_inliers,
        rvec=graph.rvec, tvec=graph.tvec, ok=ok,
    )
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6,
                            abs_pose_min_inliers=12, init_min_inliers=20),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        verbose=False,
    )
    rec = incremental_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    assert rec.num_registered == scene.num_cameras, rec.num_registered
    assert rec.mean_reprojection_error() < 0.8


def test_checkpoint_callback_fires(ring_result):
    """SceneState snapshots every k registrations (SURVEY.md §5.3)."""
    scene = make_orbit_scene(num_cameras=12, num_points=150, noise_px=0.0, seed=10, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, noise=0.3, seed=11)
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6, checkpoint_every=4),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        verbose=False,
    )
    snaps = []
    rec = incremental_reconstruct(
        feats, graph, scene.intrinsics.copy(), cfg,
        checkpoint_cb=lambda step, snapshot: snaps.append((step, snapshot.num_registered)),
    )
    assert len(snaps) >= 2
    steps = [s for s, _ in snaps]
    assert steps == sorted(steps)
    # Each snapshot is a self-consistent Reconstruction.
    assert all(n >= 4 for _, n in snaps)
