"""Config ladder #5 machinery: divide-and-conquer partition + merge
(SURVEY.md §2.7) on a synthetic ring, validated against ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.config import PipelineConfig, EngineConfig, RansacConfig, BAConfig, PartitionConfig
from sfm_tpu.geometry.similarity import umeyama, apply_sim3
from sfm_tpu.geometry.projection import camera_center
from sfm_tpu.pipeline.partition import partition_images, partitioned_reconstruct
from sfm_tpu.utils.synthetic import make_orbit_scene
from tests.integration.test_incremental import scene_to_features_and_graph


@pytest.fixture(scope="module")
def ring24():
    scene = make_orbit_scene(num_cameras=24, num_points=200, noise_px=0.0, seed=20, arc_fraction=1.0)
    feats, graph = scene_to_features_and_graph(scene, max_kp=220, noise=0.3, seed=21)
    return scene, feats, graph


def test_partition_covers_all_images(ring24):
    scene, feats, graph = ring24
    clusters = partition_images(graph, 24, target_size=10, overlap=4)
    covered = np.unique(np.concatenate(clusters))
    assert len(covered) == 24
    assert all(len(c) <= 14 for c in clusters)
    # Overlap exists between at least one pair of clusters.
    if len(clusters) > 1:
        inter = set(clusters[0].tolist()) & set(np.concatenate(clusters[1:]).tolist())
        assert len(inter) >= 1


def test_partitioned_reconstruction_matches_gt(ring24):
    scene, feats, graph = ring24
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        partition=PartitionConfig(enabled=True, target_cluster_size=10, overlap_cameras=4),
        verbose=False,
    )
    rec = partitioned_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    assert rec.num_registered >= 22  # allow a failure or two at cluster seams
    assert rec.mean_reprojection_error() < 0.8

    reg = np.where(rec.registered)[0]
    est = np.stack([
        np.asarray(camera_center(jnp.asarray(rec.rvecs[i]), jnp.asarray(rec.tvecs[i]))) for i in reg
    ])
    gt = np.stack([
        np.asarray(camera_center(jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]))) for i in reg
    ])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    rmse = np.sqrt(((np.asarray(apply_sim3(s, R, t, jnp.asarray(est))) - gt) ** 2).sum(-1).mean())
    assert rmse < 0.08, rmse  # 2% of orbit radius


def test_partitioned_point_coverage_matches_unpartitioned(ring24):
    """Merge must not silently discard structure: the partitioned
    reconstruction's post-merge point count and observation coverage stay
    comparable to an unpartitioned run of the same scene (VERDICT r2 weak
    #7 — at 2048 images the merged model had fewer points than a 1000-image
    unpartitioned run; low counts from track CONSOLIDATION are fine, lost
    coverage is not)."""
    from sfm_tpu.pipeline.engine import incremental_reconstruct

    scene, feats, graph = ring24
    cfg_base = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        verbose=False,
    )
    mono = incremental_reconstruct(feats, graph, scene.intrinsics.copy(), cfg_base)
    import dataclasses
    cfg_part = dataclasses.replace(
        cfg_base,
        partition=PartitionConfig(enabled=True, target_cluster_size=10, overlap_cameras=4),
    )
    part = partitioned_reconstruct(feats, graph, scene.intrinsics.copy(), cfg_part)

    # Coverage: every GT point the unpartitioned run reconstructed should
    # still be represented after partition+merge (tracks may consolidate,
    # so compare OBSERVATION coverage, which consolidation preserves).
    assert part.num_observations >= 0.8 * mono.num_observations, (
        part.num_observations, mono.num_observations)
    # Track consolidation may reduce the point count, but not collapse it.
    assert part.num_points >= 0.5 * mono.num_points, (part.num_points, mono.num_points)
    assert part.mean_reprojection_error() < 0.8


def test_merged_prepolish_checkpoint_and_resume(ring24, tmp_path):
    """The merged+rescued model checkpoints as a 'merged_prepolish' stage
    artifact BEFORE the global polish, and a rerun with the same key resumes
    straight into the polish (the 10k#2 crash lost 2.5h of cluster work to a
    polish-time TPU fault; this is the recovery contract)."""
    from sfm_tpu.scene.artifacts import ArtifactStore

    scene, feats, graph = ring24
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        partition=PartitionConfig(enabled=True, target_cluster_size=10, overlap_cameras=4),
        verbose=False,
    )
    store = ArtifactStore(str(tmp_path))
    rec1 = partitioned_reconstruct(feats, graph, scene.intrinsics.copy(), cfg,
                                   store=store, key="k1")
    assert store.is_complete("merged_prepolish", "k1")

    # Resume: must NOT redo cluster reconstruction. Poison the engine so any
    # cluster re-run raises; only the polish phase may execute.
    import sfm_tpu.pipeline.partition as partition_mod

    def _boom(*a, **k):  # pragma: no cover - failure mode
        raise AssertionError("cluster reconstruction re-ran on resume")

    orig = partition_mod.partition_images
    partition_mod.partition_images = _boom
    try:
        rec2 = partitioned_reconstruct(feats, graph, scene.intrinsics.copy(), cfg,
                                       store=store, key="k1")
    finally:
        partition_mod.partition_images = orig
    assert rec2.num_registered >= rec1.num_registered - 1
    assert rec2.mean_reprojection_error() < 0.8


def test_partitioned_global_engine_matches_gt(ring24):
    """engine_mode="global" inside partition mode: every cluster solves by
    pose averaging + positioning + polish (global_engine.global_reconstruct),
    then the shared merge/consolidation/polish runs. Quality bar matches the
    incremental-engine partition test."""
    scene, feats, graph = ring24
    cfg = PipelineConfig(
        engine=EngineConfig(local_ba_window=5, global_ba_every=6),
        ransac=RansacConfig(num_hypotheses=512),
        ba=BAConfig(max_iterations=20),
        partition=PartitionConfig(enabled=True, target_cluster_size=10, overlap_cameras=4),
        engine_mode="global",
        verbose=False,
    )
    rec = partitioned_reconstruct(feats, graph, scene.intrinsics.copy(), cfg)
    assert rec.num_registered >= 22
    assert rec.mean_reprojection_error() < 0.8

    reg = np.where(rec.registered)[0]
    est = np.stack([
        np.asarray(camera_center(jnp.asarray(rec.rvecs[i]), jnp.asarray(rec.tvecs[i]))) for i in reg
    ])
    gt = np.stack([
        np.asarray(camera_center(jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]))) for i in reg
    ])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    rmse = np.sqrt(((np.asarray(apply_sim3(s, R, t, jnp.asarray(est))) - gt) ** 2).sum(-1).mean())
    assert rmse < 0.08, rmse
