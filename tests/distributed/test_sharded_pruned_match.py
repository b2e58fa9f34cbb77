"""Pair-sharded match+verify on a PRUNED candidate list equals the
single-device stage (VERDICT r2 missing #3 / SURVEY.md §2.7 sharded
matching).

The ring matcher serves the exhaustive all-pairs sweep; the vocab-tree
workload is an arbitrary pair list, which the stage now distributes by
sharding the pair axis of every block across the mesh (DP-over-pairs —
per-pair compute is vmapped and independent, so the partitioning is exact).
"""

import dataclasses

import numpy as np

from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig, ShardConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.utils.synthetic import render_blob_scene


def _base_cfg():
    return PipelineConfig(
        sift=SiftConfig(max_keypoints=256, max_candidates=1024, num_octaves=2, image_max_dim=128),
        match=MatchConfig(max_matches=128, min_matches=8),
        ransac=RansacConfig(num_hypotheses=256, min_inliers=10, error_threshold_px=2.0),
        verbose=False,
    )


def _graphs_equal(g1, g8):
    """Edge-level decisions must agree exactly; per-correspondence inlier
    bits may flip for fp-marginal residuals (the partitioned program fuses
    and tiles the Gram/RANSAC arithmetic differently, so errors sitting on
    the threshold go either way — same tolerance philosophy as the sharded
    BA parity test)."""
    np.testing.assert_array_equal(g1.pairs, g8.pairs)
    np.testing.assert_array_equal(g1.ok, g8.ok)
    np.testing.assert_array_equal(g1.pose_ok, g8.pose_ok)
    np.testing.assert_array_equal(g1.idx_i, g8.idx_i)
    np.testing.assert_array_equal(g1.idx_j, g8.idx_j)
    mismatch = (g1.inlier != g8.inlier).mean()
    assert mismatch < 0.01, f"inlier disagreement {mismatch:.2%}"
    np.testing.assert_allclose(
        g1.num_inliers, g8.num_inliers,
        atol=np.maximum(2, 0.05 * np.maximum(g1.num_inliers, 1)).max(),
    )
    ok = g1.ok & g1.pose_ok
    np.testing.assert_allclose(g1.rvec[ok], g8.rvec[ok], atol=1e-3)
    np.testing.assert_allclose(g1.tvec[ok], g8.tvec[ok], atol=1e-3)


def test_pruned_pair_match_sharded_equals_single_device():
    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=12, arc_fraction=0.10, num_blobs=80)
    base = _base_cfg()
    batch = ingest.load_images(list(imgs), base.sift)
    feats = stages.extract_stage(batch, base)

    # A pruned, non-exhaustive candidate list (every image against its 3
    # ring neighbours) — the shape a vocab-tree retrieval produces.
    B = len(imgs)
    cand = sorted({(i, min(i + d, B - 1)) for i in range(B) for d in (1, 2, 3) if i + d < B})
    pairs = np.asarray(cand, np.int32)

    g1 = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, base, seed=0)
    cfg8 = dataclasses.replace(base, shard=ShardConfig(num_devices=8))
    g8 = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg8, seed=0)

    assert g1.ok.sum() > 0
    _graphs_equal(g1, g8)


def test_vocab_tree_pipeline_sharded_matching(tmp_path):
    """Full reconstruct() in vocab_tree mode with shard.num_devices=8: the
    pruned candidate pairs are matched on the mesh and the reconstruction
    matches the single-device run."""
    import sfm_tpu
    from sfm_tpu.config import VocabConfig

    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=12, arc_fraction=0.10, num_blobs=80)
    base = dataclasses.replace(
        _base_cfg(),
        pair_mode="vocab_tree",
        vocab=VocabConfig(branching=4, depth=2, num_neighbors=6),
    )
    rec1 = sfm_tpu.reconstruct(list(imgs), base)
    cfg8 = dataclasses.replace(base, shard=ShardConfig(num_devices=8))
    rec8 = sfm_tpu.reconstruct(list(imgs), cfg8)

    np.testing.assert_array_equal(rec1.registered, rec8.registered)
    assert rec8.num_points >= 0.9 * rec1.num_points
    e1 = rec1.mean_reprojection_error()
    e8 = rec8.mean_reprojection_error()
    assert e8 < max(1.5 * e1, e1 + 0.1), (e1, e8)
