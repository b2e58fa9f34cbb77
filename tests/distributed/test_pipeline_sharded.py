"""Pipeline-level sharded matching on the 8-device mesh equals the
single-device pipeline (SURVEY.md §4.6)."""

import dataclasses

import numpy as np
import pytest

from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig, ShardConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.utils.synthetic import render_blob_scene


def test_ring_match_pairs_agree_with_blockwise():
    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=8, arc_fraction=0.08, num_blobs=80)
    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=256, max_candidates=1024, num_octaves=2, image_max_dim=128),
        match=MatchConfig(max_matches=128, min_matches=8),
        ransac=RansacConfig(num_hypotheses=256, min_inliers=10, error_threshold_px=2.0),
        shard=ShardConfig(num_devices=8),
        verbose=False,
    )
    batch = ingest.load_images(list(imgs), cfg.sift)
    feats = stages.extract_stage(batch, cfg)

    pairs_r, pi, pj, pv = stages.ring_match_pairs(feats, cfg)
    assert pi is not None

    # Blockwise reference: same match set per overlapping pair.
    from sfm_tpu.ops.match import match_block
    import jax.numpy as jnp

    for row, (a, b) in enumerate(pairs_r[:5]):
        pm = match_block(
            jnp.asarray(feats.desc[a][None]), jnp.asarray(feats.valid[a][None]),
            jnp.asarray(feats.desc[b][None]), jnp.asarray(feats.valid[b][None]),
            cfg.match,
        )
        ref = set(zip(np.asarray(pm.idx_i[0])[np.asarray(pm.valid[0])].tolist(),
                      np.asarray(pm.idx_j[0])[np.asarray(pm.valid[0])].tolist()))
        got = set(zip(pi[row][pv[row]].tolist(), pj[row][pv[row]].tolist()))
        assert got == ref

    # End-to-end: verification over the prematched set yields verified edges.
    graph = stages.match_and_verify_stage(
        feats, pairs_r, batch.intrinsics, cfg, seed=0, prematched=(pi, pj, pv)
    )
    assert graph.ok.sum() >= 4


def test_ring_match_streaming_equals_monolithic(monkeypatch):
    """Row-block-streamed ring matching (bounded host memory) produces the
    same compacted pair set as one full-table pass (VERDICT r1 weak #6)."""
    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=16, arc_fraction=0.10, num_blobs=80)
    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=128, max_candidates=512, num_octaves=2, image_max_dim=128),
        match=MatchConfig(max_matches=64, min_matches=8),
        shard=ShardConfig(num_devices=8),
        verbose=False,
    )
    batch = ingest.load_images(list(imgs), cfg.sift)
    feats = stages.extract_stage(batch, cfg)

    big = stages.ring_match_pairs(feats, cfg)  # default budget: one chunk
    monkeypatch.setattr(stages, "_RING_BLOCK_BYTES", 16 * 64 * 9 * 8)  # forces tiny chunks
    small = stages.ring_match_pairs(feats, cfg)

    np.testing.assert_array_equal(big[0], small[0])
    for b, s in zip(big[1:], small[1:]):
        np.testing.assert_array_equal(b, s)


def test_dp_feature_extraction_equals_single_chip():
    """DP extraction over the 8-device mesh is exactly the single-chip output
    (SURVEY.md §2.9 DP features — per-image work, no cross-image coupling)."""
    imgs, _ = render_blob_scene(image_size=(128, 128), num_images=16, arc_fraction=0.08, num_blobs=60)
    base = PipelineConfig(
        sift=SiftConfig(max_keypoints=128, max_candidates=512, num_octaves=2, image_max_dim=128),
        verbose=False,
    )
    batch = ingest.load_images(list(imgs), base.sift)
    f1 = stages.extract_stage(batch, base)
    f8 = stages.extract_stage(batch, dataclasses.replace(base, shard=ShardConfig(num_devices=8)))
    np.testing.assert_array_equal(f1.valid, f8.valid)
    np.testing.assert_allclose(f1.xy, f8.xy, atol=1e-5)
    np.testing.assert_allclose(f1.desc, f8.desc, atol=1e-5)


def test_full_pipeline_sharded_equals_single_device():
    """reconstruct() with shard.num_devices=8 uses DP features + ring
    matching + camera-sharded BA end-to-end and matches the single-device
    reconstruction (VERDICT r1 item 2; SURVEY.md §2.7/M4)."""
    import sfm_tpu

    imgs, scene = render_blob_scene(image_size=(128, 128), num_images=8, arc_fraction=0.10, num_blobs=80)
    base = PipelineConfig(
        sift=SiftConfig(max_keypoints=256, max_candidates=1024, num_octaves=2, image_max_dim=128),
        match=MatchConfig(max_matches=128, min_matches=8),
        ransac=RansacConfig(num_hypotheses=256, min_inliers=10, error_threshold_px=2.0),
        verbose=False,
    )
    rec1 = sfm_tpu.reconstruct(list(imgs), base)
    cfg8 = dataclasses.replace(base, shard=ShardConfig(num_devices=8))
    rec8 = sfm_tpu.reconstruct(list(imgs), cfg8)

    # Same registration outcome; reconstruction quality equivalent. (The
    # sharded BA reorders observation reductions, so poses agree to fp32
    # reduction tolerance, not bitwise.)
    np.testing.assert_array_equal(rec1.registered, rec8.registered)
    assert rec8.num_points >= 0.9 * rec1.num_points
    e1 = rec1.mean_reprojection_error()
    e8 = rec8.mean_reprojection_error()
    assert e8 < max(1.5 * e1, e1 + 0.1), (e1, e8)
