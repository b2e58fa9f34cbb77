"""EngineConfig capacity + periodic-retriangulation behavior (SURVEY.md §2.5,
§2.8): every config field must control real behavior (VERDICT r1 item 6)."""

import dataclasses

import numpy as np
import pytest

from sfm_tpu.config import (
    EngineConfig,
    MatchConfig,
    PipelineConfig,
    RansacConfig,
    SiftConfig,
)
from sfm_tpu.pipeline import engine as engine_mod
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.pipeline.engine import incremental_reconstruct
from sfm_tpu.utils.synthetic import render_blob_scene


@pytest.fixture(scope="module")
def small_scene():
    imgs, scene = render_blob_scene(image_size=(192, 192), num_images=6, arc_fraction=0.08, num_blobs=120)
    cfg = PipelineConfig(
        sift=SiftConfig(max_keypoints=384, max_candidates=2048, num_octaves=2, image_max_dim=192),
        match=MatchConfig(max_matches=192, min_matches=8),
        ransac=RansacConfig(num_hypotheses=256, min_inliers=10, error_threshold_px=2.0),
        engine=EngineConfig(abs_pose_min_inliers=6, init_min_inliers=20),
        verbose=False,
    )
    batch = ingest.load_images(list(imgs), cfg.sift)
    feats = stages.extract_stage(batch, cfg)
    pairs = stages.exhaustive_pairs(len(imgs))
    graph = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg, seed=0)
    return feats, graph, batch.intrinsics, cfg


def test_max_images_enforced(small_scene):
    feats, graph, intr, cfg = small_scene
    bad = dataclasses.replace(cfg, engine=dataclasses.replace(cfg.engine, max_images=3))
    with pytest.raises(ValueError, match="max_images"):
        incremental_reconstruct(feats, graph, intr, bad)


def test_max_observations_enforced(small_scene):
    feats, graph, intr, cfg = small_scene
    bad = dataclasses.replace(cfg, engine=dataclasses.replace(cfg.engine, max_observations=10))
    with pytest.raises(ValueError, match="max_observations"):
        incremental_reconstruct(feats, graph, intr, bad)


def test_max_points_caps_triangulation(small_scene):
    feats, graph, intr, cfg = small_scene
    capped = dataclasses.replace(cfg, engine=dataclasses.replace(cfg.engine, max_points=20))
    rec = incremental_reconstruct(feats, graph, intr, capped)
    assert len(rec.points) <= 20
    assert rec.num_registered >= 2  # budget-capped but still reconstructs


def test_retriangulate_every_runs_periodic_pass(small_scene, monkeypatch):
    feats, graph, intr, cfg = small_scene

    def run(engine_cfg):
        calls = {"n": 0}
        orig = engine_mod._filter_observations

        def counting(st, c):
            calls["n"] += 1
            return orig(st, c)

        monkeypatch.setattr(engine_mod, "_filter_observations", counting)
        incremental_reconstruct(feats, graph, intr, dataclasses.replace(cfg, engine=engine_cfg))
        monkeypatch.setattr(engine_mod, "_filter_observations", orig)
        return calls["n"]

    # Defer global BA so the periodic retriangulation pass is the only extra
    # filter trigger; retriangulate_every=1 must fire more often than off.
    base = dataclasses.replace(cfg.engine, global_ba_every=100, filter_every=0, retriangulate_every=0)
    off = run(base)
    on = run(dataclasses.replace(base, retriangulate_every=1))
    assert on > off, (on, off)
