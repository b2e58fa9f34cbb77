"""End-to-end pipeline driver (SURVEY.md §3.1)."""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.scene.state import Reconstruction
from sfm_tpu.utils.logging import StageTimer


def run_pipeline(images: Sequence, cfg: PipelineConfig) -> Reconstruction:
    timer = StageTimer(verbose=cfg.verbose)

    with timer.stage("ingest"):
        batch = ingest.load_images(images, cfg.sift)

    # Stage artifact cache (SURVEY.md §5.4): resume from completed stages.
    store = None
    key = None
    if cfg.artifact_dir:
        from sfm_tpu.config import config_hash
        from sfm_tpu.scene.artifacts import ArtifactStore, input_hash

        store = ArtifactStore(cfg.artifact_dir)
        key = config_hash(cfg) + "-" + input_hash(batch.canvases, batch.names)

    with timer.stage("features"):
        if store and store.is_complete("features", key):
            feats = store.load_features()
        else:
            feats = stages.extract_stage(batch, cfg)
            if store:
                store.save_features(key, feats)

    with timer.stage("pairs"):
        if cfg.pair_mode == "exhaustive":
            pairs = stages.exhaustive_pairs(len(batch.canvases))
        elif cfg.pair_mode == "vocab_tree":
            from sfm_tpu.ops.vocab import vocab_tree_pairs

            pairs = vocab_tree_pairs(feats, cfg.vocab, seed=cfg.seed)
        else:
            raise ValueError(f"unknown pair_mode: {cfg.pair_mode}")

    with timer.stage("match+verify"):
        if store and store.is_complete("matches", key):
            graph = store.load_graph()
        else:
            graph = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg, seed=cfg.seed)
            if store:
                store.save_graph(key, graph)

    num_images = len(batch.canvases)
    if store and store.is_complete("reconstruction", key):
        rec = store.load_reconstruction()
    elif num_images == 2:
        with timer.stage("two_view"):
            ok_edges = np.where(graph.ok)[0]
            if len(ok_edges) == 0:
                raise RuntimeError("two-view reconstruction failed: no verified pair")
            from sfm_tpu.pipeline.two_view import bootstrap_two_view

            rec = bootstrap_two_view(feats, graph, int(ok_edges[0]), batch.intrinsics, cfg)
    else:
        with timer.stage("incremental"):
            if cfg.partition.enabled:
                from sfm_tpu.pipeline.partition import partitioned_reconstruct

                rec = partitioned_reconstruct(feats, graph, batch.intrinsics, cfg)
            else:
                from sfm_tpu.pipeline.engine import incremental_reconstruct

                rec = incremental_reconstruct(feats, graph, batch.intrinsics, cfg)
    if store and not store.is_complete("reconstruction", key):
        store.save_reconstruction(key, rec)

    rec.image_names = batch.names
    if cfg.verbose:
        print(f"[sfm_tpu] {rec.summary()}")
    return rec
