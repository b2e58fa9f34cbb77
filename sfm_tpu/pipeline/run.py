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

    with timer.stage("features"):
        feats = stages.extract_stage(batch, cfg)

    with timer.stage("pairs"):
        if cfg.pair_mode == "exhaustive":
            pairs = stages.exhaustive_pairs(len(batch.canvases))
        elif cfg.pair_mode == "vocab_tree":
            from sfm_tpu.ops.vocab import vocab_tree_pairs

            pairs = vocab_tree_pairs(feats, cfg.vocab, seed=cfg.seed)
        else:
            raise ValueError(f"unknown pair_mode: {cfg.pair_mode}")

    with timer.stage("match+verify"):
        graph = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg, seed=cfg.seed)

    num_images = len(batch.canvases)
    if num_images == 2:
        with timer.stage("two_view"):
            ok_edges = np.where(graph.ok)[0]
            if len(ok_edges) == 0:
                raise RuntimeError("two-view reconstruction failed: no verified pair")
            from sfm_tpu.pipeline.two_view import bootstrap_two_view

            rec = bootstrap_two_view(feats, graph, int(ok_edges[0]), batch.intrinsics, cfg)
    else:
        with timer.stage("incremental"):
            from sfm_tpu.pipeline.engine import incremental_reconstruct

            rec = incremental_reconstruct(feats, graph, batch.intrinsics, cfg)

    rec.image_names = batch.names
    if cfg.verbose:
        print(f"[sfm_tpu] {rec.summary()}")
    return rec
