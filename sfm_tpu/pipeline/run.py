"""End-to-end pipeline driver (SURVEY.md §3.1)."""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.pipeline import ingest, stages
from sfm_tpu.scene.state import Reconstruction
from sfm_tpu.utils.logging import StageTimer


_STREAMING_MIN_IMAGES = 33  # above this, decode streams chunk-by-chunk


def run_pipeline(images: Sequence, cfg: PipelineConfig) -> Reconstruction:
    if cfg.shard.multihost:
        # Must run before any other backend use in this process; idempotent.
        from sfm_tpu.dist.mesh import initialize_multihost
        initialize_multihost(cfg.shard)

    timer = StageTimer(verbose=cfg.verbose, profile_dir=cfg.profile_dir)

    # Large path-based inputs stream through the feature stage (decode
    # prefetch overlapped with device extraction, SURVEY.md §7 hard part 7);
    # small or in-memory inputs load eagerly.
    paths = ingest.resolve_paths(images)
    streaming = paths is not None and len(paths) >= _STREAMING_MIN_IMAGES

    store = None
    fkey = mkey = rkey = None
    if streaming:
        if cfg.artifact_dir:
            from sfm_tpu.config import stage_config_hash
            from sfm_tpu.scene.artifacts import ArtifactStore, path_hash

            store = ArtifactStore(cfg.artifact_dir)
            ikey = path_hash(paths)
            # Stage-scoped keys: a reconstruction-config tweak resumes from
            # "matches" instead of re-running the ~25-min feature stage.
            fkey = stage_config_hash(cfg, "features") + "-" + ikey
            mkey = stage_config_hash(cfg, "matches") + "-" + ikey
            rkey = stage_config_hash(cfg, "reconstruction") + "-" + ikey
        with timer.stage("features"):
            if store and store.is_complete("features", fkey) and store.is_complete("meta", fkey):
                feats = store.load_features()
                meta = store.load("meta")
                intrinsics, names = meta["intrinsics"], [str(n) for n in meta["names"]]
                valid_hw = meta["valid_hw"]
            else:
                feats, intrinsics, valid_hw, names = stages.extract_stage_streaming(paths, cfg)
                if store:
                    store.save_features(fkey, feats)
                    store.save("meta", fkey, dict(
                        intrinsics=intrinsics, valid_hw=valid_hw,
                        names=np.asarray(names),
                    ))
        num_images = len(names)
    else:
        with timer.stage("ingest"):
            batch = ingest.load_images(images, cfg.sift)
        intrinsics, names = batch.intrinsics, batch.names
        valid_hw = batch.valid_hw
        num_images = len(batch.canvases)

        # Stage artifact cache (SURVEY.md §5.4): resume from completed stages.
        if cfg.artifact_dir:
            from sfm_tpu.config import stage_config_hash
            from sfm_tpu.scene.artifacts import ArtifactStore, input_hash

            store = ArtifactStore(cfg.artifact_dir)
            ikey = input_hash(batch.canvases, batch.names)
            fkey = stage_config_hash(cfg, "features") + "-" + ikey
            mkey = stage_config_hash(cfg, "matches") + "-" + ikey
            rkey = stage_config_hash(cfg, "reconstruction") + "-" + ikey

        with timer.stage("features"):
            if store and store.is_complete("features", fkey):
                feats = store.load_features()
            else:
                feats = stages.extract_stage(batch, cfg)
                if store:
                    store.save_features(fkey, feats)

    with timer.stage("pairs"):
        if cfg.pair_mode == "exhaustive":
            pairs = stages.exhaustive_pairs(num_images)
        elif cfg.pair_mode == "vocab_tree":
            from sfm_tpu.ops.vocab import vocab_tree_pairs

            pairs = vocab_tree_pairs(feats, cfg.vocab, seed=cfg.seed, verbose=cfg.verbose)
        else:
            raise ValueError(f"unknown pair_mode: {cfg.pair_mode}")

    with timer.stage("match+verify"):
        if store and store.is_complete("matches", mkey):
            graph = store.load_graph()
        else:
            prematched = None
            if cfg.shard.num_devices > 1 and cfg.shard.ring_matching and cfg.pair_mode == "exhaustive":
                # Multi-chip: the O(N^2) match sweep runs as the ring-ppermute
                # sharded matcher over the mesh (SURVEY.md §5.7); verification
                # then consumes the prematched correspondences.
                pairs, pi, pj, pv = stages.ring_match_pairs(feats, cfg)
                prematched = (pi, pj, pv) if pi is not None else None
            graph = stages.match_and_verify_stage(
                feats, pairs, intrinsics, cfg, seed=cfg.seed, prematched=prematched
            )
            if cfg.pair_mode != "exhaustive" and cfg.match.densify_scales > 0:
                # Pruned pair modes leave a narrow band graph on sequential
                # captures (top-k retrieval spends its budget on nearest
                # neighbors); densify along the graph-distance ladder so
                # loop-scale drift has constraints to push against
                # (exhaustive graphs are already complete).
                graph = stages.densify_graph(
                    feats, graph, intrinsics, cfg, num_images, seed=cfg.seed + 1
                )
            if store:
                store.save_graph(mkey, graph)

    if store and store.is_complete("reconstruction", rkey):
        rec = store.load_reconstruction()
    elif num_images == 2:
        with timer.stage("two_view"):
            ok_edges = np.where(
                graph.ok & (graph.pose_ok if graph.pose_ok is not None else True)
            )[0]
            if len(ok_edges) == 0:
                raise RuntimeError("two-view reconstruction failed: no verified pair")
            from sfm_tpu.pipeline.two_view import bootstrap_two_view

            rec = bootstrap_two_view(feats, graph, int(ok_edges[0]), intrinsics, cfg)
    elif cfg.engine_mode == "global" and not cfg.partition.enabled:
        with timer.stage("global_sfm"):
            from sfm_tpu.pipeline.global_engine import global_reconstruct

            rec = global_reconstruct(feats, graph, intrinsics, cfg)
    elif cfg.engine_mode not in ("incremental", "global"):
        raise ValueError(f"unknown engine_mode: {cfg.engine_mode}")
    else:
        # Partition mode hosts BOTH engines: each cluster reconstructs with
        # cfg.engine_mode (incremental PnP march or per-cluster global SfM),
        # then the shared merge + consolidation + polish phases run.
        with timer.stage(
                "incremental" if cfg.engine_mode == "incremental" else "global_sfm"):
            if cfg.partition.enabled:
                from sfm_tpu.pipeline.partition import partitioned_reconstruct

                rec = partitioned_reconstruct(
                    feats, graph, intrinsics, cfg, store=store, key=rkey
                )
            else:
                from sfm_tpu.pipeline.engine import incremental_reconstruct

                ckpt_cb = None
                if store is not None:
                    def ckpt_cb(step, snapshot, _store=store, _key=rkey):
                        _store.save_reconstruction(_key, snapshot, stage=f"scene_{step:04d}")

                rec = incremental_reconstruct(feats, graph, intrinsics, cfg, checkpoint_cb=ckpt_cb)
    if store and not store.is_complete("reconstruction", rkey):
        store.save_reconstruction(rkey, rec)

    rec.image_names = names
    rec.image_sizes = np.asarray(valid_hw)[:, ::-1].astype(np.int32)  # (w, h)
    if cfg.artifact_dir:
        # Run manifest: per-stage wall-clock alongside the stage artifacts
        # (SURVEY.md §5.1/§5.5 observability).
        import os

        timer.dump(os.path.join(cfg.artifact_dir, "stage_timings.json"))
    if cfg.verbose:
        print(f"[sfm_tpu] {rec.summary()}")
    return rec
