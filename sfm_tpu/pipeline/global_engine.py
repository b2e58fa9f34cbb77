"""Global SfM engine: pose averaging -> triangulate everything -> global BA.

The second reconstruction paradigm of the reference class (SURVEY.md §0.1
[K]; the reference mount is empty, SURVEY.md §0, so no file:line citations
are possible): instead of registering images one at a time (engine.py),
solve ALL camera rotations at once by robust rotation averaging over the
verified match graph, then all camera centers by translation averaging
(1DSfM-class direction objective — BASELINE.json:10's scene family is named
after that line of work), then triangulate every track and run a handful of
global bundle adjustments. The IIT-Delhi large-scale-SfM lineage uses
exactly this shape inside its divide-and-conquer clusters and for
cross-cluster registration.

Why it matters at scale: runtime is dominated by a few device-side batched
solves (triangulation + BA) instead of O(images) sequential PnP rounds —
on sequential captures the match graph is available up front and the whole
reconstruction is 3 device programs. The trade is robustness on sparse or
contaminated graphs, which is why `incremental` stays the default
(config.PipelineConfig.engine_mode).

TPU mapping: the pose-graph solves are tiny, irregular host-numpy problems
(SURVEY.md §7 — host does bookkeeping); triangulation is one bucket-padded
batched DLT; the polish reuses the merged-model BA path (ba/ +
pipeline/partition._merged_polish), i.e. the fused Pallas normal-equation /
Schur kernels and the camera-sharded psum BA when sharding is on.
"""

from __future__ import annotations

import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.scene.state import Reconstruction


def global_reconstruct(
    feats: FeatureSet,
    graph: MatchGraph,
    intrinsics: np.ndarray,
    cfg: PipelineConfig,
) -> Reconstruction:
    """Reconstruct every camera in the pose graph's largest component.

    features + verified match graph in -> Reconstruction out (same contract
    as engine.incremental_reconstruct). Cameras outside the component are
    PnP-rescued against the triangulated model afterwards (shared helper
    with the partition pipeline).
    """
    from sfm_tpu.pipeline.global_pose import (
        pose_graph_poses, reposition_reconstruction,
        retriangulate_reconstruction,
    )
    from sfm_tpu.pipeline.partition import _merged_polish, _rescue_unregistered
    from sfm_tpu.scene.tracks import build_tracks

    B = len(intrinsics)
    max_kp = feats.xy.shape[1]

    rvecs, tvecs, valid = pose_graph_poses(graph, B, feats=feats,
                                           intrinsics=intrinsics)
    if int(valid.sum()) < 3:
        raise RuntimeError(
            "global engine: pose graph has no usable component "
            f"({int(valid.sum())} cameras) — need >= 3 verified, "
            "pose-carrying edges"
        )

    tracks = build_tracks(graph, B, max_kp)
    if tracks.num_tracks == 0:
        raise RuntimeError("global engine: no tracks in the match graph")

    # Observations on solved cameras only; a track must retain >= 2 of them
    # to triangulate.
    keep = valid[tracks.obs_image]
    cnt = np.bincount(tracks.track_id[keep], minlength=tracks.num_tracks)
    keep &= cnt[tracks.track_id] >= 2
    if not keep.any():
        raise RuntimeError("global engine: no multi-view tracks on the "
                           "solved cameras")
    tid = tracks.track_id[keep]
    remap = -np.ones(tracks.num_tracks, np.int64)
    used = np.unique(tid)
    remap[used] = np.arange(len(used))
    oi = tracks.obs_image[keep].astype(np.int32)
    okp = tracks.obs_kp[keep].astype(np.int32)

    P = len(used)
    rec = Reconstruction(
        intrinsics=np.asarray(intrinsics, np.float32),
        rvecs=rvecs.astype(np.float32),
        tvecs=tvecs.astype(np.float32),
        registered=valid.copy(),
        points=np.zeros((P, 3), np.float32),
        point_errors=np.zeros(P, np.float32),
        point_valid=np.ones(P, bool),
        obs_point=remap[tid].astype(np.int32),
        obs_image=oi,
        obs_kp=okp,
        obs_uv=feats.xy[oi, okp].astype(np.float32),
    )

    # Global positioning (GLOMAP-class): pairwise translation averaging is
    # only the SEED — the production center/point solve is the joint
    # observation-ray problem (global_pose.global_positioning). Measured on
    # the 512-orbit vocab graph (benchmarks/global_diag.py): averaging
    # alone 42% center RMSE, + positioning 33%, and the remaining bend is
    # track fragmentation, which the fuse->reposition rounds below remove.
    rec.point_valid[:] = True
    reposition_reconstruction(rec, verbose=cfg.verbose)
    n_tri = retriangulate_reconstruction(rec, cfg=cfg)
    if cfg.verbose:
        print(f"[sfm_tpu] global engine: {int(valid.sum())}/{B} cameras "
              f"averaged, {n_tri}/{P} tracks triangulated")
    if n_tri == 0:
        raise RuntimeError("global engine: triangulation produced no valid "
                           "points (pose averaging inconsistent with the "
                           "observations)")

    # BA -> filter -> BA global polish (shared with the merged-model path:
    # same robust solve, same capacity bucketing, same sharded dispatch).
    _merged_polish(rec, cfg)

    # Graduated consolidation rounds (the round-4 study's prescription:
    # geometric verification is the only discriminator that works —
    # NOTES.md round-4): raw union-find tracks are BOTH fragmented
    # (build_tracks cuts same-image keypoint conflicts; fragments carry no
    # long-range constraint, so the ray objective and BA are nearly flat
    # along low-frequency bends) AND contaminated (~54% glue temporally
    # disjoint fragments of different physical points with zero conflict
    # evidence at union time). Each round, at the current — improving —
    # geometry: SPLIT observations that break consensus with their track
    # into new candidate points, FUSE fragments by correspondence votes
    # (generous distance gate first round, tight after) and by the
    # quality-preserving proximity gate, then re-solve centers+points and
    # polish against the consolidated tracks. Converges when a round
    # changes nothing (the zero-change re-solve churn measurably erodes a
    # polished model: RMSE 1.17 -> 3.74 on the 512-orbit diag).
    from sfm_tpu.pipeline.merge import (
        conflict_tolerant_track_ids, merge_tracks_by_correspondence,
        merge_tracks_by_proximity, merge_tracks_by_track_id,
        split_tracks_by_consensus,
    )

    # Transitive-identity map for the id merge (see partition._polish_phase):
    # build_tracks' same-image conflict cuts leave every physical feature as
    # several parallel tracks (scale-space duplicate detections alternate
    # across edges), i.e. several points of THIS reconstruction.
    id_gids = conflict_tolerant_track_ids(graph, feats) \
        if cfg.partition.id_merge else None
    no_refuse: set = set()
    id_cap = cfg.partition.id_merge_max_px

    for rnd in range(cfg.engine.global_refine_rounds):
        n_changed = 0
        if cfg.engine.split_tracks_px > 0:
            P0 = len(rec.points)
            split_log: list = []
            n_split = split_tracks_by_consensus(
                rec, max_px=cfg.engine.split_tracks_px, verbose=cfg.verbose,
                split_log=split_log)
            for par, frag in split_log:
                lo = np.minimum(par, frag).astype(np.int64)
                hi = np.maximum(par, frag).astype(np.int64)
                no_refuse.update(((lo << 32) | hi).tolist())
            if n_split:
                # Place the detached fragments before any merge looks at
                # their 3D positions (they inherit the contaminated
                # track's point until re-triangulated).
                retriangulate_reconstruction(
                    rec, cfg=cfg, only_points=np.arange(P0, len(rec.points)))
            n_changed += n_split
        if id_gids is not None:
            n_changed += merge_tracks_by_track_id(
                rec, graph, B, max_kp,
                rel_factor=cfg.partition.id_merge_rel_factor,
                floor_px=cfg.partition.id_merge_floor_px,
                max_px=id_cap,
                verbose=cfg.verbose, gid_map=id_gids, exclude=no_refuse)
            id_cap = max(id_cap * cfg.partition.id_merge_anneal,
                         cfg.partition.id_merge_min_px)
        n_changed += merge_tracks_by_correspondence(
            rec, graph, min_votes=2,
            dist_frac=0.15 if rnd == 0 else 0.05, verbose=cfg.verbose)
        n_changed += merge_tracks_by_proximity(
            rec, max_px=cfg.engine.max_reprojection_error_px,
            verbose=cfg.verbose)
        if n_changed == 0:
            break
        reposition_reconstruction(rec, verbose=cfg.verbose)
        retriangulate_reconstruction(rec, cfg=cfg)
        _merged_polish(rec, cfg)

    if not rec.registered.all():
        if _rescue_unregistered(rec, feats, graph, intrinsics, cfg):
            _merged_polish(rec, cfg)
    return rec
