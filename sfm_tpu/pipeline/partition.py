"""Divide-and-conquer reconstruction (SURVEY.md §2.7) — the IIT-Delhi-lineage
large-scale strategy: partition the image match graph into overlapping
clusters, reconstruct each independently, merge with a similarity transform,
finish with a merged global BA.

Reference-class realization: METIS/normalized-cut C library + per-node
cluster jobs. TPU-native realization: the graph is tiny (<=10^4 nodes), so
partitioning is host-side greedy BFS growth by edge weight; per-cluster
reconstructions are independent work units (the expert-parallel analog,
SURVEY.md §2.9 — mapped over chips or run serially per chip group), and the
merge + final BA run on device.
"""

from __future__ import annotations

import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.scene.state import Reconstruction


def partition_images(graph: MatchGraph, num_images: int, target_size: int, overlap: int) -> list[np.ndarray]:
    """Greedy weighted BFS partitioning with boundary-camera overlap.

    Seeds each cluster at the strongest unassigned image and grows by maximum
    connectivity-to-cluster (edge weight = verified inlier count), then adds
    the `overlap` most-connected outside images so neighbouring clusters
    share cameras for the merge alignment.
    """
    W = np.zeros((num_images, num_images), np.int64)
    for e in range(len(graph.pairs)):
        if graph.ok[e]:
            i, j = graph.pairs[e]
            W[i, j] = W[j, i] = int(graph.num_inliers[e])

    assigned = np.zeros(num_images, bool)
    degree = W.sum(1)
    clusters = []
    while not assigned.all():
        remaining = np.where(~assigned)[0]
        if degree[remaining].max() == 0:
            # Isolated images: one throwaway cluster each (they cannot register).
            assigned[remaining] = True
            break
        seed = remaining[np.argmax(degree[remaining])]
        members = [int(seed)]
        assigned[seed] = True
        while len(members) < target_size and not assigned.all():
            conn = W[members][:, ~assigned].sum(0)
            if conn.max() == 0:
                break
            nxt = np.where(~assigned)[0][np.argmax(conn)]
            members.append(int(nxt))
            assigned[nxt] = True
        core = np.asarray(members)
        # Overlap: strongest outside connections (may already be in another cluster).
        outside = np.setdiff1d(np.arange(num_images), core)
        if len(outside) and overlap > 0:
            conn = W[core][:, outside].sum(0)
            extra = outside[np.argsort(-conn)[:overlap]]
            extra = extra[conn[np.argsort(-conn)[:overlap]] > 0]
            cluster = np.concatenate([core, extra])
        else:
            cluster = core
        clusters.append(np.sort(cluster))
    return clusters


def _mask_graph_to_cluster(graph: MatchGraph, cluster: np.ndarray) -> MatchGraph:
    inside = np.zeros(int(graph.pairs.max()) + 1 if len(graph.pairs) else 1, bool)
    inside[cluster] = True
    ok = graph.ok & inside[graph.pairs[:, 0]] & inside[graph.pairs[:, 1]]
    return MatchGraph(
        pairs=graph.pairs, idx_i=graph.idx_i, idx_j=graph.idx_j, inlier=graph.inlier,
        num_inliers=graph.num_inliers, num_h_inliers=graph.num_h_inliers,
        rvec=graph.rvec, tvec=graph.tvec, ok=ok,
    )


def partitioned_reconstruct(
    feats: FeatureSet, graph: MatchGraph, intrinsics: np.ndarray, cfg: PipelineConfig
) -> Reconstruction:
    """Cluster -> reconstruct -> merge -> global BA (config ladder #5)."""
    from sfm_tpu.pipeline.engine import incremental_reconstruct
    from sfm_tpu.pipeline.merge import merge_reconstructions

    B = len(feats.xy)
    clusters = partition_images(
        graph, B, cfg.partition.target_cluster_size, cfg.partition.overlap_cameras
    )
    if cfg.verbose:
        print(f"[sfm_tpu] partitioned {B} images into {len(clusters)} clusters: "
              f"{[len(c) for c in clusters]}")

    recs = []
    for ci, cluster in enumerate(clusters):
        if len(cluster) < 2:
            continue
        sub = _mask_graph_to_cluster(graph, cluster)
        if not sub.ok.any():
            continue
        try:
            rec = incremental_reconstruct(feats, sub, intrinsics, cfg)
        except RuntimeError as e:
            if cfg.verbose:
                print(f"[sfm_tpu] cluster {ci} failed: {e}")
            continue
        if rec.num_registered >= 2:
            recs.append(rec)
    if not recs:
        raise RuntimeError("no cluster produced a reconstruction")

    merged = merge_reconstructions(recs, cfg)

    if cfg.partition.merge_global_ba and merged.num_points > 4:
        from sfm_tpu.ba import build_problem, dispatch_bundle_adjust, writeback

        prob, cams, pids = build_problem(merged)
        out, _ = dispatch_bundle_adjust(prob, cfg)
        writeback(merged, out, cams, pids)
    return merged
