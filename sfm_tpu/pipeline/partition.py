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
    # Sparse adjacency (CSR): the round-1 dense [B, B] matrix plus per-step
    # row slicing was O(B^2) memory / O(B^3)-ish host time — 800MB and hours
    # at Rome16K scale. Connectivity-to-cluster is maintained incrementally:
    # adding member m costs one sparse row add.
    from scipy.sparse import csr_matrix

    ok_e = np.where(graph.ok)[0]
    i_arr = graph.pairs[ok_e, 0].astype(np.int64)
    j_arr = graph.pairs[ok_e, 1].astype(np.int64)
    w_arr = graph.num_inliers[ok_e].astype(np.float64)
    W = csr_matrix(
        (np.concatenate([w_arr, w_arr]),
         (np.concatenate([i_arr, j_arr]), np.concatenate([j_arr, i_arr]))),
        shape=(num_images, num_images),
    )
    degree = np.asarray(W.sum(axis=1)).reshape(-1)

    def row(m: int) -> np.ndarray:
        out = np.zeros(num_images)
        s, e = W.indptr[m], W.indptr[m + 1]
        out[W.indices[s:e]] = W.data[s:e]
        return out

    assigned = np.zeros(num_images, bool)
    clusters = []
    while not assigned.all():
        remaining = np.where(~assigned)[0]
        if degree[remaining].max() == 0:
            # Isolated images: one throwaway cluster each (they cannot register).
            assigned[remaining] = True
            break
        seed = int(remaining[np.argmax(degree[remaining])])
        members = [seed]
        assigned[seed] = True
        conn = row(seed)                       # connectivity of ALL images to cluster
        while len(members) < target_size and not assigned.all():
            cand = np.where(conn > 0, ~assigned, False)
            masked = np.where(cand, conn, 0.0)
            nxt = int(np.argmax(masked))
            if masked[nxt] == 0:
                break
            members.append(nxt)
            assigned[nxt] = True
            conn += row(nxt)
        core = np.asarray(members)
        # Overlap: strongest outside connections (may already be in another cluster).
        if overlap > 0:
            conn_out = conn.copy()
            conn_out[core] = 0.0
            extra = np.argsort(-conn_out)[:overlap]
            extra = extra[conn_out[extra] > 0]
            cluster = np.concatenate([core, extra])
        else:
            cluster = core
        clusters.append(np.sort(cluster.astype(np.int64)))
    return clusters


def _mask_graph_to_cluster(graph: MatchGraph, cluster: np.ndarray) -> MatchGraph:
    inside = np.zeros(int(graph.pairs.max()) + 1 if len(graph.pairs) else 1, bool)
    inside[cluster] = True
    ok = graph.ok & inside[graph.pairs[:, 0]] & inside[graph.pairs[:, 1]]
    return MatchGraph(
        pairs=graph.pairs, idx_i=graph.idx_i, idx_j=graph.idx_j, inlier=graph.inlier,
        num_inliers=graph.num_inliers, num_h_inliers=graph.num_h_inliers,
        rvec=graph.rvec, tvec=graph.tvec, ok=ok, pose_ok=graph.pose_ok,
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

    def run_cluster(ci_cluster):
        ci, cluster = ci_cluster
        if len(cluster) < 2:
            return None
        sub = _mask_graph_to_cluster(graph, cluster)
        if not sub.ok.any():
            return None
        try:
            rec = incremental_reconstruct(feats, sub, intrinsics, cfg)
        except RuntimeError as e:
            if cfg.verbose:
                print(f"[sfm_tpu] cluster {ci} failed: {e}")
            return None
        # A cluster is only usable if it actually built a map: a 2-camera /
        # 0-point result can neither be aligned nor contribute structure.
        return rec if rec.num_registered >= 2 and rec.num_points >= 8 else None

    # EP-analog dispatch (SURVEY.md §2.9): clusters are independent work
    # units. parallel_clusters > 1 overlaps their host-side bookkeeping with
    # device work via threads (on a pod, each thread's jit dispatches ride
    # its own chip group; single-chip runs still overlap host/device time).
    workers = max(1, cfg.partition.parallel_clusters)
    work = list(enumerate(clusters))
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            recs = [r for r in ex.map(run_cluster, work) if r is not None]
    else:
        recs = [r for r in map(run_cluster, work) if r is not None]
    if not recs:
        raise RuntimeError("no cluster produced a reconstruction")

    merged = merge_reconstructions(recs, cfg)

    if cfg.partition.merge_global_ba and merged.num_points > 4:
        _merged_polish(merged, cfg)
    return merged


# Single-problem polish ceiling: BA executables at C<=2048 compile in tens
# of seconds; C=4096 took the remote compiler >15 min and C~16k crashed it
# outright. Above the ceiling the polish runs as overlapping camera-window
# solves (block Gauss-Seidel), every window at a proven compile size.
_POLISH_MAX_CAMERAS = 2048


def _merged_polish(merged: Reconstruction, cfg: PipelineConfig) -> None:
    """BA -> filter -> BA on the merged model (the engine's final-polish
    schedule): sim3-chained clusters carry alignment drift and a few
    wrongly-linked cross-cluster tracks; one robust solve leaves those as
    gross outliers, so filter and re-solve."""
    from sfm_tpu.ba import build_problem, dispatch_bundle_adjust, writeback
    from sfm_tpu.scene.state import filter_observations

    if merged.num_registered <= _POLISH_MAX_CAMERAS:
        for round_ in range(2):
            prob, cams, pids = build_problem(merged)
            try:
                out, _ = dispatch_bundle_adjust(prob, cfg)
            except Exception as e:  # pragma: no cover - remote-compiler flake path
                # The merged model is the product of hours of work; a failed
                # final-polish compile must not discard it. Retry once, then
                # ship the unpolished merge with a warning.
                if cfg.verbose:
                    print(f"[sfm_tpu] merged global BA failed ({type(e).__name__}); retrying once")
                try:
                    out, _ = dispatch_bundle_adjust(prob, cfg)
                except Exception as e2:
                    print(f"[sfm_tpu] WARNING: merged global BA skipped after retry: {e2}")
                    break
            writeback(merged, out, cams, pids)
            dropped = filter_observations(merged, cfg.engine.max_reprojection_error_px)
            if cfg.verbose and dropped:
                print(f"[sfm_tpu] merge polish {round_}: dropped {dropped} outlier obs")
            if dropped == 0:
                break
        return

    # Pod-scale polish: 50%-overlapping windows of registered cameras, each
    # window a C<=2048 problem; cameras already polished this sweep are held
    # fixed in later windows so the solution stitches instead of re-gauging.
    # Window order is image-id order, which follows capture/cluster locality
    # for sequential datasets; two sweeps propagate corrections both ways
    # around loops.
    for sweep in range(2):
        reg = np.where(merged.registered)[0]
        polished = np.zeros(len(merged.registered), bool)
        step = _POLISH_MAX_CAMERAS // 2
        for s in range(0, len(reg), step):
            window = reg[s: s + _POLISH_MAX_CAMERAS]
            if len(window) < 16:
                continue
            anchored = polished[window]
            free = window[~anchored] if anchored.any() else None
            if free is not None and len(free) == 0:
                continue
            prob, cams, pids = build_problem(merged, cam_indices=window, free_cams=free)
            try:
                out, _ = dispatch_bundle_adjust(prob, cfg)
            except Exception as e:  # pragma: no cover
                print(f"[sfm_tpu] WARNING: polish window {s // step} skipped: {type(e).__name__}")
                continue
            writeback(merged, out, cams, pids)
            polished[window] = True
        dropped = filter_observations(merged, cfg.engine.max_reprojection_error_px)
        if cfg.verbose:
            print(f"[sfm_tpu] windowed merge polish sweep {sweep}: "
                  f"{(len(reg) + step - 1) // step} windows, dropped {dropped} outlier obs")
