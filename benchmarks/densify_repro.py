"""Match-graph densification experiment on the bent 10k model.

Root cause chain of the 10k bend, established by measurement:
  - verified match edges reach only +-8 ring neighbors (p99.9 = 7), so the
    10k ring is ~1250 graph hops around — relative-pose drift accumulates
    into a low-frequency deformation NO downstream solver can remove (the
    reprojection objective is flat along it: proximity-fuse <-> BA rounds
    moved RMSE 1.20 -> 3.69, correspondence votes were exhausted at 48
    pairs);
  - the same scene at 1000 images has 10x wider angular reach per edge and
    solves to 0.86% RMSE.

Fix under test: propose candidate pairs along a power-of-two GRAPH-DISTANCE
ladder (generic: uses only the verified graph's own connectivity, no
capture-order assumption), verify them with the production matcher, and
feed the surviving long-range edges to the correspondence track-merge.
Tracks then span many arcs and global BA (NaN-fixed) has real long-range
constraints.

    python benchmarks/densify_repro.py <ladder_cache> <render_cache> [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def propose_ladder_pairs(pairs_ok: np.ndarray, n: int, max_scale: int = 8,
                         per_node: int = 2) -> np.ndarray:
    """Candidate pairs at graph distance ~2^s, s = 1..max_scale.

    For each node and scale, samples `per_node` nodes from the frontier
    (reachable at <= 2^s hops but not <= 2^(s-1)); for a band/sequential
    graph the row extremes are the two ring directions. Returns deduped
    [K, 2] (i < j), excluding already-verified pairs.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (np.ones(len(pairs_ok) * 2, np.bool_),
         (np.concatenate([pairs_ok[:, 0], pairs_ok[:, 1]]),
          np.concatenate([pairs_ok[:, 1], pairs_ok[:, 0]]))),
        shape=(n, n), dtype=np.bool_)
    reach = (A + sp.identity(n, dtype=np.bool_, format="csr")).astype(np.bool_)
    prev = reach.copy()
    out = []
    for _ in range(max_scale):
        reach = (reach @ reach).astype(np.bool_)
        frontier = reach.astype(np.int8) - prev.astype(np.int8)
        frontier = frontier.tocsr()
        indptr, cols = frontier.indptr, frontier.indices
        data = frontier.data
        for i in range(n):
            row = cols[indptr[i]:indptr[i + 1]][data[indptr[i]:indptr[i + 1]] > 0]
            if len(row) == 0:
                continue
            picks = {row[0], row[-1]} if per_node >= 2 else {row[0]}
            for j in picks:
                if i != j:
                    out.append((min(i, j), max(i, j)))
        prev = reach.copy()
    if not out:
        return np.zeros((0, 2), np.int64)
    cand = np.unique(np.asarray(out, np.int64), axis=0)
    have = set(map(tuple, pairs_ok.tolist()))
    keep = [k for k, (a, b) in enumerate(cand.tolist()) if (a, b) not in have]
    return cand[keep]


def append_graph(g, g_new):
    from sfm_tpu.pipeline.stages import append_match_graph

    return append_match_graph(g, g_new)


def main():
    cache_dir = sys.argv[1]
    render_cache = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from benchmarks.bend_diag import rmse_vs_gt
    from benchmarks.corr_fuse_repro import span_stats
    from sfm_tpu.config import PipelineConfig, BAConfig, MatchConfig
    from sfm_tpu.pipeline.merge import (merge_tracks_by_correspondence,
                                        merge_tracks_by_proximity)
    from sfm_tpu.pipeline.partition import _merged_polish
    from sfm_tpu.pipeline.stages import MatchGraph, match_and_verify_stage
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]
    n = len(gt_rvecs)

    store = ArtifactStore(cache_dir)
    rec = store.load_reconstruction(stage="reconstruction")
    feats = store.load_features()
    graph = store.load_graph()
    # Mirror the ladder's match config so new edges share the graph's
    # correspondence width (and the smaller M halves match-stage work).
    cfg = PipelineConfig(match=MatchConfig(max_matches=graph.idx_i.shape[1],
                                           min_matches=12),
                         ba=BAConfig(max_iterations=15))

    r0, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
    print(f"round 0: pts={int(rec.point_valid.sum())} obs={rec.num_observations} "
          f"reproj={rec.mean_reprojection_error():.3f}px RMSE={r0:.4f}")
    print("         " + span_stats(rec, n), flush=True)

    dense_cache = os.path.join(cache_dir, "densify_new_edges.npz")
    if os.path.exists(dense_cache):
        with np.load(dense_cache) as z:
            g_new = MatchGraph(**{k: z[k] for k in z.files})
        print(f"loaded cached densified edges: {int(g_new.ok.sum())} verified")
    else:
        t0 = time.perf_counter()
        cand = propose_ladder_pairs(graph.pairs[graph.ok], n)
        ringd = np.minimum(np.abs(cand[:, 0] - cand[:, 1]),
                           n - np.abs(cand[:, 0] - cand[:, 1]))
        print(f"proposed {len(cand)} ladder pairs in {time.perf_counter() - t0:.0f}s "
              f"(ring-distance p50={np.percentile(ringd, 50):.0f} "
              f"max={ringd.max()})", flush=True)

        t0 = time.perf_counter()
        g_new = match_and_verify_stage(feats, cand, rec.intrinsics, cfg)
        ok_d = ringd[g_new.ok]
        print(f"verified {int(g_new.ok.sum())}/{len(cand)} in "
              f"{time.perf_counter() - t0:.0f}s; verified ring-distance "
              f"p50={np.percentile(ok_d, 50) if len(ok_d) else 0:.0f} "
              f"p95={np.percentile(ok_d, 95) if len(ok_d) else 0:.0f} "
              f"max={ok_d.max() if len(ok_d) else 0}", flush=True)
        save = dict(g_new.__dict__)
        if save.get("pose_ok") is None:
            save["pose_ok"] = np.ones(len(g_new.pairs), bool)
        np.savez_compressed(dense_cache, **save)
    graph, n_added = append_graph(graph, g_new)
    print(f"graph: +{n_added} edges -> {int(graph.ok.sum())}")

    caps = None
    for rnd in range(1, rounds + 1):
        t0 = time.perf_counter()
        n_corr = merge_tracks_by_correspondence(
            rec, graph, min_votes=2, dist_frac=1e9, verbose=True)
        n_prox = 0
        if n_corr == 0:
            n_prox = merge_tracks_by_proximity(
                rec, max_px=cfg.engine.max_reprojection_error_px, verbose=True)
        if n_corr + n_prox == 0:
            print(f"round {rnd}: converged")
            break
        caps = _merged_polish(rec, cfg, caps=caps)
        r, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
        print(f"round {rnd}: corr={n_corr} prox={n_prox} "
              f"pts={int(rec.point_valid.sum())} obs={rec.num_observations} "
              f"reproj={rec.mean_reprojection_error():.3f}px RMSE={r:.4f} "
              f"({time.perf_counter() - t0:.0f}s)")
        print("         " + span_stats(rec, n), flush=True)


if __name__ == "__main__":
    main()
