"""Transitive correspondence-closure experiment on the bent 10k model.

The bend postmortem: tracks span <=2 cluster arcs, so global BA has no
long-range constraint and wanders in the low-frequency deformation null
space (the proximity-merge <-> BA refine loop made RMSE WORSE: 1.20 ->
3.69). But the verified match graph already contains the true data
association: cross-boundary inlier correspondences chain copies of one
physical blob transitively around the ring. merge_tracks_by_correspondence
finds exactly these votes — its 5% distance gate is what breaks the chain
(adjacent-arc copies sit at 2-7% displacement on the bent model, NOTES.md).

This experiment lifts the gate (vote threshold does the outlier rejection)
and measures whether arc-spanning tracks let the (NaN-fixed) global BA
actually unbend:

    python benchmarks/corr_fuse_repro.py <ladder_cache> <render_cache> [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def span_stats(rec, n_images: int) -> str:
    """Ring-aware track span (in image-index units) over valid points."""
    pv = rec.point_valid[rec.obs_point]
    op, oi = rec.obs_point[pv], rec.obs_image[pv]
    spans = []
    order = np.argsort(op, kind="stable")
    op_s, oi_s = op[order], oi[order]
    bounds = np.searchsorted(op_s, np.arange(len(rec.points) + 1))
    for p in np.where(rec.point_valid)[0]:
        imgs = np.unique(oi_s[bounds[p]:bounds[p + 1]])
        if len(imgs) < 2:
            spans.append(0)
            continue
        gaps = np.diff(np.concatenate([imgs, imgs[:1] + n_images]))
        spans.append(n_images - gaps.max())
    spans = np.asarray(spans)
    return (f"span mean={spans.mean():.0f} p50={np.percentile(spans, 50):.0f} "
            f"p95={np.percentile(spans, 95):.0f} max={spans.max()}")


def main():
    cache_dir = sys.argv[1]
    render_cache = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from benchmarks.bend_diag import rmse_vs_gt
    from sfm_tpu.config import PipelineConfig, BAConfig
    from sfm_tpu.pipeline.merge import (merge_tracks_by_correspondence,
                                        merge_tracks_by_proximity)
    from sfm_tpu.pipeline.partition import _merged_polish
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]
    n_images = len(gt_rvecs)

    store = ArtifactStore(cache_dir)
    rec = store.load_reconstruction(stage="reconstruction")
    graph = store.load_graph()
    cfg = PipelineConfig(ba=BAConfig(max_iterations=15))

    r0, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
    print(f"round 0: pts={int(rec.point_valid.sum())} obs={rec.num_observations} "
          f"reproj={rec.mean_reprojection_error():.3f}px RMSE={r0:.4f}")
    print("         " + span_stats(rec, n_images), flush=True)

    min_votes = int(os.environ.get("FUSE_MIN_VOTES", 3))
    caps = None
    for rnd in range(1, rounds + 1):
        t0 = time.perf_counter()
        n_corr = merge_tracks_by_correspondence(
            rec, graph, min_votes=min_votes, dist_frac=1e9, verbose=True)
        n_prox = 0
        if n_corr == 0:
            # Correspondence evidence exhausted -> geometric consolidation
            # (copies whose observing images never matched at all).
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
        print("         " + span_stats(rec, n_images), flush=True)


if __name__ == "__main__":
    main()
