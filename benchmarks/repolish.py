"""Re-run the merged-model polish phase from a saved merged_prepolish
artifact — the cheap iteration loop for polish/refine changes at 10k scale.

A partitioned ladder run checkpoints the merged+rescued model BEFORE the
global polish (`partition.partitioned_reconstruct`), so polish-phase code
changes (merge gates, refine-round schedules, LM budgets) can be validated
in minutes against the REAL 10k model instead of re-running ~1h of cluster
reconstruction:

    python benchmarks/repolish.py <ladder_cache_dir> <render_cache.npz>

Loads features + match graph + merged_prepolish from the cache dir, deep-
copies the model, runs `partition._polish_phase` with the CURRENT code, and
reports points/obs/reproj/camera-RMSE-vs-GT before and after. Saves the
result under stage 'repolished' in the same store (never overwrites the
run's own 'reconstruction' artifact).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = sys.argv[1]
    render_cache = sys.argv[2]

    from benchmarks.bend_diag import rmse_vs_gt
    from sfm_tpu.config import PipelineConfig, BAConfig, PartitionConfig
    from sfm_tpu.pipeline.partition import _polish_phase
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]

    store = ArtifactStore(cache_dir)
    feats = store.load_features()
    graph = store.load_graph()
    meta = store.load("meta") if os.path.exists(os.path.join(cache_dir, "meta.npz")) else None
    rec = store.load_reconstruction(stage="merged_prepolish")
    intrinsics = meta["intrinsics"] if meta is not None else rec.intrinsics

    # Ladder run config (ladder.py): BA iteration budget matters only below
    # partition.polish_ba_iterations, which governs the polish solves.
    cfg = PipelineConfig(
        ba=BAConfig(max_iterations=15),
        partition=PartitionConfig(enabled=True),
        verbose=True,
    )

    r0, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
    print(f"prepolish: cams={rec.num_registered} pts={int(rec.point_valid.sum())} "
          f"obs={rec.num_observations} reproj={rec.mean_reprojection_error():.3f}px "
          f"RMSE={r0:.4f}", flush=True)

    t0 = time.perf_counter()
    _polish_phase(rec, feats, graph, intrinsics, cfg)
    dt = time.perf_counter() - t0

    r1, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
    print(f"repolished: cams={rec.num_registered} pts={int(rec.point_valid.sum())} "
          f"obs={rec.num_observations} reproj={rec.mean_reprojection_error():.3f}px "
          f"RMSE={r1:.4f} ({dt:.0f}s)", flush=True)

    store.save_reconstruction("repolish", rec, stage="repolished")


if __name__ == "__main__":
    main()
