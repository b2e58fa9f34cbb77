"""Iterative global refinement on a saved 10k-ladder model: proximity
track-merge <-> global BA rounds, reporting camera RMSE vs GT per round.

Validates the `_polish_phase` refine loop (partition.py) offline against the
real bent 10k artifact without re-running ~1h of cluster reconstruction:

    python benchmarks/refine_repro.py \
        benchmarks/.ladder_cache_10000_256_vocab_tree \
        benchmarks/.render_cache_10000_256.npz [rounds]

The 10k postmortem (bend_diag.py): 10000/10000 cameras at 0.488px mean
reprojection but RMSE 1.20 on an orbit of radius 4 — 6301 points for ~450
physical blobs, no track spanning >2 cluster arcs, so the global BA has no
long-range constraint against the cluster-chain bend. Each refine round
fuses the duplicate copies the current geometry certifies, then re-solves.
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
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from benchmarks.bend_diag import rmse_vs_gt
    from sfm_tpu.config import PipelineConfig, BAConfig
    from sfm_tpu.pipeline.merge import merge_tracks_by_proximity
    from sfm_tpu.pipeline.partition import _merged_polish
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]

    rec = ArtifactStore(cache_dir).load_reconstruction(stage="reconstruction")
    cfg = PipelineConfig(ba=BAConfig(max_iterations=15))  # ladder config;
    # partition.polish_ba_iterations=40 (default) governs the polish solves.

    r0, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
    print(f"round 0: pts={int(rec.point_valid.sum())} "
          f"obs={rec.num_observations} reproj={rec.mean_reprojection_error():.3f}px "
          f"RMSE={r0:.4f}", flush=True)

    caps = None
    for rnd in range(1, rounds + 1):
        t0 = time.perf_counter()
        n = merge_tracks_by_proximity(
            rec, max_px=cfg.engine.max_reprojection_error_px, verbose=True)
        if n == 0:
            print(f"round {rnd}: converged (no fusable pairs)")
            break
        caps = _merged_polish(rec, cfg, caps=caps)
        r, _, _ = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
        print(f"round {rnd}: fused={n} pts={int(rec.point_valid.sum())} "
              f"obs={rec.num_observations} reproj={rec.mean_reprojection_error():.3f}px "
              f"RMSE={r:.4f} ({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
