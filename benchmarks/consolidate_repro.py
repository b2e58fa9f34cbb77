"""Graduated-consolidation schedule explorer (r5): replay the refine loop
on a saved 512 global_partition artifact with an ANNEALED id-merge cap and
measure camera RMSE vs GT after each round.

The production loop plateaued at ~1.0% RMSE: round 2+ links ~700 id pairs
but the fixed 8 px union-reprojection cap passes only ~20 — the remaining
duplicates are cross-arc copies whose union reprojects 8-20 px off because
the ~1% bend is still in the model, and BA cannot remove the bend without
exactly those long-range fusions (the oracle-track polish reaches 0.27%).
Graduated non-convexity: start permissive (trust the transitive 2D identity
evidence, let consensus splits repair mistakes), tighten as the model
straightens.

    python benchmarks/consolidate_repro.py [cap0] [anneal] [rounds]
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rmse_vs_gt(rec, scene):
    import jax.numpy as jnp
    from sfm_tpu.geometry.projection import camera_center
    from sfm_tpu.geometry.similarity import umeyama, apply_sim3

    reg = np.where(rec.registered)[0]
    est = np.asarray(camera_center(jnp.asarray(rec.rvecs[reg]), jnp.asarray(rec.tvecs[reg])))
    gt = np.asarray(camera_center(jnp.asarray(scene["rvecs"][reg]), jnp.asarray(scene["tvecs"][reg])))
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    return float(np.sqrt(((np.asarray(apply_sim3(s, R, t, jnp.asarray(est))) - gt) ** 2).sum(-1).mean()))


def main():
    cap0 = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    anneal = float(sys.argv[2]) if len(sys.argv) > 2 else 0.75
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from sfm_tpu.config import PipelineConfig, BAConfig, PartitionConfig, EngineConfig
    from sfm_tpu.scene.artifacts import ArtifactStore
    from sfm_tpu.pipeline.merge import (
        conflict_tolerant_track_ids, merge_tracks_by_proximity,
        merge_tracks_by_track_id, split_tracks_by_consensus,
    )
    from sfm_tpu.pipeline.global_pose import (
        reposition_reconstruction, retriangulate_reconstruction,
    )
    from sfm_tpu.pipeline.partition import _merged_polish

    base = os.path.dirname(os.path.abspath(__file__))
    store = ArtifactStore(os.path.join(base, ".ladder_cache_512_256_vocab_tree"))
    rec = store.load_reconstruction()
    graph = store.load_graph()
    feats = store.load_features()
    data = np.load(os.path.join(base, ".render_cache_512_256.npz")) \
        if os.path.exists(os.path.join(base, ".render_cache_512_256.npz")) else None
    if data is None:
        # Re-render deterministically (ladder params).
        from sfm_tpu.utils.synthetic import render_blob_scene
        _, sc = render_blob_scene(image_size=(256, 256), num_images=512,
                                  num_blobs=600, focal=256 * 1.2,
                                  arc_fraction=1.0, radius=4.0)
        scene = {"rvecs": sc.rvecs, "tvecs": sc.tvecs}
    else:
        scene = {"rvecs": data["scene_rvecs"], "tvecs": data["scene_tvecs"]}

    cfg = PipelineConfig(
        ba=BAConfig(max_iterations=15),
        partition=PartitionConfig(enabled=True),
        engine=EngineConfig(max_images=4096, max_points=1 << 18,
                            max_observations=1 << 20),
        verbose=True,
    )

    gm = conflict_tolerant_track_ids(graph, feats)
    no_refuse: set = set()
    log = []
    print(f"start: RMSE {rmse_vs_gt(rec, scene):.4f} "
          f"pts {int(rec.point_valid.sum())}", flush=True)
    cap = cap0
    for rnd in range(rounds):
        t0 = time.time()
        split_log: list = []
        n_split = split_tracks_by_consensus(
            rec, max_px=4.0, verbose=True, split_log=split_log)
        for par, frag in split_log:
            lo = np.minimum(par, frag).astype(np.int64)
            hi = np.maximum(par, frag).astype(np.int64)
            no_refuse.update(((lo << 32) | hi).tolist())
        if n_split:
            P0 = len(rec.points) - sum(len(f) for _, f in split_log)
            retriangulate_reconstruction(
                rec, cfg=cfg, only_points=np.arange(P0, len(rec.points)))
        n_id = merge_tracks_by_track_id(
            rec, graph, len(rec.registered), feats.xy.shape[1],
            rel_factor=4.0, floor_px=3.0, max_px=cap,
            verbose=True, gid_map=gm, exclude=no_refuse)
        n_px = merge_tracks_by_proximity(rec, max_px=6.0, verbose=True)
        reposition_reconstruction(rec, verbose=True)
        retriangulate_reconstruction(rec, cfg=cfg)
        _merged_polish(rec, cfg)
        r = rmse_vs_gt(rec, scene)
        err = rec.reprojection_errors()
        row = dict(round=rnd, cap=round(cap, 2), n_split=n_split, n_id=n_id,
                   n_px=n_px, rmse=round(r, 4), rmse_pct=round(100 * r / 4.0, 3),
                   mean_reproj=round(float(err.mean()), 3),
                   pts=int(rec.point_valid.sum()),
                   wall=round(time.time() - t0, 1))
        log.append(row)
        print("ROUND", json.dumps(row), flush=True)
        cap = max(cap * anneal, 6.0)

    with open(os.path.join(base, "consolidate_log.jsonl"), "a") as f:
        for row in log:
            f.write(json.dumps(dict(cap0=cap0, anneal=anneal, **row)) + "\n")


if __name__ == "__main__":
    main()
