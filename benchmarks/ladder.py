"""Config-ladder runner (BASELINE.md): end-to-end reconstruction at a given
scale on synthetic blob scenes with ground truth, reporting per-stage
wall-clock + accuracy vs GT.

    python benchmarks/ladder.py [num_images] [image_size] [pair_mode] [partition|global]

Ladder mapping: 2 -> config #1 (two-view), ~46 -> #2 (Temple-Ring-like),
100-500 + vocab_tree -> #3, 1-2k -> #4, 10k+ + partition -> #5.
4th arg "partition" = divide-and-conquer incremental; "global" = the
global-SfM engine (pose averaging + one triangulation + global BA).
Appends a row to benchmarks/ladder_log.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: ladder/bench runs retrace many shapes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    pair_mode = sys.argv[3] if len(sys.argv) > 3 else "exhaustive"
    mode_arg = sys.argv[4] if len(sys.argv) > 4 else ""
    partition = mode_arg in ("partition", "global_partition")
    engine_mode = "global" if mode_arg in ("global", "global_partition") \
        else "incremental"

    import jax.numpy as jnp

    from sfm_tpu.config import (
        PipelineConfig, SiftConfig, MatchConfig, RansacConfig, EngineConfig,
        BAConfig, VocabConfig, PartitionConfig,
    )
    from sfm_tpu.geometry.projection import camera_center
    from sfm_tpu.geometry.similarity import umeyama, apply_sim3
    from sfm_tpu.pipeline.run import run_pipeline
    from sfm_tpu.utils.synthetic import render_blob_scene

    t0 = time.perf_counter()
    # Render cache: the windowed-splat render is a host-side Python loop
    # (~17 min at n=10000) and is deterministic in its params — reruns load
    # the exact canvases instead (float32 round-trips bit-identically, so
    # the artifact store's input hash — and with it the cached feature/match
    # stages — stays valid across reruns).
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".render_cache_{n}_{size}.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        imgs = data["imgs"]
        from sfm_tpu.utils.synthetic import SyntheticScene
        fields = {k[6:]: data[k] for k in data.files if k.startswith("scene_")}
        fields["image_size"] = tuple(int(v) for v in fields["image_size"])
        scene = SyntheticScene(**fields)
    else:
        imgs, scene = render_blob_scene(
            image_size=(size, size), num_images=n,
            num_blobs=min(60 + 8 * n, 600), focal=size * 1.2,
            arc_fraction=min(0.02 * n, 1.0), radius=4.0,
        )
        if n >= 1000:  # only cache the expensive scales
            np.savez(cache, imgs=imgs,
                     **{f"scene_{k}": v for k, v in scene.__dict__.items()})
    t_render = time.perf_counter() - t0

    cfg = PipelineConfig(
        sift=SiftConfig(image_max_dim=size, max_keypoints=1024, max_candidates=4096, num_octaves=3),
        match=MatchConfig(max_matches=512, min_matches=12),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=12, error_threshold_px=2.0),
        engine=EngineConfig(init_min_inliers=25, abs_pose_min_inliers=10,
                            local_ba_window=6, global_ba_every=8,
                            max_images=max(4096, n),
                            max_points=max(1 << 18, 512 * n),
                            max_observations=max(1 << 20, 4096 * n)),
        ba=BAConfig(max_iterations=15),
        vocab=VocabConfig(num_neighbors=min(12, n - 1)),
        partition=PartitionConfig(
            enabled=partition,
            target_cluster_size=max(25, n // 16),
            overlap_cameras=16,
            parallel_clusters=4 if n >= 256 else 1,
        ),
        pair_mode=pair_mode,
        engine_mode=engine_mode,
        verbose=True,
        # Stage artifacts keyed by config+input hash: a crashed/iterated
        # run at 1-10k scale resumes past the ~25-min feature stage. One dir
        # per scale: the store keeps a single slot per stage file, so a
        # different-scale run would otherwise evict these artifacts.
        artifact_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  f".ladder_cache_{n}_{size}_{pair_mode}"),
    )
    t0 = time.perf_counter()
    rec = run_pipeline(list(imgs), cfg)
    t_total = time.perf_counter() - t0

    # Accuracy vs GT (sim3-aligned camera centers).
    reg = np.where(rec.registered)[0]
    rmse = float("nan")
    if len(reg) >= 3:
        # Batched: the per-camera eager-dispatch loop was 2 remote calls per
        # registered camera (tens of minutes of pure link latency at 10k).
        est = np.asarray(camera_center(jnp.asarray(rec.rvecs[reg]), jnp.asarray(rec.tvecs[reg])))
        gt = np.asarray(camera_center(jnp.asarray(scene.rvecs[reg]), jnp.asarray(scene.tvecs[reg])))
        s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
        rmse = float(np.sqrt(((np.asarray(apply_sim3(s, R, t, jnp.asarray(est))) - gt) ** 2).sum(-1).mean()))

    import jax

    # Backend + cache state make rows comparable: CPU rows support
    # quality/A-B claims only (wall-clock is not TPU-representative), and a
    # warm artifact cache skips whole stages (VERDICT r4 weak #2).
    row = {
        "n_images": n, "image_size": size, "pair_mode": pair_mode, "partition": partition,
        "engine_mode": engine_mode,
        "wall_clock_s": t_total, "render_s": t_render,
        "backend": jax.default_backend(),
        "summary": rec.summary(), "camera_rmse_vs_gt": rmse,
    }
    print(json.dumps(row, indent=2, default=str))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/ladder_log.jsonl", "a") as f:
        f.write(json.dumps(row, default=str) + "\n")


if __name__ == "__main__":
    main()
