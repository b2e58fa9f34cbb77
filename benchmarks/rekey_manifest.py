"""One-time manifest migration: full-config artifact keys -> stage-scoped
keys (run.py round-3 change). Keeps the input-hash suffix, recomputes the
config prefix per stage with stage_config_hash, and drops reconstruction
entries so the (cheap) reconstruction stage re-runs under new code while the
expensive feature/match artifacts are reused.

    python benchmarks/rekey_manifest.py CACHE_DIR N SIZE PAIR_MODE [partition]

The config args must match the ladder invocation that produced the cache.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ladder_config(n: int, size: int, pair_mode: str, partition: bool):
    """Replicates benchmarks/ladder.py's PipelineConfig exactly."""
    from sfm_tpu.config import (
        PipelineConfig, SiftConfig, MatchConfig, RansacConfig, EngineConfig,
        BAConfig, VocabConfig, PartitionConfig,
    )
    return PipelineConfig(
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
        verbose=True,
    )


def main():
    cache_dir = sys.argv[1]
    n, size, pair_mode = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    partition = len(sys.argv) > 5 and sys.argv[5] == "partition"

    from sfm_tpu.config import stage_config_hash

    cfg = ladder_config(n, size, pair_mode, partition)
    mpath = os.path.join(cache_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    out = {}
    for stage, key in manifest.items():
        ikey = key.split("-", 1)[1]
        if stage in ("features", "meta"):
            out[stage] = stage_config_hash(cfg, "features") + "-" + ikey
        elif stage == "matches":
            out[stage] = stage_config_hash(cfg, "matches") + "-" + ikey
        # reconstruction / scene_* checkpoints: dropped (stale code)
    with open(mpath, "w") as f:
        json.dump(out, f, indent=2)
    print(f"rekeyed {mpath}: {list(out)}")


if __name__ == "__main__":
    main()
