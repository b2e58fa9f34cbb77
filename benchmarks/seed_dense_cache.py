"""Seed the 10k ladder's match-stage cache with the densified graph.

The densify stage is now part of run_pipeline (match config changed -> new
"matches" stage key), and the ladder would re-match 62k vocab pairs plus
129k ladder proposals (~1.5 h of tunnel-bound device time) that this
machine has ALREADY computed: the original graph artifact plus the
densify_repro experiment's verified-edge cache. Merge the two and store
them under the ladder's NEW match key so the re-run resumes straight into
cluster reconstruction with the dense graph.

    python benchmarks/seed_dense_cache.py [n size pair_mode]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pair_mode = sys.argv[3] if len(sys.argv) > 3 else "vocab_tree"

    from sfm_tpu.config import (
        PipelineConfig, SiftConfig, MatchConfig, RansacConfig, EngineConfig,
        BAConfig, VocabConfig, PartitionConfig, stage_config_hash,
    )
    from sfm_tpu.pipeline.stages import MatchGraph, append_match_graph
    from sfm_tpu.scene.artifacts import ArtifactStore

    # EXACT copy of benchmarks/ladder.py's config (only the "matches"-scoped
    # sub-configs matter for the key: sift, match, vocab, ransac, pair_mode,
    # seed).
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
        partition=PartitionConfig(enabled=True, target_cluster_size=max(25, n // 16),
                                  overlap_cameras=16, parallel_clusters=4),
        pair_mode=pair_mode,
        verbose=True,
    )

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f".ladder_cache_{n}_{size}_{pair_mode}")
    store = ArtifactStore(cache_dir)
    fkey = store.manifest.get("features")
    assert fkey, "no cached feature stage to seed against"
    ikey = fkey.split("-", 1)[1]
    new_mkey = stage_config_hash(cfg, "matches") + "-" + ikey
    if store.manifest.get("matches") == new_mkey:
        print("matches stage already seeded at the current key")
        return

    graph = store.load_graph()
    with np.load(os.path.join(cache_dir, "densify_new_edges.npz")) as z:
        g_new = MatchGraph(**{k: z[k] for k in z.files})
    merged, added = append_match_graph(graph, g_new)
    store.save_graph(new_mkey, merged)
    print(f"seeded matches stage: {int(graph.ok.sum())} + {added} densified "
          f"-> {int(merged.ok.sum())} verified edges under key {new_mkey}")


if __name__ == "__main__":
    main()
