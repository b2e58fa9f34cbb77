"""CPU-oracle wall-clock comparator (BASELINE.md).

The reference binary is unavailable (BASELINE.json `published` = {}), so the
stand-in comparator for the "<10% of reference CPU wall-clock" target is an
OpenCV-based CPU pipeline (SIFT detect+describe, BF ratio matching,
findEssentialMat/recoverPose per pair) on the SAME images as our TPU
pipeline. Usage:

    python benchmarks/cpu_oracle.py [num_images] [image_size]

Prints wall-clock for both pipelines and the ratio; appends a row to
benchmarks/oracle_log.jsonl.
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


def cpu_pipeline(images: list[np.ndarray], focal: float) -> dict:
    import cv2

    t0 = time.perf_counter()
    sift = cv2.SIFT_create(nfeatures=4096)
    kps, descs = [], []
    for im in images:
        k, d = sift.detectAndCompute((im * 255).astype(np.uint8), None)
        kps.append(k)
        descs.append(d)
    t_feat = time.perf_counter() - t0

    K = np.array([[focal, 0, images[0].shape[1] / 2],
                  [0, focal, images[0].shape[0] / 2],
                  [0, 0, 1]])
    bf = cv2.BFMatcher()
    t0 = time.perf_counter()
    n_pairs = 0
    n_verified = 0
    for i in range(len(images)):
        for j in range(i + 1, len(images)):
            if descs[i] is None or descs[j] is None:
                continue
            ms = bf.knnMatch(descs[i], descs[j], k=2)
            good = [m for m, n in ms if m.distance < 0.8 * n.distance]
            n_pairs += 1
            if len(good) < 16:
                continue
            p1 = np.float64([kps[i][m.queryIdx].pt for m in good])
            p2 = np.float64([kps[j][m.trainIdx].pt for m in good])
            E, mask = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, threshold=2.0)
            if E is not None and mask is not None and mask.sum() >= 15:
                n_verified += 1
    t_match = time.perf_counter() - t0
    return {"t_features_s": t_feat, "t_match_verify_s": t_match,
            "t_total_s": t_feat + t_match, "verified_edges": n_verified, "pairs": n_pairs}


def tpu_pipeline(images: list[np.ndarray], image_size: int) -> dict:
    from sfm_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig
    from sfm_tpu.pipeline import ingest, stages

    cfg = PipelineConfig(
        sift=SiftConfig(image_max_dim=image_size, max_keypoints=4096),
        match=MatchConfig(max_matches=1024),
        ransac=RansacConfig(num_hypotheses=1024, error_threshold_px=2.0),
        verbose=False,
    )
    # Warm the compile caches on a copy so wall-clock measures steady state
    # (the reference CPU pipeline has no compile step to amortize).
    warm = [im + 0.01 for im in images[: min(len(images), 8)]]
    b = ingest.load_images(warm, cfg.sift)
    f = stages.extract_stage(b, cfg)
    stages.match_and_verify_stage(f, stages.exhaustive_pairs(len(warm)), b.intrinsics, cfg)

    t0 = time.perf_counter()
    batch = ingest.load_images(images, cfg.sift)
    feats = stages.extract_stage(batch, cfg)
    t_feat = time.perf_counter() - t0
    t0 = time.perf_counter()
    pairs = stages.exhaustive_pairs(len(images))
    graph = stages.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg)
    t_match = time.perf_counter() - t0
    return {"t_features_s": t_feat, "t_match_verify_s": t_match,
            "t_total_s": t_feat + t_match, "verified_edges": int(graph.ok.sum()),
            "pairs": len(pairs)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from sfm_tpu.utils.synthetic import render_blob_scene

    imgs, scene = render_blob_scene(
        image_size=(size, size), num_images=n, num_blobs=300,
        focal=size * 1.2, arc_fraction=0.02 * n,
    )
    images = list(imgs)

    cpu = cpu_pipeline(images, focal=size * 1.2)
    tpu = tpu_pipeline(images, image_size=size)
    ratio = tpu["t_total_s"] / cpu["t_total_s"]
    row = {"n_images": n, "image_size": size, "cpu": cpu, "tpu": tpu,
           "tpu_over_cpu_wallclock": ratio}
    print(json.dumps(row, indent=2))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/oracle_log.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
