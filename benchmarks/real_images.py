"""Real-image end-to-end benchmark (VERDICT r3 next #5, BASELINE.json:5).

Renders the textured-corner scene (real photographic textures, JPEG + EXIF
through the production ingest path — benchmarks/textured_scene.py), then:

  1. reconstructs with sfm_tpu (full pipeline, image PATHS in),
  2. reconstructs with the OpenCV-CPU incremental pipeline on the SAME files,
  3. scores both against exact ground truth: sim3-aligned camera-center RMSE
     (normalized by mean orbit radius) + rotation error + mean reprojection.

    python benchmarks/real_images.py [num_images] [size]

Appends a row to benchmarks/real_log.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pose_errors(rvecs, tvecs, registered, gt_rvecs, gt_tvecs):
    """(center_rmse_frac, rot_err_deg_mean) after sim3 alignment vs GT."""
    import jax.numpy as jnp

    from sfm_tpu.geometry.projection import camera_center
    from sfm_tpu.geometry.rotations import aa_to_matrix
    from sfm_tpu.geometry.similarity import umeyama, apply_sim3

    reg = np.where(registered)[0]
    if len(reg) < 3:
        return float("nan"), float("nan")
    est = np.asarray(camera_center(jnp.asarray(rvecs[reg], jnp.float32),
                                   jnp.asarray(tvecs[reg], jnp.float32)))
    gt = np.asarray(camera_center(jnp.asarray(gt_rvecs[reg]), jnp.asarray(gt_tvecs[reg])))
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    est_al = np.asarray(apply_sim3(s, R, t, jnp.asarray(est)))
    scale = float(np.linalg.norm(gt - gt.mean(0), axis=1).mean())
    rmse = float(np.sqrt(((est_al - gt) ** 2).sum(-1).mean())) / max(scale, 1e-9)

    # Rotation error: estimated world frame differs from GT by the aligning
    # rotation R: R_gt ~= R_est @ R^T (centers map with x -> sRx + t).
    Rg = np.asarray(aa_to_matrix(jnp.asarray(gt_rvecs[reg])))
    Re = np.asarray(aa_to_matrix(jnp.asarray(rvecs[reg], jnp.float32)))
    Ralign = np.asarray(R)
    errs = []
    for a, b in zip(Re, Rg):
        dR = (a @ Ralign.T) @ b.T
        c = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
        errs.append(np.degrees(np.arccos(c)))
    return rmse, float(np.mean(errs))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    from textured_scene import render_textured_corner
    from cpu_incremental import opencv_incremental

    here = os.path.dirname(os.path.abspath(__file__))
    scene_dir = os.path.join(here, f".real_scene_{n}_{size}")
    paths, K, gt_rvecs, gt_tvecs = render_textured_corner(scene_dir, n, size)
    f_px = float(K[0, 0])

    # --- ours ---
    from sfm_tpu.config import (PipelineConfig, SiftConfig, MatchConfig,
                                RansacConfig, EngineConfig, BAConfig)
    from sfm_tpu.pipeline.run import run_pipeline

    cfg = PipelineConfig(
        sift=SiftConfig(image_max_dim=size, max_keypoints=1024, max_candidates=4096),
        match=MatchConfig(max_matches=512, min_matches=12),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=12, error_threshold_px=2.0),
        engine=EngineConfig(init_min_inliers=25, abs_pose_min_inliers=10,
                            local_ba_window=6, global_ba_every=8),
        ba=BAConfig(max_iterations=15),
        pair_mode="exhaustive",
        verbose=True,
        artifact_dir=os.path.join(here, f".real_cache_{n}_{size}"),
    )
    t0 = time.perf_counter()
    rec = run_pipeline(paths, cfg)
    ours_s = time.perf_counter() - t0
    ours_rmse, ours_rot = pose_errors(rec.rvecs, rec.tvecs, rec.registered,
                                      gt_rvecs, gt_tvecs)
    summ = rec.summary()

    # EXIF check: ingest must have picked the 35mm-derived focal, not the
    # 1.2*dim fallback (textured_scene.py renders at 40/36*size ≈ 1.111).
    exif_used = abs(float(rec.intrinsics[0, 0]) - f_px) < 0.02 * f_px

    # --- OpenCV CPU incremental on the identical files ---
    cv = opencv_incremental(paths, f_px=f_px)
    cv_rmse, cv_rot = pose_errors(cv["rvecs"].astype(np.float32),
                                  cv["tvecs"].astype(np.float32),
                                  cv["registered"], gt_rvecs, gt_tvecs)

    row = {
        "bench": "real_images_textured_corner",
        "n_images": n, "image_size": size, "exif_focal_used": bool(exif_used),
        "ours": {
            "registered": int(np.sum(rec.registered)),
            "points": summ["num_points"],
            "mean_reproj_px": summ["mean_reproj_error_px"],
            "center_rmse_frac": ours_rmse, "rot_err_deg": ours_rot,
            "wall_clock_s": ours_s,
        },
        "opencv_cpu": {
            "registered": int(np.sum(cv["registered"])),
            "points": cv["num_points"],
            "mean_reproj_px": cv["mean_reproj_px"],
            "center_rmse_frac": cv_rmse, "rot_err_deg": cv_rot,
            "wall_clock_s": cv["wall_clock_s"],
        },
    }
    print(json.dumps(row, indent=2, default=str))
    with open(os.path.join(here, "real_log.jsonl"), "a") as f:
        f.write(json.dumps(row, default=str) + "\n")


if __name__ == "__main__":
    main()
