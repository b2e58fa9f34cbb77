"""Global-engine phase diagnostic (VERDICT r4: engine_mode=global RMSE bar).

Loads a ladder cache's features + verified match graph, re-derives the exact
ground-truth orbit poses (make_orbit_scene is deterministic in the ladder's
params — no rendering needed), then walks the global engine phase by phase
and scores camera-center RMSE (sim3-aligned, as a fraction of orbit radius)
plus rotation error after EACH phase:

  1. rotation averaging alone            (graph quality for R)
  2. + translation averaging             (graph quality for centers)
  3. + triangulation                     (track survival at averaged poses)
  4. + merged polish (BA->filter->BA)    (what BA can and cannot unbend)

    JAX_PLATFORMS= python benchmarks/global_diag.py <cache_dir> <n> [size]

Runs fine on CPU (host pose-graph solves + batched CPU BA) so it never
contends with a TPU ladder run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def center_rmse(rvecs, tvecs, gt_r, gt_t, sel):
    import jax.numpy as jnp

    from sfm_tpu.geometry.projection import camera_center
    from sfm_tpu.geometry.similarity import umeyama, apply_sim3

    est = np.asarray(camera_center(jnp.asarray(rvecs[sel]), jnp.asarray(tvecs[sel])))
    gt = np.asarray(camera_center(jnp.asarray(gt_r[sel]), jnp.asarray(gt_t[sel])))
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt))
    al = np.asarray(apply_sim3(s, R, t, jnp.asarray(est)))
    return float(np.sqrt(((al - gt) ** 2).sum(-1).mean()))


def rot_err_deg(rvecs, gt_r, sel):
    from sfm_tpu.pipeline.global_pose import _so3_exp_np

    R_est = _so3_exp_np(rvecs[sel].astype(np.float64))
    R_gt = _so3_exp_np(gt_r[sel].astype(np.float64))
    # Gauge acts on the WORLD side (right-multiplication): R_est ~ R_gt G.
    M = np.einsum("nji,njk->ik", R_gt, R_est)
    U, _, Vt = np.linalg.svd(M)
    G2 = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt
    rel = np.einsum("nij,kj,nlk->nil", R_gt, G2, R_est)  # Rg G^T Re^T
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    return float(np.degrees(np.median(np.arccos(tr))))


def main():
    cache = sys.argv[1]
    n = int(sys.argv[2])
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    if jax.default_backend() != "tpu" or os.environ.get("SFM_TPU_DIAG_CPU"):
        pass
    if os.environ.get("SFM_TPU_DIAG_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    from sfm_tpu.config import (PipelineConfig, SiftConfig, MatchConfig,
                                RansacConfig, EngineConfig, BAConfig)
    from sfm_tpu.scene.artifacts import ArtifactStore
    from sfm_tpu.utils.synthetic import make_orbit_scene

    scene = make_orbit_scene(
        num_cameras=n, num_points=min(60 + 8 * n, 600), radius=4.0,
        point_extent=1.2, image_size=(size, size), focal=size * 1.2, seed=0,
        arc_fraction=min(0.02 * n, 1.0),
    )
    gt_r, gt_t = scene.rvecs, scene.tvecs

    store = ArtifactStore(cache)
    feats = store.load_features()
    graph = store.load_graph()
    intr = np.tile(np.array(
        [size * 1.2, size * 1.2, size / 2, size / 2, 0, 0],
        np.float32), (n, 1))

    cfg = PipelineConfig(
        sift=SiftConfig(image_max_dim=size, max_keypoints=1024),
        match=MatchConfig(max_matches=512, min_matches=12),
        ransac=RansacConfig(num_hypotheses=512, min_inliers=12,
                            error_threshold_px=2.0),
        engine=EngineConfig(max_images=max(4096, n),
                            max_points=max(1 << 18, 512 * n),
                            max_observations=max(1 << 20, 4096 * n)),
        ba=BAConfig(max_iterations=15),
        verbose=True,
    )

    from sfm_tpu.pipeline.global_pose import (pose_graph_poses,
                                              rotation_averaging,
                                              retriangulate_reconstruction)
    from sfm_tpu.pipeline.partition import _merged_polish
    from sfm_tpu.scene.tracks import build_tracks
    from sfm_tpu.scene.state import Reconstruction

    out = {"cache": cache, "n": n}

    # Phase 1+2: averaging.
    t0 = time.perf_counter()
    rvecs, tvecs, valid = pose_graph_poses(graph, n)
    out["avg_s"] = round(time.perf_counter() - t0, 2)
    sel = np.where(valid)[0]
    out["avg_solved"] = int(valid.sum())
    out["avg_rot_med_deg"] = round(rot_err_deg(rvecs, gt_r, sel), 4)
    out["avg_center_rmse"] = round(center_rmse(rvecs, tvecs, gt_r, gt_t, sel), 4)
    print(json.dumps(out))

    # Phase 3: tracks + triangulation at the averaged poses.
    tracks = build_tracks(graph, n, feats.xy.shape[1])
    keep = valid[tracks.obs_image]
    cnt = np.bincount(tracks.track_id[keep], minlength=tracks.num_tracks)
    keep &= cnt[tracks.track_id] >= 2
    tid = tracks.track_id[keep]
    remap = -np.ones(tracks.num_tracks, np.int64)
    used = np.unique(tid)
    remap[used] = np.arange(len(used))
    oi = tracks.obs_image[keep].astype(np.int32)
    okp = tracks.obs_kp[keep].astype(np.int32)
    P = len(used)
    rec = Reconstruction(
        intrinsics=intr, rvecs=rvecs.astype(np.float32),
        tvecs=tvecs.astype(np.float32), registered=valid.copy(),
        points=np.zeros((P, 3), np.float32), point_errors=np.zeros(P, np.float32),
        point_valid=np.ones(P, bool), obs_point=remap[tid].astype(np.int32),
        obs_image=oi, obs_kp=okp, obs_uv=feats.xy[oi, okp].astype(np.float32),
    )
    out["tracks"] = int(P)
    out["obs"] = int(len(oi))

    # Phase 2.5: GLOMAP-class global positioning (joint centers + points
    # from observation rays, rotations fixed) seeded by the averaged
    # centers — measures how much the ray objective stiffens the solution
    # over pairwise direction averaging.
    from sfm_tpu.pipeline.global_pose import (_so3_exp_np,
                                              global_positioning)
    R_all = _so3_exp_np(rvecs.astype(np.float64))
    cen0 = -np.einsum("nji,nj->ni", R_all, tvecs.astype(np.float64))
    f = intr[oi, 0:2]
    pp = intr[oi, 2:4]
    xn = (rec.obs_uv - pp) / f
    rays_cam = np.concatenate([xn, np.ones((len(oi), 1))], 1)
    rays = np.einsum("eji,ej->ei", R_all[oi], rays_cam)
    t0 = time.perf_counter()
    cpos, Xpos, sc, sp = global_positioning(
        oi, rec.obs_point, rays, n, P, valid, centers0=cen0,
        verbose=True)
    out["pos_s"] = round(time.perf_counter() - t0, 2)
    tv_pos = -np.einsum("nij,nj->ni", R_all, cpos)
    out["pos_center_rmse"] = round(
        center_rmse(rvecs, tv_pos.astype(np.float32), gt_r, gt_t,
                    np.where(sc & valid)[0]), 4)
    print(json.dumps(out))
    # Adopt the positioned centers + points for the downstream phases.
    rec.tvecs = tv_pos.astype(np.float32)
    rec.points = Xpos.astype(np.float32)
    rec.point_valid = sp.copy()

    t0 = time.perf_counter()
    n_tri = retriangulate_reconstruction(rec, cfg=cfg)
    out["tri_s"] = round(time.perf_counter() - t0, 2)
    out["tri_valid"] = int(n_tri)
    live = rec.point_valid[rec.obs_point]
    out["obs_live"] = int(live.sum())
    print(json.dumps(out))

    # Phase 4: the merged polish.
    t0 = time.perf_counter()
    _merged_polish(rec, cfg)
    out["polish_s"] = round(time.perf_counter() - t0, 2)
    out["polish_center_rmse"] = round(
        center_rmse(rec.rvecs, rec.tvecs, gt_r, gt_t,
                    np.where(rec.registered)[0]), 4)
    print(json.dumps(out))

    # Phase 5: fuse -> reposition -> retriangulate -> polish rounds
    # (mirrors pipeline/global_engine.py's production loop).
    from sfm_tpu.pipeline.merge import merge_tracks_by_correspondence
    from sfm_tpu.pipeline.global_pose import reposition_reconstruction
    rounds = []
    t0 = time.perf_counter()
    for rnd in range(3):
        n_fused = merge_tracks_by_correspondence(
            rec, graph, min_votes=2, dist_frac=0.15 if rnd == 0 else 0.05,
            verbose=True)
        if n_fused == 0 and rnd > 0:
            break
        reposition_reconstruction(rec, verbose=True)
        retriangulate_reconstruction(rec, cfg=cfg)
        _merged_polish(rec, cfg)
        rounds.append({
            "fused": int(n_fused),
            "center_rmse": round(center_rmse(
                rec.rvecs, rec.tvecs, gt_r, gt_t,
                np.where(rec.registered)[0]), 4),
        })
        print(json.dumps(rounds[-1]))
    out["refine_s"] = round(time.perf_counter() - t0, 2)
    out["refine_rounds"] = rounds
    out["final_center_rmse"] = round(
        center_rmse(rec.rvecs, rec.tvecs, gt_r, gt_t,
                    np.where(rec.registered)[0]), 4)
    out["final_rot_med_deg"] = round(
        rot_err_deg(rec.rvecs, gt_r, np.where(rec.registered)[0]), 4)
    s = rec.summary()
    out["points"] = s["num_points"]
    out["mean_reproj_px"] = round(s["mean_reproj_error_px"], 4)
    print(json.dumps(out))
    with open("benchmarks/global_diag.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
