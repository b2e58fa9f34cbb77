"""Diagnose the pose-graph (rotation+translation averaging) solution on a
saved ladder match graph, against ground truth — host-only, no device.

    python benchmarks/pg_diag.py <ladder_cache_dir> <render_cache.npz>

Reports: edge counts, rotation-averaging residuals, camera-center RMSE of
the pose-graph solution vs GT after sim3 alignment, and the per-camera
error distribution (bend diagnosis: is the pose graph itself straight?).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    cache_dir, render_cache = sys.argv[1], sys.argv[2]

    from sfm_tpu.geometry.similarity import umeyama_np
    from sfm_tpu.pipeline.global_pose import (
        pose_graph_poses, _so3_exp_np,
    )
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]
    Rgt = _so3_exp_np(gt_rvecs)
    c_gt = -np.einsum("nji,nj->ni", Rgt, gt_tvecs)

    store = ArtifactStore(cache_dir)
    graph = store.load_graph()
    N = len(c_gt)
    ok = np.asarray(graph.ok)
    pose_ok = np.asarray(graph.pose_ok) if graph.pose_ok is not None else ok
    use = ok & pose_ok
    pairs = np.asarray(graph.pairs)[use]
    span = np.abs(pairs[:, 0] - pairs[:, 1])
    span = np.minimum(span, N - span)  # ring distance
    print(f"edges: {use.sum()} of {len(ok)} candidates; "
          f"ring-span percentiles 50/90/99/max = "
          f"{np.percentile(span, [50, 90, 99]).astype(int).tolist()} {span.max()}",
          flush=True)

    # Edge relative-pose quality vs GT (rotation part).
    from sfm_tpu.pipeline.global_pose import _so3_log_np
    rel_r = np.asarray(graph.rvec)[use]
    Rrel = _so3_exp_np(rel_r)
    Rij_gt = Rgt[pairs[:, 1]] @ np.transpose(Rgt[pairs[:, 0]], (0, 2, 1))
    dR = np.einsum("eij,ekj->eik", Rrel, Rij_gt)
    ang = np.degrees(np.linalg.norm(_so3_log_np(dR), axis=1))
    print(f"edge rel-rot error vs GT (deg): med={np.median(ang):.3f} "
          f"p90={np.percentile(ang, 90):.3f} p99={np.percentile(ang, 99):.2f} "
          f"max={ang.max():.1f}  (>10deg: {(ang > 10).sum()})", flush=True)

    # Edge translation-direction quality vs GT, in world frame via GT rots.
    rel_t = np.asarray(graph.tvec)[use]
    d_est = -np.einsum("eji,ekj,ek->ei", Rgt[pairs[:, 0]], Rrel, rel_t)
    nrm = np.linalg.norm(d_est, axis=1)
    d_est /= np.maximum(nrm, 1e-12)[:, None]
    d_gt = c_gt[pairs[:, 1]] - c_gt[pairs[:, 0]]
    d_gt /= np.maximum(np.linalg.norm(d_gt, axis=1), 1e-12)[:, None]
    dirang = np.degrees(np.arccos(np.clip((d_est * d_gt).sum(1), -1, 1)))
    print(f"edge t-direction error vs GT (deg): med={np.median(dirang):.2f} "
          f"p90={np.percentile(dirang, 90):.1f} p99={np.percentile(dirang, 99):.1f} "
          f"(>30deg: {(dirang > 30).sum()}, >90deg: {(dirang > 90).sum()})",
          flush=True)

    t0 = time.perf_counter()
    rvecs, tvecs, solved = pose_graph_poses(graph, N)
    t1 = time.perf_counter()
    print(f"pose_graph_poses: {solved.sum()}/{N} solved in {t1 - t0:.0f}s",
          flush=True)

    R = _so3_exp_np(rvecs[solved])
    c = -np.einsum("nji,nj->ni", R, tvecs[solved])
    s, Rw, t = umeyama_np(c, c_gt[solved])
    fit = s * c @ np.asarray(Rw).T + np.asarray(t)
    err = np.linalg.norm(fit - c_gt[solved], axis=1)
    radius = float(np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean())
    print(f"pose-graph center RMSE vs GT: {np.sqrt((err ** 2).mean()):.4f} "
          f"(radius {radius:.2f}; {100 * np.sqrt((err ** 2).mean()) / radius:.2f}%) "
          f"med={np.median(err):.4f} p99={np.percentile(err, 99):.3f} "
          f"max={err.max():.3f}", flush=True)

    # Rotation error of the averaged rotations vs GT (after global align).
    # Solve the global rotation G minimizing sum ||R_i - Rgt_i G||: G from
    # the polar factor of sum Rgt_i^T R_i.
    M = np.einsum("nji,njk->ik", Rgt[solved], R)
    U, _, Vt = np.linalg.svd(M)
    G = U @ Vt
    if np.linalg.det(G) < 0:
        G = U @ np.diag([1, 1, -1]) @ Vt
    dRr = np.einsum("nij,kj,nlk->nil", Rgt[solved], G, R)
    rot_err = np.degrees(np.linalg.norm(_so3_log_np(dRr), axis=1))
    print(f"averaged-rotation error vs GT (deg): med={np.median(rot_err):.3f} "
          f"p90={np.percentile(rot_err, 90):.3f} max={rot_err.max():.1f}",
          flush=True)


if __name__ == "__main__":
    main()
