"""Diagnose the residual global bend in the 10k partitioned reconstruction.

The 10k#4 ladder run (2026-08-17) registered 10000/10000 at 0.488px mean
reprojection yet its camera RMSE vs GT is 1.20 on an orbit of radius 4.0
(30%) AFTER a true C=10240 global BA. This script quantifies WHERE the
deformation lives and WHY the global BA cannot remove it, working entirely
from the run's stage artifacts (no re-run needed):

  python benchmarks/bend_diag.py benchmarks/.ladder_cache_10000_256_vocab_tree \
      benchmarks/.render_cache_10000_256.npz

Reports:
  1. camera RMSE vs GT for merged_prepolish and final reconstruction;
  2. the per-camera residual profile around the orbit (is the error
     low-frequency / which arcs bend);
  3. track camera-span histogram: do any tracks span cluster seams, i.e.
     does the BA even HAVE cross-cluster constraints away from overlap
     images;
  4. merge_tracks_by_correspondence vote audit: candidate point pairs
     pre/post the 3D-distance gate at several dist_frac values.
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _centers(rvecs, tvecs):
    sys.path  # noqa
    from benchmarks.polish_repro import _exp_batch
    R = _exp_batch(np.asarray(rvecs, np.float64).astype(np.float32))
    return -np.einsum("kji,kj->ki", R, np.asarray(tvecs))


def _umeyama_np(src, dst):
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (sc ** 2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var)
    t = mu_d - s * R @ mu_s
    return s, R, t


def rmse_vs_gt(rec, scene_rvecs, scene_tvecs):
    reg = np.where(rec.registered)[0]
    est = _centers(rec.rvecs[reg], rec.tvecs[reg])
    gt = _centers(scene_rvecs[reg], scene_tvecs[reg])
    s, R, t = _umeyama_np(est, gt)
    aligned = (s * (R @ est.T)).T + t
    res = np.linalg.norm(aligned - gt, axis=1)
    return float(np.sqrt((res ** 2).mean())), reg, res


def main():
    cache_dir = sys.argv[1]
    render_cache = sys.argv[2]

    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    gt_rvecs, gt_tvecs = data["scene_rvecs"], data["scene_tvecs"]

    store = ArtifactStore(cache_dir)
    final = store.load_reconstruction(stage="reconstruction")
    pre = store.load_reconstruction(stage="merged_prepolish")

    for name, rec in (("merged_prepolish", pre), ("final", final)):
        r, reg, res = rmse_vs_gt(rec, gt_rvecs, gt_tvecs)
        # Orbit-angle-ordered residual profile: bucket by image id (capture
        # order = orbit angle for the synthetic scene).
        prof = np.full(20, np.nan)
        buckets = (reg * 20) // rec.registered.shape[0]
        for b in range(20):
            m = buckets == b
            if m.any():
                prof[b] = np.sqrt((res[m] ** 2).mean())
        print(f"{name}: RMSE {r:.4f}  profile(20 arcs) "
              + " ".join(f"{p:.2f}" for p in prof))

    # 3. Track camera-span: for each valid point, orbit-angle span of its
    # observing cameras (a seam-crossing track has span >> cluster width).
    rec = final
    pv = rec.point_valid
    val = pv[rec.obs_point]
    n_img = rec.registered.shape[0]
    ang = rec.obs_image[val].astype(np.float64) / n_img * 2 * np.pi
    pid = rec.obs_point[val]
    # circular span via resultant: span ~ small when concentrated
    cx = np.zeros(len(rec.points)); cy = np.zeros(len(rec.points)); cn = np.zeros(len(rec.points))
    np.add.at(cx, pid, np.cos(ang)); np.add.at(cy, pid, np.sin(ang)); np.add.at(cn, pid, 1.0)
    sel = cn > 0
    resultant = np.sqrt(cx[sel] ** 2 + cy[sel] ** 2) / cn[sel]
    # resultant ~1 => tightly clustered angles; <0.9 => wide span
    wide = (resultant < 0.9).sum()
    print(f"tracks: {int(sel.sum())} valid; wide-span (resultant<0.9): {wide} "
          f"({100.0 * wide / max(sel.sum(), 1):.1f}%)  "
          f"resultant pct [10,50,90]: {np.percentile(resultant, [10, 50, 90]).round(3)}")

    # 4. Vote audit on the final model (mirrors merge_tracks_by_correspondence
    # up to the distance gate).
    graph = store.load_graph()
    kb = (rec.obs_image[val].astype(np.int64) << 32) | rec.obs_kp[val].astype(np.int64)
    pb = rec.obs_point[val]
    order = np.argsort(kb, kind="stable")
    kb_s, pb_s = kb[order], pb[order]

    def lookup(img, kp):
        ko = (img.astype(np.int64) << 32) | kp.astype(np.int64)
        pos = np.minimum(np.searchsorted(kb_s, ko), len(kb_s) - 1)
        hit = kb_s[pos] == ko
        return hit, np.where(hit, pb_s[pos], -1)

    ok_e = np.where(graph.ok)[0]
    e_idx, m_idx = np.where(graph.inlier[ok_e])
    img_i = graph.pairs[ok_e][e_idx, 0]; img_j = graph.pairs[ok_e][e_idx, 1]
    kp_i = graph.idx_i[ok_e][e_idx, m_idx]; kp_j = graph.idx_j[ok_e][e_idx, m_idx]
    hi, pi = lookup(img_i, kp_i)
    hj, pj = lookup(img_j, kp_j)
    both = hi & hj & (pi != pj)
    print(f"correspondences: {len(e_idx)} inlier rows; both-tracked {int((hi & hj).sum())}; "
          f"cross-point {int(both.sum())}")
    a = np.minimum(pi[both], pj[both]).astype(np.int64)
    b = np.maximum(pi[both], pj[both]).astype(np.int64)
    key, counts = np.unique((a << 32) | b, return_counts=True)
    for mv in (1, 2, 3):
        print(f"  pairs with >= {mv} votes: {int((counts >= mv).sum())}")
    key2 = key[counts >= 2]
    pa = (key2 >> 32).astype(np.int64); pb2 = (key2 & 0xFFFFFFFF).astype(np.int64)
    pts = rec.points
    centroid = pts[pv].mean(0)
    scale = float(np.sqrt(((pts[pv] - centroid) ** 2).sum(-1).mean()))
    d = np.linalg.norm(pts[pa] - pts[pb2], axis=1)
    for frac in (0.02, 0.05, 0.1, 0.2, 0.5):
        print(f"  dist gate {frac}: keeps {int((d <= frac * scale).sum())} "
              f"of {len(d)} voted pairs")
    if len(d):
        print(f"  voted-pair 3D separation / scale pct [10,50,90]: "
              f"{(np.percentile(d, [10, 50, 90]) / scale).round(3)}")


if __name__ == "__main__":
    main()
