"""Host-only rotation-averaging experiments on a saved 10k match graph.

Separates three failure hypotheses for the real-graph averaging bend
(pg_diag: med rot error 24.4 deg despite med edge error 0.28 deg):
  A) gross edges poison the IRLS (run with GT-clean edges only),
  B) the solver is convergence-limited on this topology (run more iters),
  C) the inlier-count weighting amplifies aliased edges (run unweighted).

    python benchmarks/rotavg_exp.py <ladder_cache_dir> <render_cache.npz>
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    cache_dir, render_cache = sys.argv[1], sys.argv[2]

    from sfm_tpu.pipeline.global_pose import (
        rotation_averaging, _so3_exp_np, _so3_log_np,
    )
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    Rgt = _so3_exp_np(data["scene_rvecs"])
    N = len(Rgt)

    store = ArtifactStore(cache_dir)
    graph = store.load_graph()
    ok = np.asarray(graph.ok)
    pose_ok = np.asarray(graph.pose_ok) if graph.pose_ok is not None else ok
    use = ok & pose_ok
    pairs = np.asarray(graph.pairs)[use]
    rel_r = np.asarray(graph.rvec)[use]
    wts = np.asarray(graph.num_inliers)[use].astype(np.float64)

    Rrel = _so3_exp_np(rel_r)
    Rij_gt = Rgt[pairs[:, 1]] @ np.transpose(Rgt[pairs[:, 0]], (0, 2, 1))
    dR = np.einsum("eij,ekj->eik", Rrel, Rij_gt)
    gt_err = np.degrees(np.linalg.norm(_so3_log_np(dR), axis=1))
    print(f"E={len(pairs)}, gross(>5deg)={(gt_err > 5).sum()}, "
          f"inlier-weight of gross edges: med={np.median(wts[gt_err > 5]):.0f} "
          f"vs clean med={np.median(wts[gt_err <= 5]):.0f}", flush=True)
    # Where do the gross edges live (ring span histogram)?
    span = np.abs(pairs[:, 0] - pairs[:, 1]); span = np.minimum(span, N - span)
    for lo, hi in ((0, 16), (16, 64), (64, 160), (160, 512)):
        m = (span >= lo) & (span < hi)
        g = (gt_err[m] > 5).sum()
        print(f"  span[{lo},{hi}): edges={m.sum()} gross={g}", flush=True)

    def run(tag, p, r, w, iters=50):
        t0 = time.perf_counter()
        R, valid, _ = rotation_averaging(p, r, N, weights=w, num_iters=iters)
        dt = time.perf_counter() - t0
        M = np.einsum("nji,njk->ik", Rgt[valid], R[valid])
        U, _, Vt = np.linalg.svd(M)
        G = U @ Vt
        if np.linalg.det(G) < 0:
            G = U @ np.diag([1, 1, -1]) @ Vt
        dRr = np.einsum("nij,kj,nlk->nil", Rgt[valid], G, R[valid])
        e = np.degrees(np.linalg.norm(_so3_log_np(dRr), axis=1))
        print(f"{tag}: med={np.median(e):.3f} p90={np.percentile(e, 90):.2f} "
              f"max={e.max():.1f} deg  ({dt:.0f}s, {valid.sum()}/{N})",
              flush=True)

    clean = gt_err <= 5
    run("baseline (inlier weights, 50 iters)", pairs, rel_r, wts)
    run("GT-clean edges only                ", pairs[clean], rel_r[clean], wts[clean])
    run("unweighted                          ", pairs, rel_r, None)
    run("baseline, 300 iters                 ", pairs, rel_r, wts, iters=300)


if __name__ == "__main__":
    main()
