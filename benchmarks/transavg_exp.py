"""Host-only translation-averaging experiments on a saved 10k match graph.

The eigen (smallest-eigenvector) formulation collapses on the real 10k
graph (pg_diag: center RMSE 64-100% of radius) even with GN-averaged
rotations at 1.5 deg — with noisy directions (p90 16 deg) the projected
Laplacian's smallest eigenvector is a low-frequency bend/collapse mode, not
the true shape. Candidate fixes, each scored vs GT:

  A) current inverse-iteration eigen solve (control)
  B) constrained linear solve: min c^T H c  s.t.  a^T c = 1 with
     a = grad of sum_e w_e d_e . (c_j - c_i)  ->  c ~ (H+eps)^(-1) a
     (collapse and bend modes have a^T c ~ 0, the true shape has a^T c >> 0)
  C) B with IRLS rounds
  D) A seeded with GT-ish centers (what straighten could pass from the rec)

    python benchmarks/transavg_exp.py <ladder_cache_dir> <render_cache.npz>
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def solve_constrained(pairs, d, n_ids, w0, num_rounds=4, huber=0.1):
    """min c^T H c s.t. a^T c = 1, IRLS-reweighted; pairs are LOCAL ids."""
    from scipy.sparse import coo_matrix, identity
    from scipy.sparse.linalg import splu

    pi, pj = pairs[:, 0], pairs[:, 1]
    E = len(pairs)
    P = np.eye(3)[None] - d[:, :, None] * d[:, None, :]
    kk, ll = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    n = n_ids
    c = None
    w = w0.copy()
    for rnd in range(num_rounds):
        if c is not None:
            delta = c[pj] - c[pi]
            base = np.linalg.norm(delta, axis=1)
            res = np.linalg.norm(np.einsum("eij,ej->ei", P, delta), axis=1)
            scale = huber * max(np.median(base), 1e-9)
            w = w0 * np.where(res <= scale, 1.0, scale / np.maximum(res, 1e-12))
        wP = w[:, None, None] * P
        bi, bj = 3 * pi, 3 * pj
        rows, cols, vals = [], [], []
        for br, bc, sgn in ((bi, bi, 1.0), (bj, bj, 1.0),
                            (bi, bj, -1.0), (bj, bi, -1.0)):
            rows.append((br[:, None, None] + kk[None]).ravel())
            cols.append((bc[:, None, None] + ll[None]).ravel())
            vals.append((sgn * wP).ravel())
        H = coo_matrix((np.concatenate(vals),
                        (np.concatenate(rows), np.concatenate(cols))),
                       shape=(3 * n, 3 * n)).tocsc()
        # a = gradient of sum_e w_e d_e.(c_j - c_i): +wd at j, -wd at i.
        a = np.zeros((n, 3))
        np.add.at(a, pj, w[:, None] * d)
        np.add.at(a, pi, -w[:, None] * d)
        eps = 1e-8 * (H.diagonal().sum() / (3 * n) + 1e-12)
        lu = splu(H + eps * identity(3 * n, format="csc"))
        c = lu.solve(a.ravel()).reshape(n, 3)
        c -= c.mean(0)
        s = np.einsum("ei,ei->e", c[pj] - c[pi], d)
        med = np.median(s)
        if med < 0:
            c, med = -c, -med
        c = c / max(abs(med), 1e-12)
    return c


def main():
    cache_dir, render_cache = sys.argv[1], sys.argv[2]

    from sfm_tpu.pipeline.global_pose import (
        rotation_averaging, translation_averaging, _so3_exp_np,
    )
    from sfm_tpu.geometry.similarity import umeyama_np
    from sfm_tpu.scene.artifacts import ArtifactStore

    data = np.load(render_cache)
    Rgt = _so3_exp_np(data["scene_rvecs"])
    c_gt = -np.einsum("nji,nj->ni", Rgt, data["scene_tvecs"])
    N = len(c_gt)
    radius = float(np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean())

    store = ArtifactStore(cache_dir)
    graph = store.load_graph()
    ok = np.asarray(graph.ok)
    pose_ok = np.asarray(graph.pose_ok) if graph.pose_ok is not None else ok
    use = ok & pose_ok
    pairs = np.asarray(graph.pairs)[use]
    rel_r = np.asarray(graph.rvec)[use]
    rel_t = np.asarray(graph.tvec)[use]
    wts = np.asarray(graph.num_inliers)[use].astype(np.float64)

    t0 = time.perf_counter()
    R, valid, res_rad = rotation_averaging(pairs, rel_r, N, weights=wts,
                                           num_iters=12)
    print(f"rotation averaging: {time.perf_counter()-t0:.0f}s", flush=True)
    Rrel = _so3_exp_np(rel_r)
    d = -np.einsum("eji,ekj,ek->ei", R[pairs[:, 0]], Rrel, rel_t)
    t_wts = wts.copy()
    med = np.median(res_rad[np.isfinite(res_rad)])
    t_wts[res_rad > max(3.0 * med, np.radians(10.0))] = 0.0

    def score(tag, centers, solved):
        c = centers[solved]
        s, Rw, t = umeyama_np(c, c_gt[solved])
        fit = s * c @ np.asarray(Rw).T + np.asarray(t)
        err = np.linalg.norm(fit - c_gt[solved], axis=1)
        rmse = np.sqrt((err ** 2).mean())
        print(f"{tag}: RMSE={rmse:.4f} ({100*rmse/radius:.2f}% of radius) "
              f"med={np.median(err):.3f} max={err.max():.2f} "
              f"[{solved.sum()}/{N}]", flush=True)

    # A) control: current eigen solve.
    t0 = time.perf_counter()
    cA, solvedA = translation_averaging(pairs, d, N, valid, weights=t_wts)
    print(f"A eigen: {time.perf_counter()-t0:.0f}s", flush=True)
    score("A eigen (current)     ", cA, solvedA)

    # B/C) constrained linear solve. Reuse translation_averaging's edge
    # filtering inline: drop zero-weight/invalid edges, largest component.
    keep = (t_wts > 0) & valid[pairs[:, 0]] & valid[pairs[:, 1]]
    keep &= np.isfinite(d).all(axis=1)
    p2, d2, w2 = pairs[keep], d[keep], t_wts[keep]
    d2 = d2 / np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), 1e-12)
    from sfm_tpu.pipeline.global_pose import _largest_component
    solved = _largest_component(p2, N) & valid
    ec = solved[p2[:, 0]] & solved[p2[:, 1]]
    p2, d2, w2 = p2[ec], d2[ec], w2[ec]
    w2 = np.maximum(w2 / w2.mean(), 1e-6)
    ids = np.where(solved)[0]
    remap = -np.ones(N, np.int64)
    remap[ids] = np.arange(len(ids))
    pl = remap[p2]

    t0 = time.perf_counter()
    cB = solve_constrained(pl, d2, len(ids), w2, num_rounds=1)
    print(f"B 1 round: {time.perf_counter()-t0:.0f}s", flush=True)
    full = np.zeros((N, 3)); full[ids] = cB
    score("B constrained (1 rnd) ", full, solved)

    t0 = time.perf_counter()
    cC = solve_constrained(pl, d2, len(ids), w2, num_rounds=4)
    print(f"C 4 rounds: {time.perf_counter()-t0:.0f}s", flush=True)
    full = np.zeros((N, 3)); full[ids] = cC
    score("C constrained (IRLS 4)", full, solved)

    # D) eigen solve seeded with GT centers (the best case a rec seed gives).
    t0 = time.perf_counter()
    cD, solvedD = translation_averaging(pairs, d, N, valid, weights=t_wts,
                                        centers0=c_gt)
    print(f"D eigen(seed=GT): {time.perf_counter()-t0:.0f}s", flush=True)
    score("D eigen, GT seed      ", cD, solvedD)


if __name__ == "__main__":
    main()
