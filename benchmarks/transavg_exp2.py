"""Translation-averaging experiment round 2 (see transavg_exp.py).

Variants vs GT on the saved 10k graph:
  G) GT directions + uniform weights through the constrained solve —
     formulation check (should be ~0%).
  E) real directions, constrained solve + ANGLE-based IRLS
     (res normalized by per-edge baseline, so long edges aren't punished).
  F) E + parallax^2 direction-reliability prior (direction noise of a
     two-view pose scales ~1/parallax; computed with engine._edge_parallax_deg).

    python benchmarks/transavg_exp2.py <ladder_cache_dir> <render_cache.npz>
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def solve_constrained(pairs, d, n, w0, num_rounds=4, angle_sigma=0.10):
    from scipy.sparse import coo_matrix, identity
    from scipy.sparse.linalg import splu

    pi, pj = pairs[:, 0], pairs[:, 1]
    P = np.eye(3)[None] - d[:, :, None] * d[:, None, :]
    kk, ll = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    c = None
    w = w0.copy()
    for rnd in range(num_rounds):
        if c is not None:
            delta = c[pj] - c[pi]
            base = np.linalg.norm(delta, axis=1)
            sin_ang = np.linalg.norm(np.einsum("eij,ej->ei", P, delta), axis=1) \
                / np.maximum(base, 1e-12)
            w = w0 * np.where(sin_ang <= angle_sigma, 1.0,
                              angle_sigma / np.maximum(sin_ang, 1e-12))
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
        rotation_averaging, _so3_exp_np, _largest_component,
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
    use = np.where(ok & pose_ok)[0]
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
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    t_wts = wts.copy()
    med = np.median(res_rad[np.isfinite(res_rad)])
    t_wts[res_rad > max(3.0 * med, np.radians(10.0))] = 0.0

    # Parallax per edge (needs features; slow load).
    t0 = time.perf_counter()
    feats = store.load_features()
    meta = None
    try:
        meta = store.load("meta")
    except Exception:
        pass
    if meta is not None and "intrinsics" in meta:
        intr = meta["intrinsics"]
    else:
        # ladder scenes: f = 1.2 * size, size from render cache
        size = data["canvases"].shape[-1] if "canvases" in data else 256
        intr = np.tile([1.2 * size, 1.2 * size, size / 2, size / 2, 0, 0],
                       (N, 1)).astype(np.float32)
    print(f"features loaded: {time.perf_counter()-t0:.0f}s", flush=True)

    from sfm_tpu.pipeline.engine import _edge_parallax_deg
    t0 = time.perf_counter()
    par = np.concatenate([
        _edge_parallax_deg(graph, use[s:s+4096], feats, intr)
        for s in range(0, len(use), 4096)])
    print(f"parallax: {time.perf_counter()-t0:.0f}s "
          f"med={np.median(par):.2f} p10={np.percentile(par,10):.2f} "
          f"p90={np.percentile(par,90):.2f} deg", flush=True)

    # GT direction error vs parallax (sanity: does low parallax predict bad d?)
    d_gt = c_gt[pairs[:, 1]] - c_gt[pairs[:, 0]]
    d_gt /= np.maximum(np.linalg.norm(d_gt, axis=1, keepdims=True), 1e-12)
    dirang = np.degrees(np.arccos(np.clip((d * d_gt).sum(1), -1, 1)))
    for lo, hi in ((0, 1), (1, 3), (3, 8), (8, 90)):
        m = (par >= lo) & (par < hi)
        if m.sum():
            print(f"  parallax[{lo},{hi}): edges={m.sum()} "
                  f"dir-err med={np.median(dirang[m]):.2f} "
                  f"p90={np.percentile(dirang[m], 90):.1f} deg", flush=True)

    def prep(w_in):
        keep = (w_in > 0) & valid[pairs[:, 0]] & valid[pairs[:, 1]]
        keep &= np.isfinite(d).all(axis=1)
        p2, d2, w2 = pairs[keep], d[keep], w_in[keep]
        solved = _largest_component(p2, N) & valid
        ec = solved[p2[:, 0]] & solved[p2[:, 1]]
        p2, d2, w2 = p2[ec], d2[ec], w2[ec]
        w2 = np.maximum(w2 / w2.mean(), 1e-6)
        ids = np.where(solved)[0]
        remap = -np.ones(N, np.int64)
        remap[ids] = np.arange(len(ids))
        return remap[p2], d2, w2, ids, solved

    def score(tag, pl, cl, ids, solved):
        full = np.zeros((N, 3)); full[ids] = cl
        c = full[solved]
        s, Rw, t = umeyama_np(c, c_gt[solved])
        fit = s * c @ np.asarray(Rw).T + np.asarray(t)
        err = np.linalg.norm(fit - c_gt[solved], axis=1)
        rmse = np.sqrt((err ** 2).mean())
        print(f"{tag}: RMSE={rmse:.4f} ({100*rmse/radius:.2f}%) "
              f"med={np.median(err):.3f} max={err.max():.2f}", flush=True)

    # G) formulation check with GT directions.
    pl, d2, w2, ids, solved = prep(np.ones_like(t_wts))
    dg = d_gt[(np.ones_like(t_wts) > 0)][:]  # same keep mask as prep(1s)
    # rebuild GT dirs aligned with prep's filtering: redo inline
    keep = np.isfinite(d).all(axis=1)
    # prep(ones) keeps exactly `keep & component` edges in order; reuse mask:
    cG = solve_constrained(pl, d_gt[keep][solved[pairs[keep][:, 0]] & solved[pairs[keep][:, 1]]],
                           len(ids), w2, num_rounds=1)
    score("G GT-dirs, uniform, 1 rnd", pl, cG, ids, solved)

    # E) angle IRLS, inlier weights.
    pl, d2, w2, ids, solved = prep(t_wts)
    cE = solve_constrained(pl, d2, len(ids), w2, num_rounds=4)
    score("E angle-IRLS 4           ", pl, cE, ids, solved)

    # F) parallax^2 prior * inlier weights, angle IRLS.
    pw = t_wts * np.minimum(par / 8.0, 1.0) ** 2
    pl, d2, w2, ids, solved = prep(pw)
    cF = solve_constrained(pl, d2, len(ids), w2, num_rounds=4)
    score("F parallax^2 prior       ", pl, cF, ids, solved)

    # F1) parallax prior only (no inlier count).
    pw = np.where(t_wts > 0, 1.0, 0.0) * np.minimum(par / 8.0, 1.0) ** 2
    pl, d2, w2, ids, solved = prep(pw)
    cF1 = solve_constrained(pl, d2, len(ids), w2, num_rounds=4)
    score("F1 parallax^2 only       ", pl, cF1, ids, solved)


if __name__ == "__main__":
    main()
