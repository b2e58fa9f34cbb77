"""OpenCV+scipy CPU incremental SfM — the reference-pipeline stand-in at
the RECONSTRUCTION level (SURVEY §4.3; earlier cpu_oracle.py stops at
match+verify). Classic Bundler-style recipe from external primitives only:
SIFT, BF ratio matching, essential-matrix bootstrap (recoverPose), PnP
registration (solvePnPRansac), pairwise triangulation, reprojection-gated
point upkeep, and sparse-Jacobian Levenberg-Marquardt bundle adjustment via
scipy.optimize.least_squares (trf + jac_sparsity — OpenCV ships no BA;
scipy's sparse LM is the standard CPU-reference substitute). BA runs after
bootstrap, every few registrations, and at the end — without it the
comparator drifts and collapses on real scenes (r4: 13.95 px / 67% RMSE),
which made 'parity with the reference' unfalsifiable (VERDICT r4 next #6).
"""

from __future__ import annotations

import time

import numpy as np


def _rodrigues_batch(rvecs):
    """[N,3] angle-axis -> [N,3,3] rotations, vectorized numpy."""
    th = np.linalg.norm(rvecs, axis=-1, keepdims=True)
    th = np.where(th < 1e-12, 1e-12, th)
    k = rvecs / th
    K = np.zeros(rvecs.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    s = np.sin(th)[..., None]
    c = (1.0 - np.cos(th))[..., None]
    return np.eye(3) + s * K + c * (K @ K)


def bundle_adjust_scipy(poses, pts3d, obs, kps, K, max_nfev=40, gate_px=4.0):
    """Sparse-Jacobian LM over all registered poses + points (in place).

    Parameters are [rvec|tvec] per camera + xyz per point; residuals are
    pixel reprojection errors; jac_sparsity gives least_squares the
    camera/point block structure so finite differencing stays O(1) groups.
    Camera 0 of the parameter order is held fixed (gauge). Observations
    worse than gate_px after the solve are dropped from `obs`.
    """
    import cv2
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    imgs = sorted(poses)
    cam_of = {im: k for k, im in enumerate(imgs)}
    rows = [(cam_of[im], pid, kps[im][kp], (im, kp))
            for (im, kp), pid in obs.items() if im in poses]
    if len(rows) < 20 or len(pts3d) < 8:
        return
    ci = np.asarray([r[0] for r in rows])
    pi = np.asarray([r[1] for r in rows])
    uv = np.asarray([r[2] for r in rows])
    nC, nP, nO = len(imgs), len(pts3d), len(rows)

    x0 = np.concatenate([
        np.concatenate([np.hstack([cv2.Rodrigues(poses[im][0])[0].ravel(),
                                   poses[im][1]]) for im in imgs]),
        np.asarray(pts3d).ravel(),
    ])
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def fun(x):
        cams = x[:6 * nC].reshape(nC, 6)
        pts = x[6 * nC:].reshape(nP, 3)
        R = _rodrigues_batch(cams[ci, :3])
        xc = np.einsum("oij,oj->oi", R, pts[pi]) + cams[ci, 3:]
        z = xc[:, 2]
        z = np.where(np.abs(z) < 1e-6, np.where(z < 0, -1e-6, 1e-6), z)
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        # Interleaved (u,v) per observation — must match the jac_sparsity
        # row layout below (rows 2o, 2o+1).
        return np.column_stack([u - uv[:, 0], v - uv[:, 1]]).ravel()

    A = lil_matrix((2 * nO, 6 * nC + 3 * nP), dtype=int)
    o = np.arange(nO)
    for d in range(6):
        A[2 * o, 6 * ci + d] = 1
        A[2 * o + 1, 6 * ci + d] = 1
    for d in range(3):
        A[2 * o, 6 * nC + 3 * pi + d] = 1
        A[2 * o + 1, 6 * nC + 3 * pi + d] = 1
    # Gauge: freeze camera 0 by zeroing its sparsity columns (finite
    # differences then never perturb it and LM leaves it at x0).
    A[:, :6] = 0

    res = least_squares(fun, x0, jac_sparsity=A, method="trf", x_scale="jac",
                        loss="soft_l1", f_scale=gate_px, max_nfev=max_nfev,
                        ftol=1e-6, xtol=1e-8, verbose=0)
    cams = res.x[:6 * nC].reshape(nC, 6)
    cams[0] = x0[:6]
    pts = res.x[6 * nC:].reshape(nP, 3)
    for k, im in enumerate(imgs):
        poses[im] = (cv2.Rodrigues(cams[k, :3])[0], cams[k, 3:].copy())
    for p in range(nP):
        pts3d[p] = pts[p]

    # Outlier upkeep: drop observations the solved geometry rejects.
    resid = fun(res.x)
    err = np.hypot(resid[0::2], resid[1::2])
    for row, e in zip(rows, err):
        if e > 2.0 * gate_px:
            obs.pop(row[3], None)


def opencv_incremental(paths, f_px=None, ratio=0.8, min_pair_inliers=30,
                       pnp_min=12, reproj_gate_px=4.0):
    """Returns dict with rvecs/tvecs [N,3] (world->cam), registered mask,
    mean reprojection error, point count, wall-clock seconds."""
    import cv2

    t0 = time.perf_counter()
    imgs = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths]
    n = len(imgs)
    h, w = imgs[0].shape
    if f_px is None:
        f_px = 1.2 * max(h, w)
    K = np.array([[f_px, 0, w / 2], [0, f_px, h / 2], [0, 0, 1]], np.float64)

    sift = cv2.SIFT_create(nfeatures=1024)
    kps, descs = [], []
    for im in imgs:
        kp, de = sift.detectAndCompute(im, None)
        kps.append(np.float64([k.pt for k in kp]) if kp else np.zeros((0, 2)))
        descs.append(de)

    # All-pairs ratio matching + E verification.
    bf = cv2.BFMatcher(cv2.NORM_L2)
    pair_matches = {}
    for i in range(n):
        for j in range(i + 1, n):
            if descs[i] is None or descs[j] is None:
                continue
            mm = bf.knnMatch(descs[i], descs[j], k=2)
            good = [(m.queryIdx, m.trainIdx) for m, nn in mm
                    if m.distance < ratio * nn.distance]
            if len(good) < min_pair_inliers:
                continue
            qi = np.asarray([g[0] for g in good])
            tj = np.asarray([g[1] for g in good])
            E, inl = cv2.findEssentialMat(kps[i][qi], kps[j][tj], K,
                                          method=cv2.RANSAC, prob=0.999,
                                          threshold=2.0)
            if E is None or inl is None or int(inl.sum()) < min_pair_inliers:
                continue
            keep = inl.ravel().astype(bool)
            pair_matches[(i, j)] = (qi[keep], tj[keep], E)

    if not pair_matches:
        return dict(registered=np.zeros(n, bool), rvecs=np.zeros((n, 3)),
                    tvecs=np.zeros((n, 3)), mean_reproj_px=float("nan"),
                    num_points=0, wall_clock_s=time.perf_counter() - t0)

    # Bootstrap from the strongest NON-PLANAR pair (COLMAP's init criterion):
    # on the textured-corner scene a single-wall pair can carry the most
    # E-inliers while its matches are homography-consistent — the essential
    # matrix is then degenerate, recoverPose returns a junk baseline, and
    # every later BA polishes the bent geometry into self-consistency
    # (observed: 40-image run at 2.3 px / 49% center RMSE, while n<=36 —
    # with a different strongest pair — lands 0.5 px / 0.2%).
    ranked = sorted(pair_matches.items(), key=lambda kv: -len(kv[1][0]))
    boot = None
    for (i, j), (qi, tj, E) in ranked:
        H, h_inl = cv2.findHomography(kps[i][qi], kps[j][tj], cv2.RANSAC, 2.0)
        h_ratio = float(h_inl.sum()) / len(qi) if H is not None and h_inl is not None else 0.0
        if h_ratio < 0.85:
            boot = ((i, j), (qi, tj, E))
            break
    if boot is None:
        boot = ranked[0]
    (i0, j0), (qi, tj, E) = boot
    _, R, t, inl = cv2.recoverPose(E, kps[i0][qi], kps[j0][tj], K)
    poses = {i0: (np.eye(3), np.zeros(3)), j0: (R, t.ravel())}

    # obs[(img, kp)] -> point id; pts3d list of 3D points.
    pts3d, obs = [], {}

    def proj_mat(img):
        R, t = poses[img]
        return K @ np.hstack([R, t.reshape(3, 1)])

    def triangulate_pair(a, b):
        """Add new points seen in registered images a < b."""
        if (a, b) not in pair_matches:
            return
        qa, tb, _ = pair_matches[(a, b)]
        new = [(x, y) for x, y in zip(qa, tb)
               if (a, x) not in obs or (b, y) not in obs]
        if not new:
            return
        qa = np.asarray([x for x, _ in new])
        tb = np.asarray([y for _, y in new])
        X = cv2.triangulatePoints(proj_mat(a), proj_mat(b),
                                  kps[a][qa].T, kps[b][tb].T)
        X = (X[:3] / np.where(np.abs(X[3]) < 1e-12, 1e-12, X[3])).T
        for (x, y), Xw in zip(new, X):
            # Cheirality + reprojection gate in both views.
            ok = True
            for img, kp_id in ((a, x), (b, y)):
                R, t = poses[img]
                xc = R @ Xw + t
                if xc[2] <= 1e-6:
                    ok = False
                    break
                uv = (K @ xc)[:2] / xc[2]
                if np.linalg.norm(uv - kps[img][kp_id]) > reproj_gate_px:
                    ok = False
                    break
            if not ok:
                continue
            pid = obs.get((a, x), obs.get((b, y)))
            if pid is None:
                pid = len(pts3d)
                pts3d.append(Xw)
            obs.setdefault((a, x), pid)
            obs.setdefault((b, y), pid)

    triangulate_pair(*sorted((i0, j0)))
    bundle_adjust_scipy(poses, pts3d, obs, kps, K, gate_px=reproj_gate_px)

    # Incremental registration: most 2D-3D correspondences first.
    since_ba = 0
    for _ in range(n):
        best, best_c = None, pnp_min - 1
        for img in range(n):
            if img in poses:
                continue
            c = _pnp_corrs(img, poses, pair_matches, obs)
            if len(c) > best_c:
                best, best_c, best_corr = img, len(c), c
        if best is None:
            break
        pts = np.float64([pts3d[pid] for pid, _ in best_corr])
        uv = np.float64([kps[best][kp] for _, kp in best_corr])
        ok, rv, tv, inl = cv2.solvePnPRansac(pts, uv, K, None,
                                             reprojectionError=reproj_gate_px,
                                             iterationsCount=500,
                                             flags=cv2.SOLVEPNP_EPNP)
        if not ok or inl is None or len(inl) < pnp_min:
            break
        poses[best] = (cv2.Rodrigues(rv)[0], tv.ravel())
        for other in sorted(poses):
            if other != best:
                triangulate_pair(*sorted((other, best)))
        since_ba += 1
        if since_ba >= 5:
            bundle_adjust_scipy(poses, pts3d, obs, kps, K,
                                gate_px=reproj_gate_px, max_nfev=25)
            since_ba = 0

    # Final polish: BA -> outlier drop (inside) -> BA.
    bundle_adjust_scipy(poses, pts3d, obs, kps, K, gate_px=reproj_gate_px)
    bundle_adjust_scipy(poses, pts3d, obs, kps, K, gate_px=reproj_gate_px)

    # Mean reprojection over all observations.
    errs = []
    for (img, kp_id), pid in obs.items():
        if img not in poses:
            continue
        R, t = poses[img]
        xc = R @ pts3d[pid] + t
        if xc[2] > 1e-6:
            uv = (K @ xc)[:2] / xc[2]
            errs.append(np.linalg.norm(uv - kps[img][kp_id]))

    registered = np.zeros(n, bool)
    rvecs = np.zeros((n, 3))
    tvecs = np.zeros((n, 3))
    for img, (R, t) in poses.items():
        registered[img] = True
        rvecs[img] = cv2.Rodrigues(R)[0].ravel()
        tvecs[img] = t
    return dict(registered=registered, rvecs=rvecs, tvecs=tvecs,
                mean_reproj_px=float(np.mean(errs)) if errs else float("nan"),
                num_points=len(pts3d),
                wall_clock_s=time.perf_counter() - t0)


def _pnp_corrs(img, poses, pair_matches, obs):
    """2D-3D correspondences for an unregistered image via pair matches to
    registered images."""
    corr = {}
    for (a, b), (qa, tb, _) in pair_matches.items():
        if a == img and b in poses:
            for x, y in zip(qa, tb):
                pid = obs.get((b, y))
                if pid is not None:
                    corr[x] = pid
        elif b == img and a in poses:
            for x, y in zip(qa, tb):
                pid = obs.get((a, x))
                if pid is not None:
                    corr[y] = pid
    return [(pid, kp) for kp, pid in corr.items()]
