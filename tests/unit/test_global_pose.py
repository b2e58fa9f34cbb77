"""Global pose-graph optimization: rotation/translation averaging recover
planted poses; straightening removes low-frequency drift (SURVEY.md §4.1 —
synthetic gold tests; BASELINE.json:11 global-consistency bar)."""

import numpy as np

from sfm_tpu.pipeline.global_pose import (
    _so3_exp_np,
    _so3_log_np,
    pose_graph_poses,
    rotation_averaging,
    straighten_reconstruction,
    translation_averaging,
)
from sfm_tpu.pipeline.stages import MatchGraph
from sfm_tpu.utils.synthetic import make_orbit_scene

from tests.unit.test_ba import scene_to_reconstruction


def _graph_from_scene(scene, window=2, skips=(5, 11), noise_deg=0.0,
                      outlier_frac=0.0, seed=0):
    """MatchGraph-convention edges from ground-truth poses: ring neighbors
    within `window` plus fixed skip connections (the densified-graph shape)."""
    rng = np.random.default_rng(seed)
    N = scene.num_cameras
    R = _so3_exp_np(scene.rvecs)
    t = np.asarray(scene.tvecs, np.float64)
    seen = set()
    pairs, rvecs, tvecs = [], [], []
    for i in range(N):
        for dk in list(range(1, window + 1)) + list(skips):
            j = (i + dk) % N
            a, b = min(i, j), max(i, j)
            if a == b or (a, b) in seen:
                continue
            seen.add((a, b))
            Rij = R[b] @ R[a].T
            tij = t[b] - Rij @ t[a]
            tij = tij / max(np.linalg.norm(tij), 1e-12)
            if noise_deg > 0:
                dr = rng.normal(0, np.radians(noise_deg), 3)
                Rij = _so3_exp_np(dr[None])[0] @ Rij
                tij = tij + rng.normal(0, np.radians(noise_deg), 3)
                tij = tij / np.linalg.norm(tij)
            pairs.append((a, b))
            rvecs.append(_so3_log_np(Rij[None])[0])
            tvecs.append(tij)
    pairs = np.asarray(pairs, np.int32)
    rvecs = np.asarray(rvecs, np.float32)
    tvecs = np.asarray(tvecs, np.float32)
    E = len(pairs)
    if outlier_frac > 0:
        bad = rng.random(E) < outlier_frac
        rvecs[bad] = rng.normal(0, 1.5, (int(bad.sum()), 3)).astype(np.float32)
        tvecs[bad] = rng.normal(0, 1.0, (int(bad.sum()), 3)).astype(np.float32)
        tvecs[bad] /= np.linalg.norm(tvecs[bad], axis=1, keepdims=True)
    M = 4
    return MatchGraph(
        pairs=pairs,
        idx_i=np.zeros((E, M), np.int32), idx_j=np.zeros((E, M), np.int32),
        inlier=np.ones((E, M), bool),
        num_inliers=np.full(E, 64, np.int32),
        num_h_inliers=np.zeros(E, np.int32),
        rvec=rvecs, tvec=tvecs,
        ok=np.ones(E, bool), pose_ok=np.ones(E, bool),
    )


def _gauge_spread_deg(R_est, R_gt, valid):
    """Max deviation of the per-camera gauge rotation G_i = R_gt_i^T R_est_i
    from its first value — 0 iff est == gt up to one global rotation."""
    ids = np.where(valid)[0]
    G = np.swapaxes(R_gt[ids], -1, -2) @ R_est[ids]
    rel = G @ np.swapaxes(np.tile(G[0], (len(ids), 1, 1)), -1, -2)
    return float(np.degrees(np.linalg.norm(_so3_log_np(rel), axis=-1).max()))


def _center_rmse_after_sim3(c_est, c_gt):
    from sfm_tpu.geometry.similarity import umeyama_np

    s, R, t = umeyama_np(c_est, c_gt)
    fit = s * c_est @ np.asarray(R).T + np.asarray(t)
    return float(np.sqrt(np.mean(np.sum((fit - c_gt) ** 2, axis=1))))


def test_rotation_averaging_exact():
    scene = make_orbit_scene(num_cameras=40, num_points=10, seed=3)
    g = _graph_from_scene(scene)
    R, valid, _ = rotation_averaging(g.pairs, g.rvec, 40,
                                  weights=g.num_inliers.astype(float))
    assert valid.sum() == 40
    assert _gauge_spread_deg(R, _so3_exp_np(scene.rvecs), valid) < 0.01


def test_rotation_averaging_robust_to_outliers():
    scene = make_orbit_scene(num_cameras=48, num_points=10, seed=4)
    g = _graph_from_scene(scene, noise_deg=0.5, outlier_frac=0.10, seed=5)
    R, valid, _ = rotation_averaging(g.pairs, g.rvec, 48,
                                  weights=g.num_inliers.astype(float))
    assert valid.sum() == 48
    # 10% gross outlier edges + 0.5 deg noise: IRLS must keep the solution
    # within a couple of degrees of ground truth.
    assert _gauge_spread_deg(R, _so3_exp_np(scene.rvecs), valid) < 2.5


def test_translation_averaging_recovers_centers():
    scene = make_orbit_scene(num_cameras=40, num_points=10, seed=6)
    g = _graph_from_scene(scene)
    N = 40
    Rgt = _so3_exp_np(scene.rvecs)
    c_gt = -np.einsum("nji,nj->ni", Rgt, scene.tvecs.astype(np.float64))
    # Exact world-frame directions from ground truth.
    d = c_gt[g.pairs[:, 1]] - c_gt[g.pairs[:, 0]]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c, solved = translation_averaging(g.pairs, d, N, np.ones(N, bool))
    assert solved.sum() == N
    # Orbit radius 4.0: up-to-sim3 recovery should be essentially exact.
    assert _center_rmse_after_sim3(c, c_gt) < 1e-3


def test_pose_graph_poses_end_to_end():
    scene = make_orbit_scene(num_cameras=40, num_points=10, seed=7)
    g = _graph_from_scene(scene, noise_deg=0.2, seed=8)
    rvecs, tvecs, valid = pose_graph_poses(g, 40)
    assert valid.sum() == 40
    R = _so3_exp_np(rvecs)
    assert _gauge_spread_deg(R, _so3_exp_np(scene.rvecs), valid) < 1.5
    c = -np.einsum("nji,nj->ni", R, tvecs.astype(np.float64))
    Rgt = _so3_exp_np(scene.rvecs)
    c_gt = -np.einsum("nji,nj->ni", Rgt, scene.tvecs.astype(np.float64))
    assert _center_rmse_after_sim3(c, c_gt) < 0.08   # 2% of the 4.0 radius


def test_straighten_reconstruction_removes_drift():
    # Locally-consistent global bend: camera poses drift by a slowly varying
    # rotation along the ring (the Rome16K failure mode) while observations
    # stay at ground truth. BA cannot see the bend; the pose graph can.
    scene = make_orbit_scene(num_cameras=48, num_points=120, seed=9)
    rec = scene_to_reconstruction(scene)
    N = scene.num_cameras
    Rgt = _so3_exp_np(scene.rvecs)
    c_gt = -np.einsum("nji,nj->ni", Rgt, scene.tvecs.astype(np.float64))
    for i in range(N):
        phase = 2 * np.pi * i / N
        bend = _so3_exp_np(np.asarray([[0.0, 0.25 * np.sin(phase), 0.0]]))[0]
        R_b = Rgt[i] @ bend.T
        c_b = bend @ c_gt[i] + 0.3 * np.sin(phase) * np.asarray([1.0, 0, 0])
        rec.rvecs[i] = _so3_log_np(R_b[None])[0].astype(np.float32)
        rec.tvecs[i] = (-R_b @ c_b).astype(np.float32)
    rmse_before = _center_rmse_after_sim3(
        -np.einsum("nji,nj->ni", _so3_exp_np(rec.rvecs), rec.tvecs.astype(np.float64)),
        c_gt)
    assert rmse_before > 0.3    # the bend is real (>7% of radius)

    g = _graph_from_scene(scene)
    assert straighten_reconstruction(rec, g, verbose=False)
    c_est = -np.einsum("nji,nj->ni", _so3_exp_np(rec.rvecs), rec.tvecs.astype(np.float64))
    assert _center_rmse_after_sim3(c_est, c_gt) < 0.04   # 1% of radius
    # Points were re-triangulated to match the straightened poses.
    assert rec.num_points > 0.8 * scene.num_points
    assert np.isfinite(rec.points[rec.point_valid]).all()


def test_translation_averaging_disconnected_cameras_stay_zero():
    scene = make_orbit_scene(num_cameras=12, num_points=10, seed=11)
    g = _graph_from_scene(scene, window=1, skips=())
    valid = np.ones(14, bool)
    valid[12:] = False   # two extra cameras with no edges
    d = np.zeros((len(g.pairs), 3))
    d[:, 0] = 1.0
    c, solved = translation_averaging(g.pairs, d, 14, valid)
    assert not solved[12:].any()
    assert np.all(c[12:] == 0.0)


def _positioning_problem(N=64, P=200, noise_deg=0.3, gross_frac=0.0,
                         bend=0.8, seed=0):
    """Orbit cameras + points with windowed visibility, noisy world-frame
    observation rays, and a low-frequency-bent seed (the translation-
    averaging failure shape global_positioning exists to fix)."""
    rng = np.random.default_rng(seed)
    scene = make_orbit_scene(num_cameras=N, num_points=P, radius=4.0,
                             point_extent=1.2, seed=seed, arc_fraction=1.0)
    R = _so3_exp_np(scene.rvecs)
    c_gt = -np.einsum("nji,nj->ni", R, scene.tvecs)
    X_gt = scene.points
    cam_ang = np.arctan2(c_gt[:, 2], c_gt[:, 0])
    pt_ang = rng.uniform(-np.pi, np.pi, P)
    oc, op = [], []
    for p in range(P):
        d = np.abs((cam_ang - pt_ang[p] + np.pi) % (2 * np.pi) - np.pi)
        vis = np.where(d < np.radians(60))[0]
        oc.append(vis)
        op.append(np.full(len(vis), p))
    oc, op = np.concatenate(oc), np.concatenate(op)
    u = X_gt[op] - c_gt[oc]
    v = u / np.linalg.norm(u, axis=1, keepdims=True)
    ax = rng.normal(size=v.shape)
    ax -= v * (ax * v).sum(1, keepdims=True)
    ax /= np.maximum(np.linalg.norm(ax, axis=1, keepdims=True), 1e-12)
    ang = np.abs(rng.normal(0, np.radians(noise_deg), len(v)))
    gross = rng.random(len(v)) < gross_frac
    ang[gross] = rng.uniform(np.radians(5), np.pi / 2, int(gross.sum()))
    v = v * np.cos(ang)[:, None] + ax * np.sin(ang)[:, None]
    t = cam_ang
    c0 = c_gt + bend * np.stack(
        [np.sin(2 * t), np.cos(3 * t), np.sin(t)], 1)
    return oc, op, v, c_gt, c0, N, P


def test_global_positioning_recovers_from_bent_seed():
    from sfm_tpu.pipeline.global_pose import global_positioning

    oc, op, v, c_gt, c0, N, P = _positioning_problem()
    assert _center_rmse_after_sim3(c0, c_gt) > 0.5      # seed is badly bent
    c, X, sc, sp = global_positioning(oc, op, v, N, P, np.ones(N, bool),
                                      centers0=c0)
    assert sc.all()
    # 0.3deg ray noise -> well under 1% of the 4.0 orbit radius.
    assert _center_rmse_after_sim3(c[sc], c_gt[sc]) < 0.04


def test_global_positioning_robust_to_gross_rays():
    from sfm_tpu.pipeline.global_pose import global_positioning

    oc, op, v, c_gt, c0, N, P = _positioning_problem(gross_frac=0.08)
    c, X, sc, sp = global_positioning(oc, op, v, N, P, np.ones(N, bool),
                                      centers0=c0, rounds=6)
    assert _center_rmse_after_sim3(c[sc], c_gt[sc]) < 0.08


def test_global_positioning_drops_underconstrained_points():
    from sfm_tpu.pipeline.global_pose import global_positioning

    # Point 1 has a single observation -> cannot be positioned.
    oc = np.array([0, 1, 2, 0, 1, 2, 0])
    op = np.array([0, 0, 0, 2, 2, 2, 1])
    c_gt = np.array([[0., 0, 0], [1, 0, 0], [2, 0, 0]])
    X_gt = np.array([[0.5, 0, 3], [9, 9, 9], [1.5, 0, 4]])
    v = X_gt[op] - c_gt[oc]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c, X, sc, sp = global_positioning(oc, op, v, 3, 3, np.ones(3, bool),
                                      centers0=c_gt)
    assert sc.all()
    assert sp[0] and sp[2] and not sp[1]


def test_edge_scale_centers_fixes_collinear_spacing():
    """Cameras on a LINE with uneven spacing: direction-only averaging is
    degenerate (every pairwise direction is the same vector, spacing free);
    edge-scale sync recovers the spacing from shared-track two-view depths."""
    from sfm_tpu.pipeline.global_pose import (edge_scale_centers,
                                              _so3_log_np as _log)
    from sfm_tpu.pipeline.stages import MatchGraph

    rng = np.random.default_rng(3)
    N, P = 16, 120
    # uneven spacing along x, looking down +z at points near z ~ 4
    xs = np.cumsum(rng.uniform(0.3, 1.7, N)); xs -= xs[0]
    c_gt = np.stack([xs, np.zeros(N), np.zeros(N)], 1)
    X = np.concatenate([rng.uniform(0, xs[-1], (P, 1)),
                        rng.uniform(-1, 1, (P, 1)),
                        rng.uniform(3, 5, (P, 1))], 1)
    # identity rotations; keypoint k of every image = point k
    pairs, rel_r, rel_t, d_world = [], [], [], []
    M = P
    idx = np.tile(np.arange(P, dtype=np.int32), (1, 1))
    E_idx_i, E_idx_j, E_inl = [], [], []
    xn = ((X[None, :, :2] - c_gt[:, None, :2])
          / (X[None, :, 2:3] - c_gt[:, None, 2:3]))          # [N, P, 2]
    for i in range(N):
        for j in range(i + 1, min(i + 4, N)):
            base = c_gt[j] - c_gt[i]
            pairs.append((i, j))
            rel_r.append(np.zeros(3))
            rel_t.append(-base / np.linalg.norm(base))       # t = -R c_j + R c_i
            d_world.append(base / np.linalg.norm(base))
            E_idx_i.append(np.arange(P, dtype=np.int32))
            E_idx_j.append(np.arange(P, dtype=np.int32))
            E_inl.append(np.ones(P, bool))
    pairs = np.asarray(pairs, np.int64)
    c, solved = edge_scale_centers(
        pairs, np.asarray(d_world), np.asarray(rel_r, np.float32),
        np.asarray(rel_t, np.float32), np.stack(E_idx_i), np.stack(E_idx_j),
        np.stack(E_inl), xn, N, np.ones(N, bool))
    assert solved.sum() == N
    # up-to-sim3: spacing RATIOS must match ground truth
    got = c[:, 0] - c[0, 0]
    got = got / got[-1] * xs[-1]
    assert np.abs(got - xs).max() < 0.05 * xs[-1], got
