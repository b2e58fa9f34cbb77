"""filter_observations (merge polish) and device-side retrieval top-k."""

import numpy as np

from sfm_tpu.scene.state import Reconstruction, filter_observations


def _rec_with_outlier():
    K, P = 3, 4
    intr = np.tile(np.array([100.0, 100, 64, 64, 0, 0], np.float32), (K, 1))
    rvecs = np.zeros((K, 3), np.float32)
    tvecs = np.zeros((K, 3), np.float32)
    tvecs[1, 0] = 0.5
    tvecs[2, 0] = -0.5
    registered = np.ones(K, bool)
    pts = np.array([[0, 0, 4], [0.5, 0, 4], [-0.5, 0.2, 4], [0.1, -0.3, 5]], np.float32)

    obs_p, obs_i, obs_uv = [], [], []
    from sfm_tpu.utils.synthetic import _np_project

    for p in range(P):
        for k in range(K):
            uv, _ = _np_project(pts[p: p + 1].astype(np.float64), rvecs[k], tvecs[k], intr[k].astype(np.float64))
            obs_p.append(p)
            obs_i.append(k)
            obs_uv.append(uv[0])
    obs_uv = np.asarray(obs_uv, np.float32)
    # One gross outlier observation (wrongly-linked track): point 0 in cam 0.
    obs_uv[0] += 50.0
    return Reconstruction(
        intrinsics=intr, rvecs=rvecs, tvecs=tvecs, registered=registered,
        points=pts, point_errors=np.zeros(P, np.float32), point_valid=np.ones(P, bool),
        obs_point=np.asarray(obs_p, np.int32), obs_image=np.asarray(obs_i, np.int32),
        obs_kp=np.arange(P * K, dtype=np.int32), obs_uv=obs_uv,
    )


def test_filter_observations_drops_outlier_keeps_rest():
    rec = _rec_with_outlier()
    n0 = rec.num_observations
    dropped = filter_observations(rec, max_err_px=6.0)
    assert dropped == 1
    assert rec.num_observations == n0 - 1
    assert rec.point_valid.all()  # point 0 still has 2 observations
    assert rec.mean_reprojection_error() < 1.0


def test_filter_observations_starves_point():
    rec = _rec_with_outlier()
    # Corrupt two of point 0's three observations -> starved, point dropped.
    rec.obs_uv[1] += 50.0
    dropped = filter_observations(rec, max_err_px=6.0)
    assert dropped == 3  # 2 outliers + the stranded third row
    assert not rec.point_valid[0]
    assert rec.point_valid[1:].all()


def test_topk_neighbors_matches_argpartition():
    import jax.numpy as jnp

    from sfm_tpu.ops.vocab import _topk_neighbors

    rng = np.random.default_rng(0)
    bow = rng.random((16, 64)).astype(np.float32)
    bow /= np.linalg.norm(bow, axis=1, keepdims=True)
    k = 4
    nb = np.asarray(_topk_neighbors(jnp.asarray(bow), k))
    sim = bow @ bow.T
    np.fill_diagonal(sim, -2.0)
    for i in range(16):
        expect = set(np.argsort(-sim[i])[:k].tolist())
        assert set(nb[i].tolist()) == expect
        assert i not in nb[i]
