"""Bootstrap init-pair ranking (SURVEY.md §2.5): the parallax gate must rank
a wide-baseline pair above a higher-inlier near-pure-rotation pair, since the
latter triangulates nothing (the 2k-image dense-capture failure mode)."""

import numpy as np

from sfm_tpu.config import PipelineConfig, EngineConfig
from sfm_tpu.pipeline.engine import rank_init_pairs, _edge_parallax_deg
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph


def _project(pts, rvec, tvec, f, c):
    from sfm_tpu.utils.synthetic import _np_project

    intr = np.array([f, f, c, c, 0.0, 0.0])
    uv, depth = _np_project(pts, rvec, tvec, intr)
    return uv


def _make_case():
    """Images 0/1: pure rotation (zero baseline). Images 0/2: translated."""
    rng = np.random.default_rng(3)
    M = 64
    f, c = 300.0, 128.0
    pts = rng.uniform(-1.0, 1.0, size=(M, 3))
    pts[:, 2] += 4.0  # in front of the cameras

    rot = np.array([0.0, 0.12, 0.0])  # ~7 deg pan, no baseline
    trans = np.array([0.8, 0.0, 0.0])  # wide baseline, no rotation

    uv0 = _project(pts, np.zeros(3), np.zeros(3), f, c)
    uv1 = _project(pts, rot, np.zeros(3), f, c)
    uv2 = _project(pts, np.zeros(3), -trans, f, c)

    B, N = 3, M
    xy = np.zeros((B, N, 2), np.float32)
    xy[0], xy[1], xy[2] = uv0, uv1, uv2
    feats = FeatureSet(
        xy=xy,
        sigma=np.ones((B, N), np.float32),
        angle=np.zeros((B, N), np.float32),
        response=np.ones((B, N), np.float32),
        desc=np.zeros((B, N, 128), np.float32),
        valid=np.ones((B, N), bool),
    )
    intrinsics = np.tile(np.array([f, f, c, c, 0.0, 0.0], np.float32), (B, 1))

    idx = np.tile(np.arange(N, dtype=np.int32), (2, 1))
    inlier = np.ones((2, N), bool)
    inlier[1, 48:] = False  # wide pair has FEWER inliers than the rotation pair
    graph = MatchGraph(
        pairs=np.array([[0, 1], [0, 2]], np.int32),
        idx_i=idx.copy(),
        idx_j=idx.copy(),
        inlier=inlier,
        num_inliers=inlier.sum(1),
        num_h_inliers=np.array([10, 5]),  # both pass the H gate
        rvec=np.stack([rot, np.zeros(3)]).astype(np.float32),
        tvec=np.stack([np.zeros(3), trans]).astype(np.float32),
        ok=np.ones(2, bool),
    )
    return feats, graph, intrinsics


def test_parallax_measures_baseline_not_rotation():
    feats, graph, intrinsics = _make_case()
    par = _edge_parallax_deg(graph, np.array([0, 1]), feats, intrinsics)
    assert par[0] < 0.1, f"pure-rotation pair should have ~0 parallax, got {par[0]}"
    assert par[1] > 3.0, f"translated pair should have real parallax, got {par[1]}"


def test_rank_prefers_parallax_over_inliers():
    feats, graph, intrinsics = _make_case()
    cfg = PipelineConfig(engine=EngineConfig(init_min_inliers=20))
    order = rank_init_pairs(graph, feats, intrinsics, cfg)
    assert len(order) == 2
    assert order[0] == 1, "wide-baseline edge must rank first despite fewer inliers"


def test_rank_falls_back_when_nothing_passes():
    feats, graph, intrinsics = _make_case()
    # Impossible parallax bar: gate fails for both; ranking must still return
    # candidates (most-parallax first) so the bootstrap retry loop can run.
    cfg = PipelineConfig(
        engine=EngineConfig(init_min_inliers=20, init_min_triangulation_angle_deg=89.0)
    )
    order = rank_init_pairs(graph, feats, intrinsics, cfg)
    assert len(order) == 2
    assert order[0] == 1


def test_pose_search_recovers_translation_and_rejects_rotation():
    import jax.numpy as jnp

    from sfm_tpu.pipeline.engine import _two_view_pose_search

    feats, graph, intrinsics = _make_case()
    f, c = 300.0, 128.0

    def norm_coords(img, idx):
        uv = feats.xy[img, idx]
        return (uv - c) / f

    # Edge 1 (translated): pose search must triangulate most correspondences
    # even when fed a WRONG stored pose (the dense-capture failure mode).
    x1 = jnp.asarray(norm_coords(0, graph.idx_i[1]))
    x2 = jnp.asarray(norm_coords(2, graph.idx_j[1]))
    m = jnp.asarray(graph.inlier[1])
    wrong_rv = jnp.asarray(np.array([0.3, 0.0, 0.0], np.float32))
    wrong_tv = jnp.asarray(np.array([0.0, 0.0, 1.0], np.float32))
    rv, tv, n = _two_view_pose_search(x1, x2, m, wrong_rv, wrong_tv, 1.5, (2.0 / 300.0) ** 2)
    assert int(n) >= int(graph.inlier[1].sum()) * 3 // 4
    # True translation is -trans = (-0.8, 0, 0) up to scale (t = -R @ C).
    t_est = np.asarray(tv)
    assert abs(t_est[0] / np.linalg.norm(t_est)) > 0.95

    # Edge 0 (pure rotation): nothing can be triangulated from any pose.
    x1r = jnp.asarray(norm_coords(0, graph.idx_i[0]))
    x2r = jnp.asarray(norm_coords(1, graph.idx_j[0]))
    mr = jnp.asarray(graph.inlier[0])
    _, _, nr = _two_view_pose_search(
        x1r, x2r, mr, jnp.asarray(graph.rvec[0]), jnp.asarray(np.ones(3, np.float32)), 1.5,
        (2.0 / 300.0) ** 2,
    )
    assert int(nr) < 10
