"""Cluster merge: sim3 alignment + observation dedup (SURVEY.md §2.7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.config import PipelineConfig
from sfm_tpu.pipeline.merge import apply_sim3_to_reconstruction, merge_two, merge_reconstructions
from sfm_tpu.utils.synthetic import make_orbit_scene, _np_rodrigues
from tests.unit.test_ba import scene_to_reconstruction


def test_apply_sim3_preserves_projections():
    scene = make_orbit_scene(num_cameras=4, num_points=40, seed=30)
    rec = scene_to_reconstruction(scene)
    before = rec.reprojection_errors()
    s, R, t = 2.5, _np_rodrigues(np.array([0.2, -0.3, 0.1])), np.array([1.0, -2.0, 0.5])
    rec2 = apply_sim3_to_reconstruction(rec, s, R, t)
    after = rec2.reprojection_errors()
    # A similarity transform of the world is projectively invisible.
    np.testing.assert_allclose(after, before, atol=2e-2)


def test_merge_two_overlapping_halves():
    scene = make_orbit_scene(num_cameras=10, num_points=80, noise_px=0.0, seed=31)
    full = scene_to_reconstruction(scene)

    def restrict(rec_like, cams):
        rec = scene_to_reconstruction(scene)
        keep_cam = np.zeros(scene.num_cameras, bool)
        keep_cam[cams] = True
        rec.registered = keep_cam
        sel = keep_cam[rec.obs_image]
        rec.obs_point, rec.obs_image = rec.obs_point[sel], rec.obs_image[sel]
        rec.obs_kp, rec.obs_uv = rec.obs_kp[sel], rec.obs_uv[sel]
        counts = np.bincount(rec.obs_point, minlength=len(rec.points))
        rec.point_valid = counts >= 2
        return rec

    a = restrict(scene, list(range(0, 6)))         # cams 0-5
    b = restrict(scene, list(range(3, 10)))        # cams 3-9 (overlap 3,4,5)
    # Put b in a different gauge before merging.
    b = apply_sim3_to_reconstruction(b, 0.5, _np_rodrigues(np.array([0.0, 0.7, 0.0])), np.array([3.0, 0.0, -1.0]))

    merged = merge_two(a, b)
    assert merged.num_registered == 10
    # After merging, the whole thing must reproject like the original scene.
    assert merged.mean_reprojection_error() < 0.1
    # Shared tracks deduplicated: no duplicated (image, kp) observation.
    keys = set(zip(merged.obs_image.tolist(), merged.obs_kp.tolist()))
    assert len(keys) == merged.num_observations


def test_merge_requires_shared_cameras_or_tracks():
    """merge_two raises only when the pair shares NEITHER cameras NOR tracks.

    Both reconstructions come from the same scene, so their tracks would
    match by (image, kp) identity; shifting b's keypoint ids severs that
    link, leaving genuinely nothing to align on."""
    scene = make_orbit_scene(num_cameras=8, num_points=40, seed=32)
    a = scene_to_reconstruction(scene)
    b = scene_to_reconstruction(scene)
    a.registered[:] = False
    a.registered[:4] = True
    b.registered[:] = False
    b.registered[6:] = True  # zero camera overlap
    b.obs_kp = b.obs_kp + 100_000  # zero track overlap
    with pytest.raises(ValueError):
        merge_two(a, b)


def test_merge_track_only_alignment():
    """Zero shared cameras but >=16 shared tracks: the sim3 aligns on track
    identity alone (long tracks cross cluster seams even where the seam
    cameras failed to register — merge.py relative_sim3)."""
    scene = make_orbit_scene(num_cameras=8, num_points=60, noise_px=0.0, seed=32)
    a = scene_to_reconstruction(scene)
    b = scene_to_reconstruction(scene)
    a.registered[:] = False
    a.registered[:4] = True
    b.registered[:] = False
    b.registered[6:] = True  # zero shared REGISTERED cameras
    # a: observations of cams 0-3. b: registered cams 6-7 plus the seam
    # images 2-3 whose obs rows survive (their cameras failed to register in
    # b) — those rows carry the (image, kp) identities that link tracks.
    keeps = [a.registered, b.registered.copy()]
    keeps[1][2:4] = True
    for rec, keep in zip((a, b), keeps):
        sel = keep[rec.obs_image]
        rec.obs_point, rec.obs_image = rec.obs_point[sel], rec.obs_image[sel]
        rec.obs_kp, rec.obs_uv = rec.obs_kp[sel], rec.obs_uv[sel]
        counts = np.bincount(rec.obs_point, minlength=len(rec.points))
        rec.point_valid = counts >= 2
    b = apply_sim3_to_reconstruction(
        b, 1.7, _np_rodrigues(np.array([0.1, 0.4, -0.2])), np.array([2.0, -1.0, 0.5]))
    merged = merge_two(a, b)
    assert merged.num_registered == 6
    assert merged.mean_reprojection_error() < 0.1


def test_merge_tracks_by_correspondence():
    """Cross-cluster track consolidation (merge.py): two fragments of one
    physical point, linked by >= min_votes verified correspondences, fuse
    into one; a fragment with a single vote stays split."""
    from sfm_tpu.pipeline.merge import merge_tracks_by_correspondence
    from sfm_tpu.pipeline.stages import MatchGraph

    scene = make_orbit_scene(num_cameras=6, num_points=30, noise_px=0.0, seed=34)
    rec = scene_to_reconstruction(scene)
    M = scene.num_points
    # Fragment points visible everywhere: rows in images >= 3 move to a twin
    # point id M+k placed 0.01 away (well inside the 5%-of-scene-scale gate).
    vis_all = scene.visible.all(0)
    split = np.where(vis_all)[0][:10]
    assert len(split) == 10
    frag_of = dict(zip(split.tolist(), range(M, M + 10)))
    obs_point = rec.obs_point.copy()
    for p, npid in frag_of.items():
        obs_point[(rec.obs_point == p) & (rec.obs_image >= 3)] = npid
    rec.obs_point = obs_point
    rec.points = np.concatenate([rec.points, scene.points[split] + 0.01]).astype(np.float32)
    rec.point_valid = np.concatenate([rec.point_valid, np.ones(10, bool)])
    rec.point_errors = np.zeros(len(rec.points), np.float32)

    # Graph: edge (2,3) votes all 10 splits; edge (1,4) votes only the first
    # 9 — so split[9] collects a single vote and must survive as a fragment.
    W = 16
    def edge(i, j, pts):
        ii = np.zeros(W, np.int32); jj = np.zeros(W, np.int32); inl = np.zeros(W, bool)
        ii[:len(pts)] = pts; jj[:len(pts)] = pts  # kp id == point id per image
        inl[:len(pts)] = True
        return ii, jj, inl
    e1 = edge(2, 3, split)
    e2 = edge(1, 4, split[:9])
    graph = MatchGraph(
        pairs=np.asarray([[2, 3], [1, 4]], np.int32),
        idx_i=np.stack([e1[0], e2[0]]), idx_j=np.stack([e1[1], e2[1]]),
        inlier=np.stack([e1[2], e2[2]]),
        num_inliers=np.asarray([10, 9], np.int32),
        num_h_inliers=np.zeros(2, np.int32),
        rvec=np.zeros((2, 3), np.float32), tvec=np.zeros((2, 3), np.float32),
        ok=np.ones(2, bool),
    )
    n = merge_tracks_by_correspondence(rec, graph, min_votes=2)
    assert n == 9, n
    assert int(rec.point_valid.sum()) == 31  # 30 originals + the 1-vote twin
    # Fused observations now point at the original ids, and reproject fine.
    fused = [p for p in split[:9]]
    for p in fused:
        rows = rec.obs_point == p
        assert (rec.obs_image[rows] >= 3).any() and (rec.obs_image[rows] < 3).any()
    assert rec.mean_reprojection_error() < 0.5


def _mock_graph(edges, W=16):
    """MatchGraph from [(img_i, img_j, [(kp_i, kp_j), ...]), ...]."""
    from sfm_tpu.pipeline.stages import MatchGraph

    E = len(edges)
    pairs = np.zeros((E, 2), np.int32)
    idx_i = np.zeros((E, W), np.int32)
    idx_j = np.zeros((E, W), np.int32)
    inlier = np.zeros((E, W), bool)
    for e, (i, j, kps) in enumerate(edges):
        pairs[e] = (i, j)
        for m, (ki, kj) in enumerate(kps):
            idx_i[e, m], idx_j[e, m], inlier[e, m] = ki, kj, True
    return MatchGraph(
        pairs=pairs, idx_i=idx_i, idx_j=idx_j, inlier=inlier,
        num_inliers=inlier.sum(1).astype(np.int32),
        num_h_inliers=np.zeros(E, np.int32),
        rvec=np.zeros((E, 3), np.float32), tvec=np.zeros((E, 3), np.float32),
        ok=np.ones(E, bool),
    )


def test_merge_tracks_by_track_id_transitive():
    """Transitive-identity consolidation (merge.py, r5): two fragments of one
    physical point whose retained observations share NO direct verified edge
    — the link runs through an intermediate image's keypoint that no cluster
    kept — must fuse via the full-graph union-find id; direct-correspondence
    voting finds nothing on the same graph. A contaminated id gluing two
    DISTINCT far-apart points must be rejected by the union-reprojection
    gate."""
    from sfm_tpu.pipeline.merge import (
        merge_tracks_by_correspondence, merge_tracks_by_track_id,
    )

    scene = make_orbit_scene(num_cameras=8, num_points=40, noise_px=0.0, seed=44)
    rec = scene_to_reconstruction(scene)
    M = scene.num_points
    vis_all = np.where(scene.visible.all(0))[0]
    p_dup, p_a, p_b = int(vis_all[0]), int(vis_all[1]), int(vis_all[2])
    assert np.linalg.norm(scene.points[p_a] - scene.points[p_b]) > 0.1

    # Fragment p_dup: images >= 4 move to a twin id M at +0.01 offset.
    obs_point = rec.obs_point.copy()
    obs_point[(rec.obs_point == p_dup) & (rec.obs_image >= 4)] = M
    rec.obs_point = obs_point
    rec.points = np.concatenate(
        [rec.points, scene.points[p_dup][None] + 0.01]).astype(np.float32)
    rec.point_valid = np.concatenate([rec.point_valid, np.ones(1, bool)])
    rec.point_errors = np.zeros(len(rec.points), np.float32)

    # Transitive chain through image 2's keypoint 999 (NOT an observation of
    # any model point): (1, p_dup) ~ (2, 999) ~ (5, p_dup). Plus a
    # contaminated chain gluing distinct p_a and p_b the same way.
    graph = _mock_graph([
        (1, 2, [(p_dup, 999)]),
        (2, 5, [(999, p_dup)]),
        (1, 2, [(p_a, 998)]),
        (2, 5, [(998, p_b)]),
    ], W=1024)

    # Direct votes: no edge has BOTH endpoints in the model -> nothing.
    assert merge_tracks_by_correspondence(rec, graph, min_votes=1) == 0

    n = merge_tracks_by_track_id(rec, graph, scene.num_cameras, 1024)
    assert n == 1, n
    # The duplicate fused...
    assert not (rec.point_valid[p_dup] and rec.point_valid[M])
    # ...and the contaminated id did NOT glue the two distinct points.
    assert rec.point_valid[p_a] and rec.point_valid[p_b]
    assert rec.mean_reprojection_error() < 1.0


def test_conflict_tolerant_track_ids_chains_through_duplicates():
    """The conflict-tolerant union-find must chain identity ACROSS
    same-position duplicate detections (the production dup-tolerant builder
    refuses those unions — measured mean global track length 7.7 vs ~170
    images seeing a blob), and the gid_map path of the id merge must fuse
    on it."""
    from types import SimpleNamespace
    from sfm_tpu.pipeline.merge import (
        conflict_tolerant_track_ids, merge_tracks_by_track_id,
    )

    scene = make_orbit_scene(num_cameras=8, num_points=40, noise_px=0.0, seed=46)
    rec = scene_to_reconstruction(scene)
    M = scene.num_points
    vis_all = np.where(scene.visible.all(0))[0]
    p = int(vis_all[0])
    obs_point = rec.obs_point.copy()
    obs_point[(rec.obs_point == p) & (rec.obs_image >= 4)] = M
    rec.obs_point = obs_point
    rec.points = np.concatenate(
        [rec.points, scene.points[p][None] + 0.01]).astype(np.float32)
    rec.point_valid = np.concatenate([rec.point_valid, np.ones(1, bool)])
    rec.point_errors = np.zeros(len(rec.points), np.float32)

    # Image 2 has TWO detections of the feature: kp p and a duplicate kp 900
    # 0.5 px away. The chain (1,p)~(2,p) and (2,900)~(5,p) only connects
    # through the duplicate aliasing — a conflict-cutting union-find splits
    # exactly here.
    K = 1024
    xy = np.zeros((scene.num_cameras, K, 2), np.float32)
    rng = np.random.default_rng(0)
    xy[:] = rng.uniform(0, 500, (scene.num_cameras, K, 2))
    xy[2, 900] = xy[2, p] + 0.5
    feats = SimpleNamespace(xy=xy)
    graph = _mock_graph([
        (1, 2, [(p, p)]),
        (2, 5, [(900, p)]),
    ], W=1024)

    gm = conflict_tolerant_track_ids(graph, feats)
    assert gm.shape == (scene.num_cameras, K)
    assert gm[1, p] == gm[5, p] == gm[2, p] == gm[2, 900]

    n = merge_tracks_by_track_id(rec, graph, scene.num_cameras, K, gid_map=gm)
    assert n == 1
    assert not (rec.point_valid[p] and rec.point_valid[M])


def test_merge_tracks_by_track_id_respects_exclusions():
    """(parent, fragment) pairs from a consensus split must not re-fuse."""
    from sfm_tpu.pipeline.merge import merge_tracks_by_track_id

    scene = make_orbit_scene(num_cameras=8, num_points=40, noise_px=0.0, seed=45)
    rec = scene_to_reconstruction(scene)
    M = scene.num_points
    vis_all = np.where(scene.visible.all(0))[0]
    p = int(vis_all[0])
    obs_point = rec.obs_point.copy()
    obs_point[(rec.obs_point == p) & (rec.obs_image >= 4)] = M
    rec.obs_point = obs_point
    rec.points = np.concatenate(
        [rec.points, scene.points[p][None] + 0.01]).astype(np.float32)
    rec.point_valid = np.concatenate([rec.point_valid, np.ones(1, bool)])
    rec.point_errors = np.zeros(len(rec.points), np.float32)
    graph = _mock_graph([(1, 5, [(p, p)])], W=1024)

    excl = {(np.int64(min(p, M)) << 32) | np.int64(max(p, M))}
    assert merge_tracks_by_track_id(
        rec, graph, scene.num_cameras, 1024, exclude=excl) == 0
    assert merge_tracks_by_track_id(
        rec, graph, scene.num_cameras, 1024) == 1


def test_synchronize_sim3_closes_the_loop():
    """Four overlapping arcs around a full orbit, each perturbed by a random
    sim3: synchronization must place every cluster back so the fused model
    reprojects like the original (a chained pairwise merge accumulates
    drift; the sync solves all frames jointly with the loop edge included)."""
    from sfm_tpu.pipeline.merge import synchronize_sim3

    scene = make_orbit_scene(num_cameras=24, num_points=120, noise_px=0.0, seed=33)

    def restrict(cams):
        rec = scene_to_reconstruction(scene)
        keep_cam = np.zeros(scene.num_cameras, bool)
        keep_cam[np.asarray(cams) % scene.num_cameras] = True
        rec.registered = keep_cam
        sel = keep_cam[rec.obs_image]
        rec.obs_point, rec.obs_image = rec.obs_point[sel], rec.obs_image[sel]
        rec.obs_kp, rec.obs_uv = rec.obs_kp[sel], rec.obs_uv[sel]
        counts = np.bincount(rec.obs_point, minlength=len(rec.points))
        rec.point_valid = counts >= 2
        return rec

    rng = np.random.default_rng(5)
    arcs = [list(range(0, 9)), list(range(6, 15)), list(range(12, 21)), list(range(18, 27))]
    recs = []
    for arc in arcs:
        rec = restrict(arc)
        s = float(rng.uniform(0.5, 2.0))
        R = _np_rodrigues(rng.normal(0, 0.3, 3))
        t = rng.normal(0, 2.0, 3)
        recs.append(apply_sim3_to_reconstruction(rec, s, R, t))

    cfg = PipelineConfig()
    merged = merge_reconstructions(recs, cfg)
    assert merged.num_registered == 24
    assert merged.mean_reprojection_error() < 0.1

    # And the sync utility reports a transform for every (connected) cluster.
    transforms = synchronize_sim3(sorted(recs, key=lambda r: -r.num_registered))
    assert all(tr is not None for tr in transforms)


def test_sync_audit_drops_inconsistent_scale_edge():
    """_audit_edges: on a redundant (cycle) graph, one edge whose relative
    scale disagrees with the rest is dropped and the synchronized scales
    recover; the same bad edge in a TREE is kept (dropping would disconnect)
    — the 10k scale-chimera failure mode and its two defenses."""
    from sfm_tpu.pipeline.merge import _audit_edges, _sync_solve

    I = np.eye(3)
    z = np.zeros(3)
    # 4 clusters on a cycle, all true transforms identity (s=1): consistent
    # edges s_ij=1 except a planted 0-1 edge claiming s=100.
    good = [(0, 1, 100.0, I, z, 10.0),  # the liar
            (1, 2, 1.0, I, z, 10.0),
            (1, 3, 1.0, I, z, 10.0),   # second cycle through node 1 —
            (2, 3, 1.0, I, z, 10.0),   # disambiguates which edge lies
            (0, 3, 1.0, I, z, 10.0),
            (0, 2, 1.0, I, z, 10.0)]
    pruned = _audit_edges(4, list(good), anchor=0)
    assert len(pruned) == 5 and all(e[2] == 1.0 for e in pruned)
    s_g, _, _, comp = _sync_solve(4, pruned, 0)
    assert comp.all()
    np.testing.assert_allclose(s_g, 1.0, rtol=1e-6)

    # Tree: the liar cannot be dropped without disconnecting; audit keeps it.
    tree = [(0, 1, 100.0, I, z, 10.0), (1, 2, 1.0, I, z, 10.0)]
    kept = _audit_edges(3, list(tree), anchor=0)
    assert len(kept) == 2


def test_merge_tracks_by_proximity():
    """Geometric track consolidation (merge.py): duplicated points whose
    copies reproject compatibly fuse WITHOUT any correspondence evidence
    (the divide-and-conquer regime: the match graph has no edges between
    the copies' observing images); genuinely distinct nearby points whose
    merged position reprojects tens of px off stay split; a triple copy
    collapses over two calls (one merge per point per call)."""
    from sfm_tpu.pipeline.merge import merge_tracks_by_proximity

    scene = make_orbit_scene(num_cameras=8, num_points=40, noise_px=0.0, seed=7)
    rec = scene_to_reconstruction(scene)
    M = scene.num_points
    # Work only with points that are (a) visible in every camera and
    # (b) >= 0.2 apart from every other point (focal 600 / radius 4 =>
    # ~150 px per unit of 3D separation: 0.2 apart reprojects ~15px off
    # when merged, 0.01-offset copies ~0.75px — cleanly across the 6px gate).
    vis_all = np.where(scene.visible.all(0))[0]
    chosen = []
    for p in vis_all:
        if all(np.linalg.norm(scene.points[p] - scene.points[q]) >= 0.2 for q in chosen):
            chosen.append(int(p))
        if len(chosen) == 7:
            break
    assert len(chosen) == 7
    pairs, triple = chosen[:6], chosen[6]

    obs_point = rec.obs_point.copy()
    new_pts = []
    # Six points split into two copies (cameras 0-3 keep the original id,
    # cameras 4-7 move to a copy offset 0.01 in x).
    for k, p in enumerate(pairs):
        npid = M + k
        obs_point[(rec.obs_point == p) & (rec.obs_image >= 4)] = npid
        new_pts.append(scene.points[p] + [0.01, 0, 0])
    # One point split into THREE copies (cams 0-2 / 3-5 / 6-7).
    c1, c2 = M + 6, M + 7
    obs_point[(rec.obs_point == triple) & (rec.obs_image >= 3) & (rec.obs_image < 6)] = c1
    obs_point[(rec.obs_point == triple) & (rec.obs_image >= 6)] = c2
    new_pts += [scene.points[triple] + [0, 0.01, 0], scene.points[triple] - [0.01, 0, 0]]

    rec.obs_point = obs_point
    rec.points = np.concatenate([rec.points, np.asarray(new_pts)]).astype(np.float32)
    rec.point_valid = np.concatenate([rec.point_valid, np.ones(8, bool)])
    rec.point_errors = np.zeros(len(rec.points), np.float32)
    n_before = int(rec.point_valid.sum())

    n1 = merge_tracks_by_proximity(rec, max_px=6.0)
    # All six pair-copies fuse; the triple loses exactly one copy (greedy
    # matching allows each point one merge per call); nothing else fuses —
    # every distinct-point pair reprojects above the gate.
    assert n1 == 7, n1
    n2 = merge_tracks_by_proximity(rec, max_px=6.0)
    assert n2 == 1, n2
    assert int(rec.point_valid.sum()) == n_before - 8
    assert merge_tracks_by_proximity(rec, max_px=6.0) == 0
    # Remapped observations: every surviving row reprojects tightly (the
    # fused position is the obs-weighted mean of 0.01-offset copies).
    assert rec.obs_point.max() < len(rec.points)
    assert rec.point_valid[rec.obs_point].all()
    assert float(rec.reprojection_errors().max()) < 2.0


def test_proximity_merge_preserves_quality():
    """The quality-preservation gate (merge.py): two DISTINCT well-fit points
    a few px apart in image space must NOT fuse even though their union
    reprojects under the absolute cap — an absolute-only gate fused distinct
    sub-blob features and degraded the 2048-ladder refine rounds to 2.15px
    mean reprojection. A fusion is accepted only when the union's fit stays
    within rel_factor x the tracks' current fit (floor_px floor)."""
    from sfm_tpu.pipeline.merge import (
        merge_tracks_by_proximity, _project_np, _so3_exp_np,
    )

    scene = make_orbit_scene(num_cameras=8, num_points=40, noise_px=0.0, seed=9)
    rec = scene_to_reconstruction(scene)
    vis_all = np.where(scene.visible.all(0))[0]
    p1, p2 = int(vis_all[0]), int(vis_all[1])

    # Move p2 right next to p1 (0.035 world units ~ 3.5px here) and make
    # its observations EXACT projections of the new position: two genuinely
    # distinct, perfectly-fit features.
    rec.points[p2] = rec.points[p1] + np.array([0.035, 0, 0], np.float32)
    rows = np.where(rec.obs_point == p2)[0]
    img = rec.obs_image[rows]
    proj, depth = _project_np(
        np.repeat(rec.points[p2][None], len(rows), 0),
        _so3_exp_np(rec.rvecs)[img], rec.tvecs[img], rec.intrinsics[img])
    assert (depth > 0).all()
    rec.obs_uv[rows] = proj.astype(np.float32)

    merge_tracks_by_proximity(rec, max_px=6.0)
    # Under the old absolute 6px gate this pair fused (union ~1.7px/side);
    # the quality gate (2x current fit = 0, floored at 1px) must keep both.
    assert rec.point_valid[p1] and rec.point_valid[p2]
    assert (rec.obs_point[rows] == p2).all()

    # Same 3D separation, but now p2 is a displaced COPY of p1 (its rows
    # re-observe p1's physical position, so its own fit is ~3.5px): the
    # relative gate scales with the current fit and accepts the fusion.
    proj1, _ = _project_np(
        np.repeat(rec.points[p1][None], len(rows), 0),
        _so3_exp_np(rec.rvecs)[img], rec.tvecs[img], rec.intrinsics[img])
    rec.obs_uv[rows] = proj1.astype(np.float32)
    n = merge_tracks_by_proximity(rec, max_px=6.0)
    assert n >= 1
    assert not (rec.point_valid[p1] and rec.point_valid[p2])


def test_split_tracks_by_consensus_separates_glued_fragments():
    """A track gluing observations of two distinct physical points (the
    round-4 contamination study's failure mode) must split: the consensus
    core keeps the old point, the detached rows form a new point, and
    retriangulation restores a clean model."""
    from sfm_tpu.pipeline.global_pose import retriangulate_reconstruction
    from sfm_tpu.pipeline.merge import split_tracks_by_consensus

    scene = make_orbit_scene(num_cameras=10, num_points=40, noise_px=0.0, seed=41)
    rec = scene_to_reconstruction(scene)
    # Glue point 7's observations onto point 3 (two far-apart GT points).
    d = np.linalg.norm(scene.points[3] - scene.points[7])
    assert d > 0.1
    victim = rec.obs_point == 7
    n_victim = int(victim.sum())
    assert n_victim >= 2
    rec.obs_point = rec.obs_point.copy()
    rec.obs_point[victim] = 3
    rec.point_valid[7] = False
    P0 = len(rec.points)

    n_det = split_tracks_by_consensus(rec, max_px=3.0, verbose=False)
    assert n_det == n_victim
    assert len(rec.points) == P0 + 1
    assert rec.point_valid[P0]                      # detached set can triangulate
    assert (rec.obs_point[victim] == P0).all()      # remapped, not dropped
    assert (rec.obs_point[~victim & (rec.obs_point != P0)] != P0).all()

    retriangulate_reconstruction(rec)
    assert rec.point_valid[3] and rec.point_valid[P0]
    np.testing.assert_allclose(rec.points[P0], scene.points[7], atol=1e-2)
    np.testing.assert_allclose(rec.points[3], scene.points[3], atol=1e-2)
    assert rec.mean_reprojection_error() < 0.1


def test_split_tracks_noop_on_clean_model():
    from sfm_tpu.pipeline.merge import split_tracks_by_consensus

    scene = make_orbit_scene(num_cameras=8, num_points=30, noise_px=0.0, seed=42)
    rec = scene_to_reconstruction(scene)
    P0 = len(rec.points)
    assert split_tracks_by_consensus(rec, max_px=3.0) == 0
    assert len(rec.points) == P0


def test_split_tracks_keeps_singleton_detachment_dormant():
    """A single outlier row detaches to an INVALID new point (evidence
    preserved for a future vote-fuse) rather than being deleted."""
    from sfm_tpu.pipeline.merge import split_tracks_by_consensus

    scene = make_orbit_scene(num_cameras=8, num_points=30, noise_px=0.0, seed=43)
    rec = scene_to_reconstruction(scene)
    O = rec.num_observations
    rec.obs_uv = rec.obs_uv.copy()
    row = int(np.where(rec.obs_point == 5)[0][0])
    rec.obs_uv[row] += 50.0                          # gross 2D outlier
    P0 = len(rec.points)
    n = split_tracks_by_consensus(rec, max_px=3.0)
    assert n == 1
    assert len(rec.points) == P0 + 1
    assert not rec.point_valid[P0]
    assert rec.obs_point[row] == P0
    assert rec.num_observations == O                 # nothing deleted
