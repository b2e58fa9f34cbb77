"""Track builder: native C++ vs Python reference (SURVEY.md §2.5, §4)."""

import numpy as np
import pytest

from sfm_tpu.pipeline.stages import MatchGraph
from sfm_tpu.scene.tracks import build_tracks, _build_tracks_python, _build_tracks_native
from sfm_tpu.native import get_lib


def synthetic_graph(num_images=10, max_kp=50, num_points=40, seed=0, drop=0.2):
    """Edges whose inlier matches encode a known point->keypoint assignment."""
    rng = np.random.default_rng(seed)
    kp_of = rng.integers(0, max_kp, size=(num_images, num_points)).astype(np.int32)
    # Make keypoint ids unique per image (a kp observes one point).
    for i in range(num_images):
        kp_of[i] = rng.permutation(max_kp)[:num_points]
    sees = rng.random((num_images, num_points)) > drop

    pairs, idx_i, idx_j, inlier, ok = [], [], [], [], []
    M = num_points
    for i in range(num_images):
        for j in range(i + 1, num_images):
            common = np.where(sees[i] & sees[j])[0]
            ii = np.zeros(M, np.int32)
            jj = np.zeros(M, np.int32)
            inl = np.zeros(M, bool)
            ii[: len(common)] = kp_of[i, common]
            jj[: len(common)] = kp_of[j, common]
            inl[: len(common)] = True
            pairs.append((i, j)); idx_i.append(ii); idx_j.append(jj); inlier.append(inl)
            ok.append(len(common) >= 3)
    E = len(pairs)
    g = MatchGraph(
        pairs=np.asarray(pairs, np.int32), idx_i=np.stack(idx_i), idx_j=np.stack(idx_j),
        inlier=np.stack(inlier), num_inliers=np.asarray([x.sum() for x in inlier], np.int32),
        num_h_inliers=np.zeros(E, np.int32), rvec=np.zeros((E, 3), np.float32),
        tvec=np.zeros((E, 3), np.float32), ok=np.asarray(ok),
    )
    return g, kp_of, sees


def canonical(ts):
    """Order-independent representation: frozenset of observation tuples per track."""
    tracks = {}
    for img, kp, t in zip(ts.obs_image, ts.obs_kp, ts.track_id):
        tracks.setdefault(int(t), set()).add((int(img), int(kp)))
    return set(frozenset(v) for v in tracks.values())


def test_native_available():
    assert get_lib() is not None, "g++ toolchain present; native build must succeed"


def test_native_equals_python():
    g, _, _ = synthetic_graph()
    ts_py = _build_tracks_python(g, 10, 50, 2)
    ts_cc = _build_tracks_native(get_lib(), g, 10, 50, 2)
    assert ts_py.num_tracks == ts_cc.num_tracks
    assert canonical(ts_py) == canonical(ts_cc)  # set equality


def test_tracks_recover_points():
    g, kp_of, sees = synthetic_graph()
    ts = build_tracks(g, 10, 50, min_length=2)
    tracks = canonical(ts)
    # Expected: per planted point, the connected components of its observing
    # images under OK edges (an observation only joins a track through a
    # verified edge that links it).
    ok_edges = {tuple(p) for p, o in zip(g.pairs.tolist(), g.ok.tolist()) if o}
    expected = []
    for p in range(kp_of.shape[1]):
        imgs = [i for i in range(10) if sees[i, p]]
        parent = {i: i for i in imgs}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for a in imgs:
            for b in imgs:
                if a < b and (a, b) in ok_edges:
                    parent[find(b)] = find(a)
        comps = {}
        for i in imgs:
            comps.setdefault(find(i), []).append(i)
        for comp in comps.values():
            if len(comp) >= 2:
                expected.append(frozenset((i, int(kp_of[i, p])) for i in comp))
    assert set(expected) == tracks


def test_inconsistent_track_rejected():
    # Edge 0 matches img0.kp0<->img1.kp5 AND img0.kp1<->img1.kp5: the
    # component holds two keypoints of image 0 -> inconsistent, rejected.
    pairs = np.asarray([[0, 1], [0, 1]], np.int32)
    idx_i = np.asarray([[0, 1], [0, 0]], np.int32)
    idx_j = np.asarray([[5, 5], [0, 0]], np.int32)
    inlier = np.asarray([[True, True], [False, False]])
    g = MatchGraph(
        pairs=pairs, idx_i=idx_i, idx_j=idx_j, inlier=inlier,
        num_inliers=np.asarray([2, 0], np.int32), num_h_inliers=np.zeros(2, np.int32),
        rvec=np.zeros((2, 3), np.float32), tvec=np.zeros((2, 3), np.float32),
        ok=np.asarray([True, False]),
    )
    ts = build_tracks(g, 2, 8, min_length=2)
    assert ts.num_tracks == 0  # img0 visited twice -> rejected


def test_native_speed_on_large_graph():
    import time

    g, _, _ = synthetic_graph(num_images=40, max_kp=512, num_points=400, seed=3)
    t0 = time.perf_counter()
    ts = _build_tracks_native(get_lib(), g, 40, 512, 2)
    dt = time.perf_counter() - t0
    assert ts.num_tracks > 300
    assert dt < 1.0, f"native track build took {dt:.2f}s"
