"""Match-graph densification (pipeline/stages.densify_candidate_pairs):
graph-distance-ladder pair proposal + verified-edge append.

Why it exists: top-k retrieval gives sequential captures a narrow band
graph (10k orbit ladder: all verified edges within +-8 ring images), and
loop-scale drift then has no constraint to push against. The ladder
proposes frontier pairs at graph distance 2^s so verification can recover
every edge the matcher can actually certify.
"""

import numpy as np

from sfm_tpu.pipeline.stages import (MatchGraph, append_match_graph,
                                     densify_candidate_pairs)


def _ring_band_pairs(n: int, band: int) -> np.ndarray:
    """Verified pairs of a ring capture matched to +-band neighbors."""
    out = []
    for i in range(n):
        for d in range(1, band + 1):
            j = (i + d) % n
            out.append((min(i, j), max(i, j)))
    return np.unique(np.asarray(out, np.int64), axis=0)


def test_ladder_reaches_all_scales():
    n, band = 64, 1
    pairs = _ring_band_pairs(n, band)
    cand = densify_candidate_pairs(pairs, n, max_scale=5, per_node=2)
    assert len(cand)
    # No self pairs, canonical order, no duplicates of existing edges.
    assert (cand[:, 0] < cand[:, 1]).all()
    key_new = (cand[:, 0] << 32) | cand[:, 1]
    key_old = (pairs[:, 0] << 32) | pairs[:, 1]
    assert not np.isin(key_new, key_old).any()
    # Ring distances should cover powers of two up to 2^5 (band=1 ring:
    # frontier at scale s sits exactly at distance 2^s).
    d = np.abs(cand[:, 0] - cand[:, 1])
    d = np.minimum(d, n - d)
    for s in (2, 4, 8, 16, 32):
        assert (d == s).any(), f"no candidate at ring distance {s}"


def test_ladder_empty_inputs():
    assert densify_candidate_pairs(np.zeros((0, 2), np.int64), 10).shape == (0, 2)
    pairs = _ring_band_pairs(16, 2)
    assert densify_candidate_pairs(pairs, 16, max_scale=0).shape == (0, 2)


def _tiny_graph(pairs: np.ndarray, M: int, ok: np.ndarray) -> MatchGraph:
    E = len(pairs)
    return MatchGraph(
        pairs=pairs.astype(np.int32),
        idx_i=np.zeros((E, M), np.int32), idx_j=np.zeros((E, M), np.int32),
        inlier=np.zeros((E, M), bool),
        num_inliers=np.full(E, M, np.int32), num_h_inliers=np.zeros(E, np.int32),
        rvec=np.zeros((E, 3), np.float32), tvec=np.zeros((E, 3), np.float32),
        ok=ok, pose_ok=ok.copy(),
    )


def test_append_conforms_correspondence_width():
    g = _tiny_graph(np.asarray([[0, 1], [1, 2]]), M=8, ok=np.ones(2, bool))
    wider = _tiny_graph(np.asarray([[0, 2], [0, 3]]), M=16,
                        ok=np.asarray([True, False]))
    wider.idx_i[:, :] = 7
    merged, added = append_match_graph(g, wider)
    assert added == 1  # only ok edges appended
    assert merged.idx_i.shape == (3, 8)
    assert (merged.pairs[-1] == [0, 2]).all()

    narrower = _tiny_graph(np.asarray([[1, 3]]), M=4, ok=np.ones(1, bool))
    merged2, added2 = append_match_graph(merged, narrower)
    assert added2 == 1 and merged2.idx_i.shape == (4, 8)
    # Zero-padded tail correspondences must not read as inliers.
    assert not merged2.inlier[-1, 4:].any()


def test_append_no_ok_edges_is_identity():
    g = _tiny_graph(np.asarray([[0, 1]]), M=8, ok=np.ones(1, bool))
    empty = _tiny_graph(np.asarray([[0, 2]]), M=8, ok=np.zeros(1, bool))
    merged, added = append_match_graph(g, empty)
    assert added == 0 and len(merged.pairs) == 1
