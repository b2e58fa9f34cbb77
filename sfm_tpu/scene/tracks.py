"""Track building (SURVEY.md §2.5): union-find over verified matches.

Host-side by design: the graph is small (O(total keypoints)), the work is
irregular pointer-chasing, and it runs once per reconstruction — exactly
the kind of bookkeeping SURVEY.md §7 keeps off-device. Tracks touching one
image twice are rejected (reference-class consistency filter).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sfm_tpu.pipeline.stages import MatchGraph


@dataclass
class TrackSet:
    """Track t spans observations rows [track_start[t], track_start[t+1])."""

    # Per-observation, sorted by track id.
    obs_image: np.ndarray   # [O] int32
    obs_kp: np.ndarray      # [O] int32
    track_id: np.ndarray    # [O] int32
    num_tracks: int

    def lengths(self) -> np.ndarray:
        return np.bincount(self.track_id, minlength=self.num_tracks)


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        root = i
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[i] != root:  # path compression
            self.parent[i], i = root, self.parent[i]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(graph: MatchGraph, num_images: int, max_kp: int, min_length: int = 2) -> TrackSet:
    """Union-find over inlier correspondences of verified edges.

    Dispatches to the native C++ builder (sfm_tpu/native/tracks.cpp) when
    available — at large-scale match graphs the Python loop is the
    bottleneck of the whole host side; falls back to pure Python otherwise.
    """
    from sfm_tpu.native import get_lib

    lib = get_lib()
    if lib is not None:
        return _build_tracks_native(lib, graph, num_images, max_kp, min_length)
    return _build_tracks_python(graph, num_images, max_kp, min_length)


def _build_tracks_native(lib, graph: MatchGraph, num_images: int, max_kp: int, min_length: int) -> TrackSet:
    import ctypes

    pairs = np.ascontiguousarray(graph.pairs, dtype=np.int32)
    ok = np.ascontiguousarray(graph.ok, dtype=np.uint8)
    idx_i = np.ascontiguousarray(graph.idx_i, dtype=np.int32)
    idx_j = np.ascontiguousarray(graph.idx_j, dtype=np.int32)
    inlier = np.ascontiguousarray(graph.inlier, dtype=np.uint8)
    E, M = idx_i.shape if idx_i.ndim == 2 else (0, 0)

    # The C++ side indexes touched[img * max_kp + kp] without bounds checks
    # (it is the hot path); an out-of-range keypoint or image id from a
    # malformed graph would corrupt the heap SILENTLY and crash something
    # unrelated much later. Validate the whole batch here in vectorized
    # numpy — microseconds against the union-find's seconds.
    live = ok.astype(bool)[:, None] & inlier.astype(bool)
    if live.any():
        ki, kj = idx_i[live], idx_j[live]
        e_live = live.any(axis=1)
        pi = pairs[e_live]
        if (ki.min() < 0 or kj.min() < 0
                or ki.max() >= max_kp or kj.max() >= max_kp
                or pi.min() < 0 or pi.max() >= num_images):
            raise ValueError(
                "build_tracks: graph indices out of range "
                f"(kp in [{min(ki.min(), kj.min())}, {max(ki.max(), kj.max())}] "
                f"vs max_kp={max_kp}; img in [{pi.min()}, {pi.max()}] "
                f"vs num_images={num_images})"
            )

    cap = int(inlier.sum()) * 2 + 16
    obs_image = np.empty(cap, np.int32)
    obs_kp = np.empty(cap, np.int32)
    track_id = np.empty(cap, np.int32)
    n_tracks = ctypes.c_int64(0)

    rows = lib.sfm_build_tracks(
        pairs.ctypes.data, ok.ctypes.data,
        idx_i.ctypes.data, idx_j.ctypes.data, inlier.ctypes.data,
        E, M, num_images, max_kp, min_length,
        obs_image.ctypes.data, obs_kp.ctypes.data, track_id.ctypes.data,
        cap, ctypes.byref(n_tracks),
    )
    if rows < 0:
        raise RuntimeError("native track builder: output capacity underestimated")
    return TrackSet(
        obs_image=obs_image[:rows].copy(),
        obs_kp=obs_kp[:rows].copy(),
        track_id=track_id[:rows].copy(),
        num_tracks=int(n_tracks.value),
    )


def _build_tracks_python(graph: MatchGraph, num_images: int, max_kp: int, min_length: int = 2) -> TrackSet:
    """Pure-Python reference implementation (and no-toolchain fallback)."""
    uf = _UnionFind(num_images * max_kp)

    def node(img, kp):
        return img * max_kp + kp

    for e in range(len(graph.pairs)):
        if not graph.ok[e]:
            continue
        i, j = graph.pairs[e]
        inl = graph.inlier[e]
        for ki, kj in zip(graph.idx_i[e][inl], graph.idx_j[e][inl]):
            uf.union(node(i, int(ki)), node(j, int(kj)))

    # Collect components over nodes that appear in at least one inlier match.
    touched = set()
    for e in range(len(graph.pairs)):
        if not graph.ok[e]:
            continue
        i, j = graph.pairs[e]
        inl = graph.inlier[e]
        for ki, kj in zip(graph.idx_i[e][inl], graph.idx_j[e][inl]):
            touched.add(node(i, int(ki)))
            touched.add(node(j, int(kj)))

    comp: dict[int, list[int]] = {}
    for n in touched:
        comp.setdefault(uf.find(n), []).append(n)

    obs_image, obs_kp, track_id = [], [], []
    tid = 0
    for nodes in comp.values():
        if len(nodes) < min_length:
            continue
        imgs = [n // max_kp for n in nodes]
        if len(set(imgs)) != len(imgs):
            continue  # track visits an image twice -> inconsistent, drop
        for n in sorted(nodes):
            obs_image.append(n // max_kp)
            obs_kp.append(n % max_kp)
            track_id.append(tid)
        tid += 1

    return TrackSet(
        obs_image=np.asarray(obs_image, dtype=np.int32),
        obs_kp=np.asarray(obs_kp, dtype=np.int32),
        track_id=np.asarray(track_id, dtype=np.int32),
        num_tracks=tid,
    )
