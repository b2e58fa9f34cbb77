"""Why do 74.6k densified long-range edges yield only 305 track-merge votes?

Hypothesis under test: merge_tracks_by_correspondence's exact (image, kp)
lookup misses because a long-range match selects a DIFFERENT detected
keypoint on the same physical blob (multi-scale detections + viewpoint
drift), so the inlier endpoint is not an observation row of the model even
though the blob is. Measures, over long-range verified edges:

  - exact-endpoint hit rate (both inlier endpoints are model observations)
  - pixel-tolerant hit rate (some model obs of the image within r px of
    the matched keypoint's location)

    python benchmarks/vote_probe.py <ladder_cache>
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sfm_tpu.pipeline.stages import MatchGraph
    from sfm_tpu.scene.artifacts import ArtifactStore

    cache = sys.argv[1]
    store = ArtifactStore(cache)
    rec = store.load_reconstruction(stage="reconstruction")
    feats = store.load_features()
    with np.load(os.path.join(cache, "densify_new_edges.npz")) as z:
        g = MatchGraph(**{k: z[k] for k in z.files})

    n = len(rec.registered)
    d = np.abs(g.pairs[:, 0] - g.pairs[:, 1])
    d = np.minimum(d, n - d)
    sel = np.where(g.ok & (d > 100))[0]
    print(f"long-range verified edges (ring d>100): {len(sel)}")

    # Model obs lookup tables.
    pv = rec.point_valid[rec.obs_point]
    key_obs = (rec.obs_image[pv].astype(np.int64) << 32) | rec.obs_kp[pv].astype(np.int64)
    pt_obs = rec.obs_point[pv]
    order = np.argsort(key_obs, kind="stable")
    key_s, pt_s = key_obs[order], pt_obs[order]

    img_obs = rec.obs_image[pv]
    uv_obs = rec.obs_uv[pv]
    by_img_order = np.argsort(img_obs, kind="stable")
    img_sorted = img_obs[by_img_order]
    uv_sorted = uv_obs[by_img_order]
    pt_by_img = pt_obs[by_img_order]
    img_start = np.searchsorted(img_sorted, np.arange(n))
    img_end = np.searchsorted(img_sorted, np.arange(n) + 1)

    def exact(img, kp):
        ko = (img.astype(np.int64) << 32) | kp.astype(np.int64)
        pos = np.minimum(np.searchsorted(key_s, ko), len(key_s) - 1)
        return key_s[pos] == ko, np.where(key_s[pos] == ko, pt_s[pos], -1)

    rng = np.random.default_rng(0)
    probe = rng.choice(sel, size=min(300, len(sel)), replace=False)
    tol = 2.0
    n_inl = n_exact_both = n_tol_both = 0
    votes_exact: dict = {}
    votes_tol: dict = {}
    for e in probe:
        i, j = int(g.pairs[e, 0]), int(g.pairs[e, 1])
        m = np.where(g.inlier[e])[0]
        ki, kj = g.idx_i[e][m], g.idx_j[e][m]
        n_inl += len(m)
        hi, pi = exact(np.full(len(m), i), ki)
        hj, pj = exact(np.full(len(m), j), kj)
        n_exact_both += int((hi & hj).sum())
        for a, b in zip(pi[hi & hj], pj[hi & hj]):
            if a != b:
                k = (min(a, b), max(a, b))
                votes_exact[k] = votes_exact.get(k, 0) + 1

        # Pixel-tolerant: nearest model obs of the image within tol px.
        def tol_lookup(img, kps):
            s, t = img_start[img], img_end[img]
            if t <= s:
                return np.full(len(kps), -1)
            uv_model = uv_sorted[s:t]
            pts_model = pt_by_img[s:t]
            uv_q = feats.xy[img][kps]
            dist = np.linalg.norm(uv_model[None] - uv_q[:, None], axis=-1)
            best = dist.argmin(1)
            ok = dist[np.arange(len(kps)), best] <= tol
            return np.where(ok, pts_model[best], -1)

        ti = tol_lookup(i, ki)
        tj = tol_lookup(j, kj)
        both = (ti >= 0) & (tj >= 0)
        n_tol_both += int(both.sum())
        for a, b in zip(ti[both], tj[both]):
            if a != b:
                k = (min(a, b), max(a, b))
                votes_tol[k] = votes_tol.get(k, 0) + 1

    print(f"inliers probed: {n_inl}")
    print(f"exact both-endpoint hits: {n_exact_both} "
          f"({100 * n_exact_both / max(n_inl, 1):.1f}%)")
    print(f"tol({tol}px) both-endpoint hits: {n_tol_both} "
          f"({100 * n_tol_both / max(n_inl, 1):.1f}%)")
    ve2 = sum(1 for v in votes_exact.values() if v >= 2)
    vt2 = sum(1 for v in votes_tol.values() if v >= 2)
    print(f"cross-point pairs: exact {len(votes_exact)} (>=2 votes: {ve2}), "
          f"tol {len(votes_tol)} (>=2 votes: {vt2})")


if __name__ == "__main__":
    main()
