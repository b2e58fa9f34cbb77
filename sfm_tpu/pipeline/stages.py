"""Stage wrappers: host-side loops feeding jit-compiled device blocks
(SURVEY.md §3.1). Each stage streams fixed-shape blocks to the device and
returns plain numpy for the (cheap, irregular) host bookkeeping between
stages.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.ops.sift import extract_features, Features
from sfm_tpu.ops.match import match_block, PairMatches
from sfm_tpu.ops.verify import verify_block
from sfm_tpu.pipeline.ingest import ImageBatch

_FEATURE_CHUNK = 8  # images per device batch in the feature stage


def _feature_extractor(cfg: PipelineConfig):
    """(chunk_size, fn(canvases, valid_hw) -> Features) for the feature stage.

    Multi-chip: DP over images (SURVEY.md §2.9) — each chunk is sharded
    across the mesh with shard_map and every chip extracts its resident
    images; per-image extraction is embarrassingly parallel so the sharded
    outputs equal the single-chip ones exactly. The compiled callable is
    cached per (sift config, mesh) via _dp_extract_fn.
    """
    n = cfg.shard.num_devices
    if n > 1:
        import jax

        if jax.device_count() >= n:
            return _FEATURE_CHUNK * n, _dp_extract_fn(cfg.sift, n, cfg.shard.mesh_axis)
    return _FEATURE_CHUNK, lambda c, hw: extract_features(c, cfg.sift, hw)


from functools import lru_cache


@lru_cache(maxsize=None)
def _dp_extract_fn(sift_cfg, n_devices: int, axis: str):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sfm_tpu.dist.mesh import make_mesh

    mesh = make_mesh(n_devices, axis)
    fn = shard_map(
        lambda c, hw: extract_features(c, sift_cfg, hw),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


@dataclass
class FeatureSet:
    """Host-side features for all images (canvas pixel coords)."""

    xy: np.ndarray        # [B, N, 2]
    sigma: np.ndarray     # [B, N]
    angle: np.ndarray     # [B, N]
    response: np.ndarray  # [B, N]
    desc: np.ndarray      # [B, N, 128]
    valid: np.ndarray     # [B, N]


@dataclass
class MatchGraph:
    """Verified match graph (SURVEY.md §2.3/2.4): edges + two-view geometry."""

    pairs: np.ndarray          # [E, 2] image indices (i < j)
    idx_i: np.ndarray          # [E, M] keypoint indices in image i
    idx_j: np.ndarray          # [E, M]
    inlier: np.ndarray         # [E, M] bool (geometric inliers)
    num_inliers: np.ndarray    # [E]
    num_h_inliers: np.ndarray  # [E]
    rvec: np.ndarray           # [E, 3] relative pose i->j
    tvec: np.ndarray           # [E, 3]
    ok: np.ndarray             # [E] bool
    pose_ok: np.ndarray | None = None  # [E] bool; False = correspondence-only
                                       # edge (rotation-degenerate), pose unusable


def extract_stage(batch: ImageBatch, cfg: PipelineConfig) -> FeatureSet:
    B = batch.canvases.shape[0]
    chunk, extract = _feature_extractor(cfg)
    outs = []
    for s in range(0, B, chunk):
        e = min(s + chunk, B)
        # Pad the last chunk to the fixed batch size (one compile).
        pad = chunk - (e - s)
        canv = batch.canvases[s:e]
        hw = batch.valid_hw[s:e]
        if pad:
            canv = np.concatenate([canv, np.zeros((pad, *canv.shape[1:]), canv.dtype)])
            hw = np.concatenate([hw, np.zeros((pad, 2), hw.dtype)])
        f = extract(jnp.asarray(canv), jnp.asarray(hw))
        outs.append(jax.tree.map(lambda a: np.asarray(a)[: e - s], f))
    return FeatureSet(
        xy=np.concatenate([o.xy for o in outs]),
        sigma=np.concatenate([o.sigma for o in outs]),
        angle=np.concatenate([o.angle for o in outs]),
        response=np.concatenate([o.response for o in outs]),
        desc=np.concatenate([o.desc for o in outs]),
        valid=np.concatenate([o.valid for o in outs]),
    )


def extract_stage_streaming(paths: list, cfg: PipelineConfig):
    """Feature extraction over a path list without materializing all
    canvases: decode chunks on a prefetch thread while the device extracts
    the previous chunk (SURVEY.md §7 hard part 7). Returns
    (FeatureSet, intrinsics [B,6], valid_hw [B,2], names)."""
    from sfm_tpu.pipeline.ingest import iter_image_chunks

    chunk, extract = _feature_extractor(cfg)
    outs, intr, hw, names = [], [], [], []
    for batch in iter_image_chunks(paths, cfg.sift, chunk):
        n = len(batch.names)
        canv = batch.canvases
        vhw = batch.valid_hw
        pad = chunk - n
        if pad:
            canv = np.concatenate([canv, np.zeros((pad, *canv.shape[1:]), canv.dtype)])
            vhw = np.concatenate([vhw, np.zeros((pad, 2), vhw.dtype)])
        f = extract(jnp.asarray(canv), jnp.asarray(vhw))
        outs.append(jax.tree.map(lambda a: np.asarray(a)[:n], f))
        intr.append(batch.intrinsics)
        hw.append(batch.valid_hw)
        names.extend(batch.names)
    feats = FeatureSet(
        xy=np.concatenate([o.xy for o in outs]),
        sigma=np.concatenate([o.sigma for o in outs]),
        angle=np.concatenate([o.angle for o in outs]),
        response=np.concatenate([o.response for o in outs]),
        desc=np.concatenate([o.desc for o in outs]),
        valid=np.concatenate([o.valid for o in outs]),
    )
    return feats, np.concatenate(intr), np.concatenate(hw), names


# Keep the whole feature set resident on the matching chip below this size
# (10k images x 4096 kp x 128-D fp32 would be ~20GB — stream those instead).
# 6GB admits the 10k x 1024-kp ladder corpus (5.2GB) on a 16GB-HBM chip; the
# match stage's per-block working set is small and nothing else is live then.
_DEVICE_FEATURE_CACHE_BYTES = 6 << 30


@jax.jit
def _gather_uv(xy: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-pair keypoint-coordinate gather, on device. [P,N,2],[P,M]->[P,M,2]."""
    return jnp.take_along_axis(xy, idx[..., None], axis=1)


def _bucket_keypoints(n: int, cap: int) -> int:
    """Power-of-2 keypoint-axis bucket in [512, cap] covering n."""
    b = 512
    while b < n:
        b *= 2
    return min(b, cap)


def exhaustive_pairs(num_images: int) -> np.ndarray:
    """All N(N-1)/2 pairs (i < j)."""
    ii, jj = np.triu_indices(num_images, k=1)
    return np.stack([ii, jj], axis=1).astype(np.int32)


# Host-side budget for one streamed ring row-block ([Br, B, M] x 3 arrays).
_RING_BLOCK_BYTES = 1 << 30


def ring_match_pairs(feats: FeatureSet, cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All-pairs matching on a multi-chip mesh via the ring-ppermute matcher
    (SURVEY.md §5.7). Returns (pairs [E,2] with i<j, idx_i, idx_j, valid)
    in the same layout the block matcher produces, for the verify stage.

    The O(B^2 M) match table is streamed in ROW blocks (ring_match_rows):
    each block is compacted to its surviving pairs before the next is
    computed, bounding host memory at _RING_BLOCK_BYTES instead of the full
    table (which is TBs at Rome16K scale).
    """
    import jax.numpy as jnp2

    from sfm_tpu.dist.mesh import make_mesh
    from sfm_tpu.dist.ring_match import ring_match_rows

    B = len(feats.xy)
    n_dev = cfg.shard.num_devices
    M = cfg.match.max_matches
    padB = -(-B // n_dev) * n_dev
    desc = np.zeros((padB, *feats.desc.shape[1:]), feats.desc.dtype)
    valid = np.zeros((padB, feats.valid.shape[1]), bool)
    desc[:B] = feats.desc
    valid[:B] = feats.valid
    mesh = make_mesh(n_dev, cfg.shard.mesh_axis)
    desc_d = jnp2.asarray(desc)
    valid_d = jnp2.asarray(valid)

    # Row-chunk size: fit 3 x [Br, padB, M] int32/bool on host, multiple of
    # the mesh, and a power-of-2 count of chunks shapes so jit reuses one
    # compiled program.
    per_row = padB * M * (4 + 4 + 1)
    chunk = max(n_dev, min(padB, (_RING_BLOCK_BYTES // max(per_row, 1)) // n_dev * n_dev))
    pairs_l, pi_l, pj_l, pv_l = [], [], [], []
    for r0 in range(0, padB, chunk):
        r1 = min(r0 + chunk, padB)
        if r1 - r0 < chunk:  # pad the tail chunk (one compile)
            rows = np.arange(r0, r0 + chunk) % padB
            dr, vr = desc_d[rows], valid_d[rows]
        else:
            dr, vr = desc_d[r0:r1], valid_d[r0:r1]
        ii, jj, ok = ring_match_rows(dr, vr, desc_d, valid_d, cfg.match, mesh, cfg.shard.mesh_axis)
        ii, jj, ok = np.asarray(ii), np.asarray(jj), np.asarray(ok)
        counts = ok.sum(-1)                               # [chunk, padB]
        gi = r0 + np.arange(chunk)[:, None]               # global row ids
        gj = np.arange(padB)[None, :]
        keep = (gi < gj) & (gi < B) & (gj < B) & (counts >= cfg.match.min_matches)
        a_loc, b_idx = np.nonzero(keep)
        if len(a_loc) == 0:
            continue
        pairs_l.append(np.stack([a_loc + r0, b_idx], 1).astype(np.int32))
        pi_l.append(ii[a_loc, b_idx])
        pj_l.append(jj[a_loc, b_idx])
        pv_l.append(ok[a_loc, b_idx])

    if not pairs_l:
        return np.zeros((0, 2), np.int32), None, None, None
    return (np.concatenate(pairs_l), np.concatenate(pi_l),
            np.concatenate(pj_l), np.concatenate(pv_l))


def match_and_verify_stage(
    feats: FeatureSet, pairs: np.ndarray, intrinsics: np.ndarray, cfg: PipelineConfig, seed: int = 0,
    prematched: tuple | None = None,
) -> MatchGraph:
    """Match + geometric verification over pair blocks (SURVEY.md §3.3).

    prematched: optional (idx_i [E,M], idx_j [E,M], valid [E,M]) from the
    ring matcher — the per-block matmul matching is skipped and verification
    runs on the given correspondences.
    """
    E = len(pairs)
    P = cfg.match.block_pairs
    M = cfg.match.max_matches

    # Multi-chip: shard the PAIR axis of every block across the mesh
    # (SURVEY.md §2.9 DP-over-pairs). Unlike the ring matcher this serves
    # ANY candidate list — in particular the vocab-tree-pruned pair set,
    # the realistic pod-scale matching workload. The per-pair compute is
    # vmapped and independent, so the SPMD partitioning is exact: inputs
    # are committed to a pair-sharded layout and jit's partitioner splits
    # match/verify across chips with no collectives inside the block.
    pair_sharding = None
    if cfg.shard.num_devices > 1 and jax.device_count() >= cfg.shard.num_devices:
        from jax.sharding import NamedSharding, PartitionSpec as Psp

        from sfm_tpu.dist.mesh import make_mesh

        mesh = make_mesh(cfg.shard.num_devices, cfg.shard.mesh_axis)
        pair_sharding = NamedSharding(mesh, Psp(cfg.shard.mesh_axis))
        replicated = NamedSharding(mesh, Psp())
        P = -(-P // cfg.shard.num_devices) * cfg.shard.num_devices

    def _shard_pairs(*arrays):
        if pair_sharding is None:
            return arrays
        return tuple(jax.device_put(a, pair_sharding) for a in arrays)

    out_idx_i = np.zeros((E, M), np.int32)
    out_idx_j = np.zeros((E, M), np.int32)
    out_inlier = np.zeros((E, M), bool)
    out_ninl = np.zeros(E, np.int32)
    out_nh = np.zeros(E, np.int32)
    out_rvec = np.zeros((E, 3), np.float32)
    out_tvec = np.zeros((E, 3), np.float32)
    out_ok = np.zeros(E, bool)
    out_pose_ok = np.zeros(E, bool)

    # Keypoints are response-sorted with validity masks, so when no image
    # fills the static budget the tail is pure padding: bucket the keypoint
    # axis down to the occupancy (power-of-2, floor 512) and skip that work
    # in the Gram matmuls entirely. Indices are prefix-stable.
    N_eff = _bucket_keypoints(int(feats.valid.sum(axis=1).max()), feats.valid.shape[1])
    feats = FeatureSet(
        xy=feats.xy[:, :N_eff], sigma=feats.sigma[:, :N_eff],
        angle=feats.angle[:, :N_eff], response=feats.response[:, :N_eff],
        desc=feats.desc[:, :N_eff], valid=feats.valid[:, :N_eff],
    )

    # Each image participates in O(N) pairs: shipping its descriptors to the
    # device once and gathering per block ON DEVICE beats re-transferring
    # them per pair block (host->device traffic was the dominant match-stage
    # cost). Falls back to host slicing when the feature set would not fit
    # comfortably on one chip.
    on_device = feats.desc.nbytes + feats.xy.nbytes <= _DEVICE_FEATURE_CACHE_BYTES
    if on_device:
        desc_all = jnp.asarray(feats.desc)
        valid_all = jnp.asarray(feats.valid)
        xy_all = jnp.asarray(feats.xy)
        intr_all = jnp.asarray(intrinsics.astype(np.float32))
        if pair_sharding is not None:
            # Replicate the feature cache so per-chip gathers of sharded
            # pair indices produce pair-sharded blocks without resharding.
            desc_all, valid_all, xy_all, intr_all = (
                jax.device_put(a, replicated)
                for a in (desc_all, valid_all, xy_all, intr_all)
            )

    base_key = jax.random.PRNGKey(seed)
    for s in range(0, E, P):
        e = min(s + P, E)
        blk = pairs[s:e]
        pad = P - len(blk)
        if pad:
            blk = np.concatenate([blk, np.tile(blk[-1:], (pad, 1))])
        if on_device:
            bi, bj = _shard_pairs(jnp.asarray(blk[:, 0]), jnp.asarray(blk[:, 1]))
            di, vi = desc_all[bi], valid_all[bi]
            dj, vj = desc_all[bj], valid_all[bj]
            xy_i, xy_j = xy_all[bi], xy_all[bj]
            intr_i, intr_j = intr_all[bi], intr_all[bj]
        else:
            di, vi, dj, vj, xy_i, xy_j, intr_i, intr_j = _shard_pairs(
                jnp.asarray(feats.desc[blk[:, 0]]),
                jnp.asarray(feats.valid[blk[:, 0]]),
                jnp.asarray(feats.desc[blk[:, 1]]),
                jnp.asarray(feats.valid[blk[:, 1]]),
                jnp.asarray(feats.xy[blk[:, 0]]),
                jnp.asarray(feats.xy[blk[:, 1]]),
                jnp.asarray(intrinsics[blk[:, 0]]),
                jnp.asarray(intrinsics[blk[:, 1]]),
            )
        if prematched is not None:
            pi, pj, pv = prematched
            pad_rows = np.tile(np.arange(s, e)[-1:], max(P - (e - s), 0))
            rows = np.concatenate([np.arange(s, e), pad_rows])
            pm = PairMatches(*_shard_pairs(
                jnp.asarray(pi[rows]), jnp.asarray(pj[rows]), jnp.asarray(pv[rows]),
            ))
        else:
            pm = match_block(di, vi, dj, vj, cfg.match)

        uv_i = _gather_uv(xy_i, pm.idx_i)
        uv_j = _gather_uv(xy_j, pm.idx_j)
        # Deterministic per-pair keys from the global pair index (SURVEY.md §5.2).
        (tix,) = _shard_pairs(jnp.arange(s, s + P))
        keys = jax.vmap(lambda t: jax.random.fold_in(base_key, t))(tix)
        geom = verify_block(keys, uv_i, uv_j, pm.valid, intr_i, intr_j, cfg.ransac)
        if cfg.match.guided:
            # Guided re-match (SURVEY.md §2.4): densify verified edges with
            # epipolar-gated matching under the just-estimated E; gated
            # matches are inliers by construction.
            from sfm_tpu.ops.match import guided_match_block

            pm_g = guided_match_block(
                di, vi, xy_i, dj, vj, xy_j,
                geom.E, intr_i, intr_j,
                cfg.match,
            )
            # Rotation-degenerate edges (pose_ok=False) carry a meaningless
            # E — guided rematch under it would manufacture wrong matches.
            use = np.asarray(geom.ok & geom.pose_ok)
            pm_idx_i = np.where(use[:, None], np.asarray(pm_g.idx_i), np.asarray(pm.idx_i))
            pm_idx_j = np.where(use[:, None], np.asarray(pm_g.idx_j), np.asarray(pm.idx_j))
            inliers = np.where(use[:, None], np.asarray(pm_g.valid), np.asarray(geom.inliers))
            ninl = np.where(use, np.asarray(pm_g.valid).sum(-1), np.asarray(geom.num_inliers))
        else:
            pm_idx_i = np.asarray(pm.idx_i)
            pm_idx_j = np.asarray(pm.idx_j)
            inliers = np.asarray(geom.inliers)
            ninl = np.asarray(geom.num_inliers)

        n = e - s
        out_idx_i[s:e] = pm_idx_i[:n]
        out_idx_j[s:e] = pm_idx_j[:n]
        out_inlier[s:e] = inliers[:n]
        out_ninl[s:e] = ninl[:n]
        out_nh[s:e] = np.asarray(geom.num_h_inliers)[:n]
        out_rvec[s:e] = np.asarray(geom.rvec)[:n]
        out_tvec[s:e] = np.asarray(geom.tvec)[:n]
        out_ok[s:e] = np.asarray(geom.ok)[:n]
        out_pose_ok[s:e] = np.asarray(geom.pose_ok)[:n]

    # An edge needs both enough matches and geometric support.
    enough = out_ninl >= cfg.ransac.min_inliers
    return MatchGraph(
        pairs=pairs, idx_i=out_idx_i, idx_j=out_idx_j, inlier=out_inlier,
        num_inliers=out_ninl, num_h_inliers=out_nh,
        rvec=out_rvec, tvec=out_tvec, ok=out_ok & enough,
        pose_ok=out_pose_ok & enough,
    )


_DENSIFY_REACH_BUDGET = 50_000_000  # nnz cap on the reachability matrix


def densify_candidate_pairs(
    pairs_ok: np.ndarray, num_images: int, max_scale: int = 8, per_node: int = 2,
) -> np.ndarray:
    """Candidate pairs along a power-of-2 graph-distance ladder
    (SURVEY.md §2.3 pair proposal, loop-closure completion).

    Top-k retrieval (vocab tree) spends its entire candidate budget on an
    image's nearest appearance neighbors, so a sequential/orbit capture gets
    a narrow band graph: at the 10k ladder every verified edge sat within
    +-8 ring images, ~1250 relative-pose hops around the loop, and the
    accumulated drift bent the model by 30% of the orbit radius — a
    deformation NO downstream solver can see (reprojection cost is flat
    along it). The ladder probes the VERIFIED graph's own connectivity:
    for scale s = 1..max_scale, each node proposes its frontier extremes at
    graph distance (2^(s-1), 2^s] — for a band graph those are the two ring
    directions — and verification keeps whatever the matcher can actually
    certify (the same scene verified pairs out to +-400 images, turning the
    loop into ~25 hops). Capture-order-free: only graph structure is used.

    Returns deduped [K, 2] (i < j) candidates excluding existing pairs.
    """
    import scipy.sparse as sp

    if len(pairs_ok) == 0 or max_scale <= 0:
        return np.zeros((0, 2), np.int64)
    n = num_images
    A = sp.csr_matrix(
        (np.ones(len(pairs_ok) * 2, np.bool_),
         (np.concatenate([pairs_ok[:, 0], pairs_ok[:, 1]]),
          np.concatenate([pairs_ok[:, 1], pairs_ok[:, 0]]))),
        shape=(n, n), dtype=np.bool_)
    reach = (A + sp.identity(n, dtype=np.bool_, format="csr")).astype(np.bool_)
    out = []
    for _ in range(max_scale):
        new = (reach @ reach).astype(np.bool_)
        # Frontier = reachable at <=2^s hops but not <=2^(s-1) (new is a
        # superset of reach because reach includes the identity).
        fr = (new.astype(np.int8) - reach.astype(np.int8)).tocsr()
        fr.eliminate_zeros()
        ptr, cols = fr.indptr, fr.indices
        counts = np.diff(ptr)
        rows = np.where(counts > 0)[0]
        if len(rows) == 0:
            break
        first = cols[ptr[rows]]
        out.append(np.stack([rows, first], 1))
        if per_node >= 2:
            last = cols[ptr[rows + 1] - 1]
            out.append(np.stack([rows, last], 1))
        reach = new
        if reach.nnz > _DENSIFY_REACH_BUDGET:
            break
    if not out:
        return np.zeros((0, 2), np.int64)
    cand = np.concatenate(out).astype(np.int64)
    cand = cand[cand[:, 0] != cand[:, 1]]
    cand = np.unique(np.stack([cand.min(1), cand.max(1)], 1), axis=0)
    have = (pairs_ok.astype(np.int64).min(1) << 32) | pairs_ok.astype(np.int64).max(1)
    key = (cand[:, 0] << 32) | cand[:, 1]
    return cand[~np.isin(key, have)]


def append_match_graph(g: MatchGraph, g_new: MatchGraph) -> tuple[MatchGraph, int]:
    """Append g_new's verified edges to g, conforming the correspondence
    width (columns beyond g's budget are truncated; narrower blocks are
    zero-padded with inlier=False)."""
    keep = g_new.ok
    if not keep.any():
        return g, 0
    def cat(a, b):
        b = b[keep]
        if a.ndim == 2 and b.shape[1] != a.shape[1]:
            if b.shape[1] > a.shape[1]:
                b = b[:, :a.shape[1]]
            else:
                out = np.zeros((b.shape[0], a.shape[1]), b.dtype)
                out[:, :b.shape[1]] = b
                b = out
        return np.concatenate([a, b], axis=0)
    pose_ok = g.pose_ok if g.pose_ok is not None else np.ones(len(g.pairs), bool)
    new_pose_ok = (g_new.pose_ok if g_new.pose_ok is not None
                   else np.ones(len(g_new.pairs), bool))
    merged = MatchGraph(
        pairs=cat(g.pairs, g_new.pairs), idx_i=cat(g.idx_i, g_new.idx_i),
        idx_j=cat(g.idx_j, g_new.idx_j), inlier=cat(g.inlier, g_new.inlier),
        num_inliers=cat(g.num_inliers, g_new.num_inliers),
        num_h_inliers=cat(g.num_h_inliers, g_new.num_h_inliers),
        rvec=cat(g.rvec, g_new.rvec), tvec=cat(g.tvec, g_new.tvec),
        ok=cat(g.ok, g_new.ok), pose_ok=cat(pose_ok, new_pose_ok),
    )
    return merged, int(keep.sum())


def densify_graph(
    feats: FeatureSet, graph: MatchGraph, intrinsics: np.ndarray,
    cfg: PipelineConfig, num_images: int, seed: int = 1,
) -> MatchGraph:
    """Graph-distance-ladder densification pass: propose, verify, append.
    See densify_candidate_pairs for why pruned pair modes need this."""
    cand = densify_candidate_pairs(
        graph.pairs[graph.ok], num_images,
        max_scale=cfg.match.densify_scales, per_node=cfg.match.densify_per_node,
    )
    if len(cand) == 0:
        return graph
    g_new = match_and_verify_stage(feats, cand, intrinsics, cfg, seed=seed)
    graph, added = append_match_graph(graph, g_new)
    if cfg.verbose:
        print(f"[sfm_tpu] densify: {added}/{len(cand)} ladder pairs verified "
              f"-> {int(graph.ok.sum())} edges")
    return graph
