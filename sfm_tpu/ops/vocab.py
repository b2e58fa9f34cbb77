"""Vocabulary-tree pair pruning (SURVEY.md §2.3) — native component #3.

Reference-class realization: C++ hierarchical k-means tree (VocabTree2 /
DBoW-class) with inverted files. TPU-native re-design: every level of the
tree is a batched k-means whose assignment step is one Gram matmul on the
MXU (descriptors and centers are unit-norm, so argmax dot == argmin L2);
tree descent for quantization processes ALL descriptors of ALL images as a
single [total_desc, branching] matmul per level; TF-IDF scoring is a sparse
histogram intersection computed as one [B, vocab] x [vocab, B] matmul.

The output is, per image, the top-k most similar images — the pruned pair
list that replaces the O(N^2) exhaustive sweep at >=100 images (config
ladder #3, BASELINE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import VocabConfig


import functools


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_batch(keys, data_all: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                  k: int, iters: int) -> jnp.ndarray:
    """One node-group of k-means fits as ONE compiled program.

    The training corpus stays RESIDENT on device and each node's subset is
    gathered by (tiny) index arrays — the host-side subset assembly
    re-shipped ~134MB per tree level over a ~50MB/s link. The vmap lives
    INSIDE the jit so the whole group is one dispatch (an eager vmap over a
    jitted body re-enters the tracer and dispatches per primitive)."""
    return jax.vmap(lambda kk, ii, ww: _kmeans(kk, data_all[ii], ww, k, iters))(keys, idx, w)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans(key, data: jnp.ndarray, w: jnp.ndarray, k: int, iters: int) -> jnp.ndarray:
    """Weighted spherical k-means on unit-norm descriptors.

    data [N, D], w [N] (0 = padding row) -> centers [k, D]. Jitted with
    static (k, iters): the tree build calls this once per node, and padded
    subsets let every node at a size bucket share ONE compile (unbucketed,
    the build triggered hundreds of remote recompiles).

    Assignment = argmax data @ centers^T (MXU); update = weight-masked mean;
    empty clusters re-seed from the least-well-represented valid points.
    """
    N, D = data.shape
    # Seed from valid rows: Gumbel-max over the weight mask.
    g = jax.random.uniform(key, (N,))
    seed_scores = jnp.where(w > 0, g, -1.0)
    idx = jax.lax.top_k(seed_scores, k)[1]
    centers = data[idx]

    def step(centers, _):
        sim = data @ centers.T                          # [N, k] MXU
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype) * w[:, None]
        sums = onehot.T @ data                          # [k, D] MXU
        counts = jnp.sum(onehot, axis=0)
        new = sums / jnp.maximum(counts[:, None], 1e-8)
        # Re-seed empties with the valid points farthest from their center.
        far_scores = jnp.where(w > 0, -jnp.max(sim, axis=1), -jnp.inf)
        far = data[jax.lax.top_k(far_scores, k)[1]]
        new = jnp.where(counts[:, None] > 0, new, far)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-8)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


@functools.partial(jax.jit, static_argnames=("branching",))
def _reassign_level(ctrs: jnp.ndarray, desc: jnp.ndarray, node: jnp.ndarray,
                    branching: int) -> jnp.ndarray:
    """Advance assignments one level: each row only compares against its
    current node's children (on-device center gather — HBM-cheap; the full
    root-to-leaf descent per level re-did all previous levels' matmuls and
    cost ~7s/level at 200k training rows)."""
    b = branching
    cand = node[:, None] * b + jnp.arange(b)[None, :]              # [N, b]
    sim = jnp.einsum("nd,nbd->nb", desc, ctrs[cand])
    return cand[jnp.arange(desc.shape[0]), jnp.argmax(sim, axis=1)]


@functools.partial(jax.jit, static_argnames=("branching",))
def _descend_chunk(centers: tuple, desc: jnp.ndarray, branching: int) -> jnp.ndarray:
    """Tree descent for one chunk. One MXU matmul per level.

    Similarities against ALL centers of the level come from one dense
    matmul, then each descriptor selects its node's child window with a
    [N, b] take_along_axis on the similarity matrix. (Gathering the
    candidate CENTER ROWS instead — [N, b, D] — moved ~0.4GB per level
    at 100k descriptors and dominated retrieval.) Beyond the matmul
    budget the row-gather fallback handles very deep trees.

    Centers are jit ARGUMENTS, not closure captures: capturing them bakes
    them into the executable as constants, so every build/retrieval with a
    new tree recompiled (~20-40s each on a remote-compile device). As
    arguments, one cached executable serves every tree of the same shape.
    """
    node = jnp.zeros(desc.shape[0], dtype=jnp.int32)
    b = branching
    # Similarities only feed an argmax over b children — bf16 inputs with
    # f32 accumulation lose nothing and skip the global
    # default_matmul_precision=highest 6-pass f32 decomposition (the deep
    # levels' [chunk, words] matmul dominated retrieval).
    desc_bf = desc.astype(jnp.bfloat16)
    for ctrs in centers:
        ctrs_bf = ctrs.astype(jnp.bfloat16)
        cand = node[:, None] * b + jnp.arange(b)[None, :]          # [N, b]
        if ctrs.shape[0] <= 8192:
            sim_all = jnp.dot(desc_bf, ctrs_bf.T,
                              preferred_element_type=jnp.float32)  # [N, n_l] MXU
            sim = jnp.take_along_axis(sim_all, cand, axis=1)       # [N, b]
        else:
            sim = jnp.einsum("nd,nbd->nb", desc_bf, ctrs_bf[cand],
                             preferred_element_type=jnp.float32)   # batched
        node = cand[jnp.arange(desc.shape[0]), jnp.argmax(sim, axis=1)]
    return node


class VocabTree:
    """Flat-array hierarchical k-means tree.

    centers[level] has shape [branching^level * branching, D] laid out so the
    children of node n at level l are rows n*branching:(n+1)*branching of
    centers[l]. Leaves = branching^depth visual words.
    """

    def __init__(self, centers: list[jnp.ndarray], branching: int, depth: int):
        self.centers = centers
        self.branching = branching
        self.depth = depth
        self.num_words = branching**depth

    _CHUNK = 65536  # descent rows per dispatch: [chunk, words] sim <= ~1GB
    _MIN_CHUNK = 8192

    def quantize(self, desc: jnp.ndarray) -> jnp.ndarray:
        """desc [N, D] -> leaf/word id [N], chunked so the per-level
        similarity matrix stays ~1GB regardless of corpus size (at 1M
        descriptors the unchunked [N, words] matmul OOMs 16GB HBM). Chunks
        are power-of-2 bucketed so executables cache across corpus sizes."""
        N = desc.shape[0]
        cap = self._MIN_CHUNK
        while cap < min(N, self._CHUNK):
            cap *= 2
        ctrs = tuple(self.centers)
        outs = []
        for s in range(0, N, cap):
            chunk = desc[s:s + cap]
            pad = cap - chunk.shape[0]
            if pad:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            outs.append(_descend_chunk(ctrs, chunk, self.branching))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out[:N]


_MAX_NODE_TRAIN = 8192  # per-node k-means training row cap (fits b centers fine)
_REASSIGN_CHUNK = 262144  # rows per reassignment dispatch ([chunk, b, D] ~ 1GB)


def build_vocab_tree(key, training_desc: jnp.ndarray, cfg: VocabConfig, train_w: np.ndarray | None = None) -> VocabTree:
    """Hierarchical spherical k-means over training descriptors.

    train_w: optional [N] 0/1 weights — zero rows are padding (static-shape
    callers pad their training sample to a bucket size)."""
    b, depth = cfg.branching, cfg.depth
    if train_w is None:
        train_w = np.ones(int(training_desc.shape[0]), np.float32)
    centers: list[jnp.ndarray] = []
    assignments = jnp.zeros(training_desc.shape[0], dtype=jnp.int32)
    num_nodes = 1

    def bucket(n: int) -> int:
        cap = max(b, 64)
        while cap < n:
            cap *= 2
        return cap

    import os
    import time
    prof = bool(os.environ.get("SFM_TPU_VOCAB_PROFILE"))

    training_desc = jnp.asarray(training_desc)  # device-resident for gathers
    for lvl in range(depth):
        t0 = time.perf_counter()
        assign_np = np.asarray(assignments)
        # Group nodes by padded bucket size and vmap one k-means call per
        # group: the per-node calls are tiny, and on a high-latency device
        # link 8^lvl sequential dispatches dominate the build.
        valid_rows = np.where(train_w > 0)[0]
        node_rows = []
        for n in range(num_nodes):
            rows = np.where((assign_np == n) & (train_w > 0))[0]
            if len(rows) < b:
                # Sparse node: pad the training set with other VALID rows only
                # — zero-weight padding descriptors must never enter k-means.
                rows = valid_rows[: max(b, len(rows))]
            if len(rows) > _MAX_NODE_TRAIN:
                # Fitting b centers needs nowhere near the full subset; an
                # evenly-strided subsample bounds the per-node k-means (the
                # unsubsampled ROOT call ran top_k over the whole corpus
                # every iteration — 85s of a 176s build at 2k images).
                rows = rows[:: (len(rows) + _MAX_NODE_TRAIN - 1) // _MAX_NODE_TRAIN]
            node_rows.append(rows)
        caps = [bucket(len(r)) for r in node_rows]
        t1 = time.perf_counter()
        lvl_centers: list = [None] * num_nodes
        for cap in sorted(set(caps)):
            group = [n for n in range(num_nodes) if caps[n] == cap]
            # Pad the GROUP axis to a power of two as well: the vmapped
            # k-means executable is keyed on (group, cap) shapes, and group
            # counts vary per level/run — unbucketed they forced a fresh
            # ~20-40s remote compile per level.
            G = 1
            while G < len(group):
                G *= 2
            idx = np.zeros((G, cap), np.int32)
            wts = np.zeros((G, cap), np.float32)
            for gi, n in enumerate(group):
                rows = node_rows[n]
                idx[gi, : len(rows)] = rows
                wts[gi, : len(rows)] = 1.0
            if G > len(group):
                # Dummy nodes train on a copy of the first node's data (valid
                # inputs, outputs discarded).
                idx[len(group):] = idx[0]
                wts[len(group):] = wts[0]
            key, k2 = jax.random.split(key)
            keys = jax.random.split(k2, G)
            outs = _kmeans_batch(
                keys, training_desc, jnp.asarray(idx), jnp.asarray(wts),
                b, cfg.kmeans_iters,
            )
            for gi, n in enumerate(group):
                lvl_centers[n] = outs[gi]
        ctrs = jnp.concatenate(lvl_centers, axis=0)       # [num_nodes * b, D]
        ctrs.block_until_ready()
        centers.append(ctrs)
        t2 = time.perf_counter()
        # Re-assign all training descriptors to the new level's nodes,
        # chunked: the [N, b, D] candidate-center gather is materialized by
        # XLA, and at 2.5M training rows (10k images) that is ~10GB — past
        # HBM. 256k-row chunks keep it ~1GB.
        N_train = int(training_desc.shape[0])
        if N_train <= _REASSIGN_CHUNK:
            assignments = _reassign_level(ctrs, training_desc, assignments, b)
        else:
            parts = []
            for s in range(0, N_train, _REASSIGN_CHUNK):
                dchunk = training_desc[s: s + _REASSIGN_CHUNK]
                achunk = assignments[s: s + _REASSIGN_CHUNK]
                pad = _REASSIGN_CHUNK - dchunk.shape[0]
                if pad:  # pad the tail so one executable serves every chunk
                    dchunk = jnp.pad(dchunk, ((0, pad), (0, 0)))
                    achunk = jnp.pad(achunk, (0, pad))
                parts.append(_reassign_level(ctrs, dchunk, achunk, b)[: _REASSIGN_CHUNK - pad])
            assignments = jnp.concatenate(parts)
        assignments.block_until_ready()
        if prof:
            print(f"[sfm_tpu]     vocab lvl {lvl}: group {t1 - t0:.2f}s, "
                  f"fit {t2 - t1:.2f}s, reassign {time.perf_counter() - t2:.2f}s "
                  f"({num_nodes} nodes)")
        num_nodes *= b
    tree = VocabTree(centers, b, depth)
    # The last reassignment pass already placed every training row at its
    # leaf — those ARE the word ids retrieval would recompute by full-tree
    # descent (NOTES r2: the training rows are a subset of the corpus, and
    # re-descending them was ~25% of the quantize+score stage).
    tree.train_words = assignments
    return tree


def bow_vectors(tree: VocabTree, desc: jnp.ndarray, valid: jnp.ndarray,
                words: jnp.ndarray | None = None) -> jnp.ndarray:
    """TF-IDF bag-of-words vectors for a batch of images.

    desc [B, N, D], valid [B, N] -> L2-normalized [B, num_words].
    words: optional precomputed [B, N] word ids (rows already quantized
    during the tree build skip the full-tree descent).
    """
    B, N, D = desc.shape
    W = tree.num_words
    if words is None:
        words = tree.quantize(desc.reshape(B * N, D)).reshape(B, N)
    # Term frequencies via segment_sum (a [B*N, W] one-hot would be GBs at
    # default vocab sizes).
    seg = (jnp.arange(B)[:, None] * W + words).reshape(-1)
    tf = jax.ops.segment_sum(valid.reshape(-1).astype(jnp.float32), seg, B * W).reshape(B, W)
    # IDF from this corpus (reference-class trees bake IDF from training).
    df = jnp.sum(tf > 0, axis=0)
    idf = jnp.log(B / jnp.maximum(df, 1.0) + 1.0)
    v = tf * idf[None, :]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_neighbors(bow: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-image top-k most-similar images by TF-IDF dot product. [B, k]."""
    sim = jnp.dot(bow.astype(jnp.bfloat16), bow.astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)            # [B, B] MXU
    sim = sim - 2.0 * jnp.eye(sim.shape[0], dtype=sim.dtype)     # kill self-match
    return jax.lax.top_k(sim, k)[1]


def spread_ranks(k: int, num_candidates: int, scales: int) -> list[int]:
    """Stratified retrieval budget: k distinct similarity ranks in
    [0, num_candidates).

    The first ceil(k/2) ranks are the plain nearest ranks (local edges carry
    most of the verified matches); the remainder are the TOPS of geometric
    rank bands out to ~(k/2)·2^scales — each far pick is the most-similar
    image in its band, so the budget buys long-range edges that actually
    overlap instead of random far pairs. Deterministic and shape-static.
    """
    n = num_candidates
    if k >= n or scales <= 0:
        return list(range(min(k, n)))
    k_near = max(1, (k + 1) // 2)
    ranks = list(range(min(k_near, n)))
    k_far = k - len(ranks)
    if k_far > 0:
        lo = float(max(len(ranks), 1))
        hi = float(min(n - 1, max(lo * (2.0 ** scales), lo + 1)))
        taken = set(ranks)
        for i in range(k_far):
            r = int(round(lo * (hi / lo) ** ((i + 1) / k_far)))
            r = min(max(r, 0), n - 1)
            while r in taken and r < n - 1:   # collisions walk outward
                r += 1
            while r in taken and r > 0:       # ...or inward at the boundary
                r -= 1
            taken.add(r)
            ranks.append(r)
    return sorted(set(ranks))[:k]


def vocab_tree_pairs(feats, cfg: VocabConfig, seed: int = 0,
                     verbose: bool = False) -> np.ndarray:
    """Candidate pair list via vocab-tree retrieval (replaces exhaustive).

    feats: pipeline FeatureSet (host numpy). Returns [E, 2] image pairs.
    """
    import time

    key = jax.random.PRNGKey(seed)
    # Ship descriptors as fp16: at 2k images x 1k keypoints the [B, N, 128]
    # f32 array is ~1GB over a ~50MB/s host->device link — transfer, not
    # compute, dominates retrieval. Descriptors are unit-norm histograms in
    # [0, ~0.5]; fp16 keeps ~3 decimal digits, far beyond what TF-IDF
    # similarity ranking needs. Compute stays f32 on device.
    desc = jnp.asarray(feats.desc.astype(np.float16)).astype(jnp.float32)
    valid = jnp.asarray(feats.valid)
    B, N, D = desc.shape

    # Training sample: a slice of descriptors from every image; invalid
    # slots become zero-weight padding (static shapes, no data-dependent
    # gathers).
    per = min(cfg.training_desc_per_image, N)
    train = desc[:, :per].reshape(B * per, D)
    train_w = np.asarray(valid[:, :per].reshape(-1)).astype(np.float32)

    t0 = time.perf_counter()
    tree = build_vocab_tree(key, train, cfg, train_w=train_w)
    t1 = time.perf_counter()
    k = min(cfg.num_neighbors, B - 1)
    # Word ids: the training slice desc[:, :per] was quantized by the build
    # itself (tree.train_words); only the remaining columns descend the tree.
    words = jnp.zeros((B, N), jnp.int32)
    words = words.at[:, :per].set(tree.train_words.reshape(B, per))
    if per < N:
        rest = tree.quantize(desc[:, per:].reshape(B * (N - per), D))
        words = words.at[:, per:].set(rest.reshape(B, N - per))
    bow = bow_vectors(tree, desc, valid, words=words)    # [B, W]
    # Score + top-k ON DEVICE: the [B, B] similarity matrix is 400MB at 10k
    # images — shipping it to host for argpartition is pure link traffic;
    # only the [B, k] neighbor ids come back. Retrieval is STRATIFIED
    # (spread_ranks): the device returns the top-M ranking and the budget
    # selects band tops so large sequential corpora get long-range candidate
    # edges natively, not just the ±k nearest ring neighbors.
    ranks = spread_ranks(k, B - 1, cfg.retrieval_spread_scales)
    m = (ranks[-1] + 1) if ranks else k
    nbrs = np.asarray(_topk_neighbors(bow, m))[:, ranks]
    t2 = time.perf_counter()
    if verbose:
        print(f"[sfm_tpu]   vocab: build {t1 - t0:.2f}s, "
              f"quantize+score {t2 - t1:.2f}s (B={B}, {tree.num_words} words)")

    ii = np.repeat(np.arange(B), k)
    jj = nbrs.reshape(-1)
    keep = ii != jj
    a = np.minimum(ii, jj)[keep]
    b_ = np.maximum(ii, jj)[keep]
    pairs = np.unique(np.stack([a, b_], axis=1), axis=0)
    return pairs.astype(np.int32)
