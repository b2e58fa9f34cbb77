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


def _kmeans(key, data: jnp.ndarray, k: int, iters: int) -> jnp.ndarray:
    """Spherical k-means on unit-norm descriptors. data [N, D] -> centers [k, D].

    Assignment = argmax data @ centers^T (MXU); update = masked mean.
    Empty clusters are re-seeded from the least-well-represented points.
    """
    N, D = data.shape
    idx = jax.random.choice(key, N, (k,), replace=False)
    centers = data[idx]

    def step(centers, _):
        sim = data @ centers.T                          # [N, k] MXU
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)  # [N, k]
        sums = onehot.T @ data                          # [k, D] MXU
        counts = jnp.sum(onehot, axis=0)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # Re-seed empties with the points farthest from their center.
        far = data[jnp.argsort(jnp.max(sim, axis=1))[:k]]
        new = jnp.where(counts[:, None] > 0, new, far)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-8)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


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

    def quantize(self, desc: jnp.ndarray) -> jnp.ndarray:
        """desc [N, D] -> leaf/word id [N]. One batched matmul per level."""
        node = jnp.zeros(desc.shape[0], dtype=jnp.int32)
        b = self.branching
        for lvl in range(self.depth):
            ctrs = self.centers[lvl]                      # [b^lvl * b, D]
            # Children of `node` are rows node*b:(node+1)*b. Compute dot with
            # ALL centers at this level, then select the child window:
            # gather the b candidate similarities per descriptor.
            cand = node[:, None] * b + jnp.arange(b)[None, :]      # [N, b]
            sim = jnp.einsum("nd,nbd->nb", desc, ctrs[cand])       # batched
            node = cand[jnp.arange(desc.shape[0]), jnp.argmax(sim, axis=1)]
        return node


def build_vocab_tree(key, training_desc: jnp.ndarray, cfg: VocabConfig) -> VocabTree:
    """Hierarchical spherical k-means over training descriptors."""
    b, depth = cfg.branching, cfg.depth
    centers: list[jnp.ndarray] = []
    # Level 0: one k-means over everything.
    assignments = jnp.zeros(training_desc.shape[0], dtype=jnp.int32)
    num_nodes = 1
    for lvl in range(depth):
        lvl_centers = []
        for n in range(num_nodes):
            sel = assignments == n
            # Static-shape trick: weight-mask the data instead of gathering.
            # For build-time simplicity we gather on host (tree build is a
            # one-off, host-side cost like the reference's).
            rows = np.where(np.asarray(sel))[0]
            sub = training_desc[jnp.asarray(rows)] if len(rows) >= b else training_desc
            key, k2 = jax.random.split(key)
            lvl_centers.append(_kmeans(k2, sub, b, cfg.kmeans_iters))
        ctrs = jnp.concatenate(lvl_centers, axis=0)       # [num_nodes * b, D]
        centers.append(ctrs)
        # Re-assign all training descriptors to the new level's nodes.
        tree_so_far = VocabTree(centers, b, lvl + 1)
        assignments = tree_so_far.quantize(training_desc)
        num_nodes *= b
    return VocabTree(centers, b, depth)


def bow_vectors(tree: VocabTree, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """TF-IDF bag-of-words vectors for a batch of images.

    desc [B, N, D], valid [B, N] -> L2-normalized [B, num_words].
    """
    B, N, D = desc.shape
    words = tree.quantize(desc.reshape(B * N, D)).reshape(B, N)
    onehot = jax.nn.one_hot(words, tree.num_words, dtype=jnp.float32)
    tf = jnp.einsum("bnw,bn->bw", onehot, valid.astype(jnp.float32))   # [B, W]
    # IDF from this corpus (reference-class trees bake IDF from training).
    df = jnp.sum(tf > 0, axis=0)
    idf = jnp.log(B / jnp.maximum(df, 1.0) + 1.0)
    v = tf * idf[None, :]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)


def vocab_tree_pairs(feats, cfg: VocabConfig, seed: int = 0) -> np.ndarray:
    """Candidate pair list via vocab-tree retrieval (replaces exhaustive).

    feats: pipeline FeatureSet (host numpy). Returns [E, 2] image pairs.
    """
    key = jax.random.PRNGKey(seed)
    desc = jnp.asarray(feats.desc)
    valid = jnp.asarray(feats.valid)
    B, N, D = desc.shape

    # Training sample: a slice of descriptors from every image.
    per = min(cfg.training_desc_per_image, N)
    train = desc[:, :per].reshape(B * per, D)
    train_valid = np.asarray(valid[:, :per].reshape(-1))
    train = train[jnp.asarray(np.where(train_valid)[0])]

    tree = build_vocab_tree(key, train, cfg)
    bow = bow_vectors(tree, desc, valid)                 # [B, W]
    sim = np.array(bow @ bow.T)                          # [B, B] MXU (copy: mutated below)
    np.fill_diagonal(sim, -1.0)

    k = min(cfg.num_neighbors, B - 1)
    pairs = set()
    for i in range(B):
        for j in np.argsort(-sim[i])[:k]:
            a, b_ = (i, int(j)) if i < j else (int(j), i)
            if a != b_:
                pairs.add((a, b_))
    return np.asarray(sorted(pairs), dtype=np.int32)
