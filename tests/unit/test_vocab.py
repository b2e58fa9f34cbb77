"""Vocabulary tree retrieval (SURVEY.md §2.3, config ladder #3)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import VocabConfig
from sfm_tpu.ops.vocab import build_vocab_tree, bow_vectors, vocab_tree_pairs
from sfm_tpu.pipeline.stages import FeatureSet


def clustered_descriptors(num_images=12, n_per=64, num_clusters=3, seed=0):
    """Images fall in appearance clusters; same-cluster images share words."""
    rng = np.random.default_rng(seed)
    cluster_words = rng.normal(size=(num_clusters, 32, 128)).astype(np.float32)
    cluster_words /= np.linalg.norm(cluster_words, axis=-1, keepdims=True)
    desc = np.zeros((num_images, n_per, 128), np.float32)
    labels = []
    for i in range(num_images):
        c = i % num_clusters
        labels.append(c)
        picks = rng.integers(0, 32, n_per)
        # Per-dim noise 0.03 => noise vector norm ~0.34 vs unit signal; with
        # 0.15 the noise norm (~1.7) would swamp the word identity entirely.
        d = cluster_words[c, picks] + 0.03 * rng.normal(size=(n_per, 128)).astype(np.float32)
        desc[i] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return desc, np.asarray(labels)


def test_quantize_is_consistent():
    desc, _ = clustered_descriptors()
    cfg = VocabConfig(branching=4, depth=2, kmeans_iters=5)
    flat = jnp.asarray(desc.reshape(-1, 128))
    tree = build_vocab_tree(jax.random.PRNGKey(0), flat, cfg)
    words = tree.quantize(flat)
    assert int(words.max()) < tree.num_words
    # Same descriptor quantizes to the same word (deterministic).
    words2 = tree.quantize(flat)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(words2))


def test_retrieval_finds_same_cluster_images():
    desc, labels = clustered_descriptors()
    B, N, _ = desc.shape
    feats = FeatureSet(
        xy=np.zeros((B, N, 2), np.float32), sigma=np.ones((B, N), np.float32),
        angle=np.zeros((B, N), np.float32), response=np.ones((B, N), np.float32),
        desc=desc, valid=np.ones((B, N), bool),
    )
    # retrieval_spread_scales=0: pure nearest-rank retrieval, so every
    # pick should land in the same appearance cluster.
    cfg = VocabConfig(branching=4, depth=3, num_neighbors=3, kmeans_iters=5,
                      training_desc_per_image=64, retrieval_spread_scales=0)
    pairs = vocab_tree_pairs(feats, cfg, seed=0)
    assert len(pairs) > 0
    # Most retrieved pairs connect images of the same appearance cluster.
    same = np.mean([labels[i] == labels[j] for i, j in pairs])
    assert same > 0.8, same
    # And it prunes: fewer pairs than exhaustive.
    assert len(pairs) < B * (B - 1) // 2


def test_stratified_retrieval_keeps_near_precision_and_adds_reach():
    desc, labels = clustered_descriptors()
    B, N, _ = desc.shape
    feats = FeatureSet(
        xy=np.zeros((B, N, 2), np.float32), sigma=np.ones((B, N), np.float32),
        angle=np.zeros((B, N), np.float32), response=np.ones((B, N), np.float32),
        desc=desc, valid=np.ones((B, N), bool),
    )
    cfg = VocabConfig(branching=4, depth=3, num_neighbors=4, kmeans_iters=5,
                      training_desc_per_image=64)  # default spread ON
    pairs = vocab_tree_pairs(feats, cfg, seed=0)
    # The near half of the budget still finds the appearance cluster. With
    # B=12 / k=4 the far bands are 2 of 4 picks and (tiny corpus) almost
    # always cross-cluster, so ~0.4-0.5 is the design point — what must NOT
    # happen is the near picks losing the cluster (same ≈ 1/3 = chance).
    same = np.mean([labels[i] == labels[j] for i, j in pairs])
    assert same > 0.35, same
    # And the far bands add cross-cluster (long-range) candidates that pure
    # top-k retrieval would never propose.
    cfg0 = VocabConfig(branching=4, depth=3, num_neighbors=4, kmeans_iters=5,
                       training_desc_per_image=64, retrieval_spread_scales=0)
    pairs0 = vocab_tree_pairs(feats, cfg0, seed=0)
    cross = np.sum([labels[i] != labels[j] for i, j in pairs])
    cross0 = np.sum([labels[i] != labels[j] for i, j in pairs0])
    assert cross > cross0


def test_spread_ranks_properties():
    from sfm_tpu.ops.vocab import spread_ranks

    # k distinct in-range ranks, near half dense, far half reaching deep.
    r = spread_ranks(12, 9999, scales=8)
    assert len(r) == 12 and len(set(r)) == 12
    assert all(0 <= x < 9999 for x in r)
    assert r[:6] == [0, 1, 2, 3, 4, 5]          # near half dense
    assert max(r) >= 512                        # far half reaches deep
    # Degenerate corpora: never more ranks than candidates.
    assert spread_ranks(8, 5, scales=8) == [0, 1, 2, 3, 4]
    # scales=0 is pure top-k.
    assert spread_ranks(6, 100, scales=0) == [0, 1, 2, 3, 4, 5]
    # Collisions at a tiny candidate pool still produce distinct ranks.
    r = spread_ranks(7, 8, scales=8)
    assert len(r) == 7 and len(set(r)) == 7
