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
    cfg = VocabConfig(branching=4, depth=3, num_neighbors=3, kmeans_iters=5, training_desc_per_image=64)
    pairs = vocab_tree_pairs(feats, cfg, seed=0)
    assert len(pairs) > 0
    # Most retrieved pairs connect images of the same appearance cluster.
    same = np.mean([labels[i] == labels[j] for i, j in pairs])
    assert same > 0.8, same
    # And it prunes: fewer pairs than exhaustive.
    assert len(pairs) < B * (B - 1) // 2
