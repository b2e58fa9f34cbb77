"""Pallas kernels vs jnp references (SURVEY.md §4: each kernel gated by
equality tests). On CPU the kernels run in interpret mode; bench.py
exercises the compiled TPU path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.config import MatchConfig
from sfm_tpu.ops.match import match_pair, descriptor_distances
from sfm_tpu.kernels.match_topk import match_topk2, match_pair_pallas

INTERP = jax.default_backend() != "tpu"


def synth_desc(n, seed, n_valid=None):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    v = np.zeros(n, bool)
    v[: (n_valid if n_valid is not None else n)] = True
    d[~v] = 0.0
    return jnp.asarray(d), jnp.asarray(v)


def test_match_topk2_matches_dense():
    # Planted permutation with clear separation: row i of da is a noisy copy
    # of row perm[i] of db, so the true NN is unambiguous (random pairs have
    # near-tied distances ~2.0 where bf16 argmin order is ill-defined).
    rng = np.random.default_rng(0)
    db, vb = synth_desc(512, 1, 512)
    perm = rng.permutation(512)
    da = np.asarray(db)[perm] + 0.05 * rng.normal(size=(512, 128)).astype(np.float32)
    da /= np.linalg.norm(da, axis=-1, keepdims=True)
    da = jnp.asarray(da)
    vb = jnp.asarray(np.arange(512) < 480)

    d1, d2, idx = match_topk2(da, db, vb, interpret=INTERP)

    dist = np.array(descriptor_distances(da, db, use_bf16=True))
    dist[:, ~np.asarray(vb)] = 1e9
    ref_idx = dist.argmin(1)
    ref_d1 = dist.min(1)
    dist2 = dist.copy()
    dist2[np.arange(512), ref_idx] = 1e9
    ref_d2 = dist2.min(1)

    clear = np.asarray(vb)[perm]  # rows whose planted NN is a valid column
    np.testing.assert_array_equal(np.asarray(idx)[clear], ref_idx[clear])
    np.testing.assert_array_equal(ref_idx[clear], perm[clear])
    np.testing.assert_allclose(np.asarray(d1), ref_d1, atol=1e-2)  # bf16 gram
    np.testing.assert_allclose(np.asarray(d2), ref_d2, atol=1e-2)


def test_match_pair_pallas_equals_jnp():
    cfg = MatchConfig(max_matches=128)
    da, va = synth_desc(512, 2, 480)
    db, vb = synth_desc(512, 3, 460)
    # Plant some true correspondences so matches exist.
    da = da.at[:100].set(db[:100] + 0.02 * jnp.asarray(np.random.default_rng(4).normal(size=(100, 128)), dtype=jnp.float32))
    da = da / jnp.maximum(jnp.linalg.norm(da, axis=-1, keepdims=True), 1e-8)

    ia_k, ib_k, ok_k = match_pair_pallas(da, va, db, vb, cfg, interpret=INTERP)
    ia_j, ib_j, ok_j = match_pair(da, va, db, vb, cfg)

    # Same match SET; ordering may differ (compaction sorts by d1, and the
    # kernel's bf16-norm d1 differs from the jnp path's f32-norm d1 by ulps).
    assert int(np.asarray(ok_k).sum()) == int(np.asarray(ok_j).sum())
    set_k = set(zip(np.asarray(ia_k)[np.asarray(ok_k)].tolist(), np.asarray(ib_k)[np.asarray(ok_k)].tolist()))
    set_j = set(zip(np.asarray(ia_j)[np.asarray(ok_j)].tolist(), np.asarray(ib_j)[np.asarray(ok_j)].tolist()))
    assert set_k == set_j
