"""Sharded paths vs single-device reference (SURVEY.md §4.6): every
shard_map path is tested on the forced-8-device CPU mesh and must agree
with the unsharded implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.config import MatchConfig, BAConfig
from sfm_tpu.dist.mesh import make_mesh
from sfm_tpu.dist.ring_match import ring_match_all, ring_match_reference
from sfm_tpu.dist.sharded_ba import bundle_adjust_sharded, shard_problem_by_camera
from sfm_tpu.ba import build_problem, bundle_adjust
from sfm_tpu.utils.synthetic import make_orbit_scene


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def synth_descriptors(B=8, N=128, D=128, seed=0):
    """Unit-norm descriptors with planted cross-image correspondences."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(N, D)).astype(np.float32)
    descs = []
    for i in range(B):
        d = base + 0.1 * rng.normal(size=(N, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        descs.append(d)
    desc = np.stack(descs)
    valid = np.ones((B, N), bool)
    valid[:, N - 16:] = False  # exercise the mask path
    return jnp.asarray(desc), jnp.asarray(valid)


def test_ring_match_equals_reference(mesh8):
    desc, valid = synth_descriptors()
    cfg = MatchConfig(max_matches=64)
    ii_s, jj_s, ok_s = jax.jit(
        lambda d, v: ring_match_all(d, v, cfg, mesh8)
    )(desc, valid)
    ii_r, jj_r, ok_r = ring_match_reference(desc, valid, cfg)
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_r))
    ok = np.asarray(ok_r)
    np.testing.assert_array_equal(np.asarray(ii_s)[ok], np.asarray(ii_r)[ok])
    np.testing.assert_array_equal(np.asarray(jj_s)[ok], np.asarray(jj_r)[ok])


def test_sharded_ba_matches_single_device(mesh8):
    from tests.unit.test_ba import scene_to_reconstruction

    scene = make_orbit_scene(num_cameras=8, num_points=64, noise_px=0.3, seed=7)
    rec = scene_to_reconstruction(scene, pose_noise=0.01, point_noise=0.03, seed=8)
    prob, _, _ = build_problem(rec)
    cfg = BAConfig(max_iterations=10, robust_loss="none")

    out_single, stats_single = bundle_adjust(prob, cfg)

    prob_sharded = shard_problem_by_camera(prob, 8)
    out_sharded, stats_sharded = bundle_adjust_sharded(prob_sharded, cfg, mesh8)

    # Same optimization trajectory: final costs agree tightly, parameters
    # agree to fp32 reduction-order tolerance.
    np.testing.assert_allclose(
        float(stats_sharded.final_cost), float(stats_single.final_cost), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.cam_params), np.asarray(out_single.cam_params), atol=5e-3
    )


def test_sharded_ba_determinism(mesh8):
    from tests.unit.test_ba import scene_to_reconstruction

    scene = make_orbit_scene(num_cameras=8, num_points=64, noise_px=0.3, seed=9)
    rec = scene_to_reconstruction(scene, pose_noise=0.01, point_noise=0.03, seed=10)
    prob, _, _ = build_problem(rec)
    prob = shard_problem_by_camera(prob, 8)
    cfg = BAConfig(max_iterations=8, robust_loss="none")
    out1, _ = bundle_adjust_sharded(prob, cfg, mesh8)
    out2, _ = bundle_adjust_sharded(prob, cfg, mesh8)
    np.testing.assert_array_equal(np.asarray(out1.cam_params), np.asarray(out2.cam_params))
    np.testing.assert_array_equal(np.asarray(out1.points), np.asarray(out2.points))
