"""Batched RANSAC finds planted inlier sets (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import RansacConfig
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.ops import solvers
from sfm_tpu.ops.ransac import ransac, sample_minimal_sets
from sfm_tpu.ops.verify import verify_block
from sfm_tpu.geometry.projection import relative_pose
from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.utils.synthetic import make_orbit_scene, add_outliers


def test_sample_minimal_sets_valid_and_distinct():
    key = jax.random.PRNGKey(0)
    mask = jnp.arange(100) < 60
    idx = sample_minimal_sets(key, mask, 64, 8)
    idx = np.asarray(idx)
    assert idx.max() < 60
    for row in idx:
        assert len(set(row.tolist())) == 8


def test_ransac_essential_with_outliers():
    scene = make_orbit_scene(num_cameras=2, num_points=200, noise_px=0.3, seed=1, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    pix, outliers = add_outliers(scene.pixels, scene.visible, fraction=0.3, image_size=scene.image_size)
    uv1 = jnp.asarray(pix[0][vis])
    uv2 = jnp.asarray(pix[1][vis])
    intr = jnp.asarray(scene.intrinsics[0])
    x1 = pixel_to_camera(uv1, intr)
    x2 = pixel_to_camera(uv2, intr)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    thr = (4.0 / 600.0) ** 2

    res = ransac(
        jax.random.PRNGKey(7), x1, x2, mask,
        solver=lambda a, b: solvers.essential_minimal(a, b),
        error_fn=solvers.sampson_error,
        sample_size=8, num_hypotheses=1024, threshold_sq=thr, min_inliers=15,
    )
    # LO refit on the consensus set, as the verify stage does (SURVEY.md §2.4).
    from sfm_tpu.ops.ransac import irls_refit
    _, inliers = irls_refit(
        res.model, x1, x2, mask,
        fit_fn=lambda a, b, w: solvers.essential_minimal(a, b, w),
        error_fn=solvers.sampson_error, threshold_sq=thr, iters=5,
    )
    planted_out = (outliers[0] | outliers[1])[vis]
    inl = np.asarray(inliers)
    # Nearly all planted outliers rejected (a few % of random outliers land
    # within the epipolar band by chance), most true inliers kept.
    assert inl[planted_out].mean() < 0.08
    assert inl[~planted_out].mean() > 0.9
    assert bool(res.ok)


def test_verify_block_recovers_relative_pose():
    scene = make_orbit_scene(num_cameras=2, num_points=200, noise_px=0.3, seed=2, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    pix, _ = add_outliers(scene.pixels, scene.visible, fraction=0.2, image_size=scene.image_size)
    M = 256
    n = int(vis.sum())
    uv1 = np.zeros((1, M, 2), np.float32); uv1[0, :n] = pix[0][vis]
    uv2 = np.zeros((1, M, 2), np.float32); uv2[0, :n] = pix[1][vis]
    mask = np.zeros((1, M), bool); mask[0, :n] = True

    cfg = RansacConfig(num_hypotheses=512)
    geom = verify_block(
        jax.random.split(jax.random.PRNGKey(0), 1),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
        jnp.asarray(scene.intrinsics[:1]), jnp.asarray(scene.intrinsics[1:2]),
        cfg,
    )
    assert bool(geom.ok[0])
    rv_gt, t_gt = relative_pose(
        jnp.asarray(scene.rvecs[0]), jnp.asarray(scene.tvecs[0]),
        jnp.asarray(scene.rvecs[1]), jnp.asarray(scene.tvecs[1]),
    )
    R_est = so3_exp(geom.rvec[0])
    R_gt = so3_exp(rv_gt)
    rot_err = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R_est.T @ R_gt)) - 1) / 2, -1, 1)))
    t_est = np.asarray(geom.tvec[0])
    t_gtn = np.asarray(t_gt / jnp.linalg.norm(t_gt))
    t_err = np.degrees(np.arccos(np.clip(np.abs(t_est @ t_gtn), -1, 1)))
    assert rot_err < 1.0, rot_err
    assert t_err < 2.0, t_err


def test_ransac_determinism():
    scene = make_orbit_scene(num_cameras=2, num_points=100, noise_px=0.5, seed=4, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    intr = jnp.asarray(scene.intrinsics[0])
    x1 = pixel_to_camera(jnp.asarray(scene.pixels[0][vis]), intr)
    x2 = pixel_to_camera(jnp.asarray(scene.pixels[1][vis]), intr)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    args = dict(solver=solvers.essential_8pt, error_fn=solvers.sampson_error,
                sample_size=8, num_hypotheses=256, threshold_sq=(4 / 600) ** 2, min_inliers=15)
    r1 = ransac(jax.random.PRNGKey(3), x1, x2, mask, **args)
    r2 = ransac(jax.random.PRNGKey(3), x1, x2, mask, **args)
    np.testing.assert_array_equal(np.asarray(r1.inliers), np.asarray(r2.inliers))
    np.testing.assert_allclose(np.asarray(r1.model), np.asarray(r2.model))
