"""Minimal solvers vs synthetic ground truth (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.geometry.projection import relative_pose
from sfm_tpu.ops import solvers
from sfm_tpu.utils.synthetic import make_orbit_scene


def two_view_fixture(noise=0.0, seed=0):
    scene = make_orbit_scene(num_cameras=2, num_points=100, noise_px=noise, seed=seed, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    uv1 = jnp.asarray(scene.pixels[0][vis])
    uv2 = jnp.asarray(scene.pixels[1][vis])
    intr = jnp.asarray(scene.intrinsics[0])
    x1 = pixel_to_camera(uv1, intr)
    x2 = pixel_to_camera(uv2, intr)
    rv_rel, t_rel = relative_pose(
        jnp.asarray(scene.rvecs[0]), jnp.asarray(scene.tvecs[0]),
        jnp.asarray(scene.rvecs[1]), jnp.asarray(scene.tvecs[1]),
    )
    return scene, uv1, uv2, x1, x2, intr, rv_rel, t_rel


def gt_essential(rv_rel, t_rel):
    R = so3_exp(rv_rel)
    t = t_rel / jnp.linalg.norm(t_rel)
    tx = jnp.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], dtype=jnp.float32)
    return tx @ R


def normalize_E(E):
    E = np.asarray(E)
    E = E / np.linalg.norm(E)
    return E * np.sign(E.flat[np.argmax(np.abs(E.flat))])


def test_essential_8pt_exact():
    _, _, _, x1, x2, _, rv_rel, t_rel = two_view_fixture()
    E = solvers.essential_8pt(x1, x2)
    E_gt = gt_essential(rv_rel, t_rel)
    np.testing.assert_allclose(normalize_E(E), normalize_E(E_gt), atol=2e-3)
    # Epipolar constraint on all points.
    err = solvers.sampson_error(E, x1, x2)
    assert float(jnp.max(err)) < 1e-8


def test_fundamental_8pt_exact():
    _, uv1, uv2, _, _, _, _, _ = two_view_fixture()
    F = solvers.fundamental_8pt(uv1, uv2)
    err = solvers.sampson_error(F, uv1, uv2)
    assert float(jnp.median(jnp.sqrt(err))) < 0.05  # pixels


def test_decompose_essential_recovers_pose():
    _, _, _, x1, x2, _, rv_rel, t_rel = two_view_fixture()
    E = solvers.essential_8pt(x1, x2)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    R, t, votes = solvers.decompose_essential(E, x1, x2, mask)
    R_gt = so3_exp(rv_rel)
    t_gt = t_rel / jnp.linalg.norm(t_rel)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-3)
    assert int(votes) == x1.shape[0]


def test_triangulate_linear_recovers_points():
    scene, _, _, x1, x2, _, _, _ = two_view_fixture()
    R1 = so3_exp(jnp.asarray(scene.rvecs[0]))
    R2 = so3_exp(jnp.asarray(scene.rvecs[1]))
    X = solvers.triangulate_linear(
        R1, jnp.asarray(scene.tvecs[0]), R2, jnp.asarray(scene.tvecs[1]), x1, x2
    )
    vis = scene.visible[0] & scene.visible[1]
    np.testing.assert_allclose(np.asarray(X), scene.points[vis], atol=1e-2)


def test_homography_4pt_on_plane():
    # Points on a plane => homography maps exactly.
    rng = np.random.default_rng(0)
    H_gt = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
    x1 = rng.uniform(0, 500, size=(50, 2))
    x1h = np.concatenate([x1, np.ones((50, 1))], axis=1)
    p = x1h @ H_gt.T
    x2 = p[:, :2] / p[:, 2:3]
    H = solvers.homography_4pt(jnp.asarray(x1, dtype=jnp.float32), jnp.asarray(x2, dtype=jnp.float32))
    err = solvers.homography_error(H, jnp.asarray(x1, dtype=jnp.float32), jnp.asarray(x2, dtype=jnp.float32))
    assert float(jnp.max(err)) < 1e-2


def test_refine_essential_improves_noisy():
    _, _, _, x1, x2, intr, rv_rel, t_rel = two_view_fixture(noise=1.0, seed=3)
    E0 = solvers.essential_8pt(x1, x2)
    w = jnp.ones(x1.shape[0])
    E1 = solvers.refine_essential_gn(E0, x1, x2, w, iters=5)
    e0 = float(jnp.mean(solvers.sampson_error(E0, x1, x2)))
    e1 = float(jnp.mean(solvers.sampson_error(E1, x1, x2)))
    assert e1 <= e0 * 1.01
