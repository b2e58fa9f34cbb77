"""Camera models and projection (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.geometry.cameras import make_intrinsics, distort, undistort, camera_to_pixel, pixel_to_camera
from sfm_tpu.geometry.projection import (
    project, world_to_camera, camera_to_world, compose_poses, invert_pose, camera_center,
    reprojection_residual,
)
from sfm_tpu.utils.synthetic import make_orbit_scene


def test_distort_undistort_roundtrip():
    intr = make_intrinsics(500.0, 500.0, 320.0, 240.0, k1=-0.2, k2=0.05)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 2)), dtype=jnp.float32)
    xy2 = undistort(distort(xy, intr), intr)
    np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-5)


def test_pixel_camera_roundtrip():
    intr = make_intrinsics(600.0, 580.0, 320.0, 240.0, k1=-0.1)
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(
        np.concatenate([rng.uniform(-1, 1, (128, 2)), rng.uniform(2, 6, (128, 1))], axis=1),
        dtype=jnp.float32,
    )
    uv = camera_to_pixel(xyz, intr)
    xy = pixel_to_camera(uv, intr)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(xyz[:, :2] / xyz[:, 2:3]), atol=1e-4)


def test_world_camera_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    rvec = jnp.asarray([0.3, -0.2, 0.5])
    t = jnp.asarray([1.0, -2.0, 3.0])
    x2 = camera_to_world(world_to_camera(x, rvec, t), rvec, t)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_pose_compose_invert():
    rva, ta = jnp.asarray([0.1, 0.2, -0.3]), jnp.asarray([1.0, 0.0, -1.0])
    rvb, tb = jnp.asarray([-0.4, 0.1, 0.2]), jnp.asarray([0.5, 2.0, 0.0])
    rvc, tc = compose_poses(rva, ta, rvb, tb)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(world_to_camera(x, rvc, tc)),
        np.asarray(world_to_camera(world_to_camera(x, rvb, tb), rva, ta)),
        atol=1e-5,
    )
    rvi, ti = invert_pose(rva, ta)
    np.testing.assert_allclose(
        np.asarray(world_to_camera(world_to_camera(x, rva, ta), rvi, ti)), np.asarray(x), atol=1e-5
    )


def test_camera_center():
    rv, t = jnp.asarray([0.2, -0.1, 0.4]), jnp.asarray([1.0, 2.0, 3.0])
    C = camera_center(rv, t)
    np.testing.assert_allclose(np.asarray(world_to_camera(C, rv, t)), np.zeros(3), atol=1e-6)


def test_synthetic_scene_residuals_zero():
    scene = make_orbit_scene(num_cameras=4, num_points=50, noise_px=0.0)
    for i in range(scene.num_cameras):
        res = reprojection_residual(
            jnp.asarray(scene.points), jnp.asarray(scene.rvecs[i]), jnp.asarray(scene.tvecs[i]),
            jnp.asarray(scene.intrinsics[i]), jnp.asarray(scene.pixels[i]),
        )
        vis = scene.visible[i]
        assert np.abs(np.asarray(res)[vis]).max() < 1e-2  # fp32 render round-trip


def test_projection_jit_grad_finite():
    f = jax.jit(jax.grad(lambda p, rv, t, intr, uv: jnp.sum(reprojection_residual(p, rv, t, intr, uv) ** 2)))
    g = f(jnp.asarray([0.1, 0.2, 3.0]), jnp.asarray([0.0, 0.0, 0.0]), jnp.zeros(3),
          make_intrinsics(500.0, 500.0, 320.0, 240.0), jnp.asarray([300.0, 250.0]))
    assert np.all(np.isfinite(np.asarray(g)))
