"""PnP and multi-view triangulation vs synthetic ground truth (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.ops.pnp import epnp, pnp_ransac, pnp_reprojection_error
from sfm_tpu.ops.triangulate import triangulate_tracks
from sfm_tpu.utils.synthetic import make_orbit_scene, add_outliers


def pnp_fixture(noise=0.0, seed=0):
    scene = make_orbit_scene(num_cameras=1, num_points=100, noise_px=noise, seed=seed)
    vis = scene.visible[0]
    X = jnp.asarray(scene.points[vis])
    intr = jnp.asarray(scene.intrinsics[0])
    uv = pixel_to_camera(jnp.asarray(scene.pixels[0][vis]), intr)
    return scene, X, uv


def pose_errors(pose, scene):
    R_est = np.asarray(so3_exp(pose[:3]))
    R_gt = np.asarray(so3_exp(jnp.asarray(scene.rvecs[0])))
    rot = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)))
    t = np.linalg.norm(np.asarray(pose[3:]) - scene.tvecs[0])
    return rot, t


def test_epnp_exact():
    scene, X, uv = pnp_fixture()
    pose = epnp(X, uv)
    rot, t = pose_errors(pose, scene)
    assert rot < 0.05, rot
    assert t < 5e-3, t


def test_epnp_noisy():
    scene, X, uv = pnp_fixture(noise=1.0, seed=2)
    pose = epnp(X, uv)
    rot, t = pose_errors(pose, scene)
    assert rot < 0.5, rot
    assert t < 0.05, t


def test_pnp_ransac_with_outliers():
    scene = make_orbit_scene(num_cameras=1, num_points=200, noise_px=0.5, seed=3)
    pix, out = add_outliers(scene.pixels, scene.visible, fraction=0.35, image_size=scene.image_size, seed=4)
    vis = scene.visible[0]
    X = jnp.asarray(scene.points[vis])
    intr = jnp.asarray(scene.intrinsics[0])
    uv = pixel_to_camera(jnp.asarray(pix[0][vis]), intr)
    mask = jnp.ones(X.shape[0], dtype=bool)
    thr = (4.0 / 600.0) ** 2
    pose, inl, n, ok = pnp_ransac(jax.random.PRNGKey(0), X, uv, mask, 512, thr, 12)
    assert bool(ok)
    rot, t = pose_errors(pose, scene)
    assert rot < 0.5, rot
    assert t < 0.05, t
    planted = out[0][vis]
    inl = np.asarray(inl)
    assert inl[planted].mean() < 0.05
    assert inl[~planted].mean() > 0.9


def test_triangulate_tracks_multiview():
    scene = make_orbit_scene(num_cameras=5, num_points=40, noise_px=0.3, seed=5)
    T, V = scene.num_points, scene.num_cameras
    rvecs = np.tile(scene.rvecs[None], (T, 1, 1))
    tvecs = np.tile(scene.tvecs[None], (T, 1, 1))
    intr = jnp.asarray(scene.intrinsics[0])
    xy = np.asarray(pixel_to_camera(jnp.asarray(scene.pixels.transpose(1, 0, 2)), intr))
    mask = scene.visible.T  # [T, V]
    res = triangulate_tracks(
        jnp.asarray(rvecs), jnp.asarray(tvecs), jnp.asarray(xy), jnp.asarray(mask),
        min_angle_deg=1.0, max_error_norm=5.0 / 600.0,
    )
    valid = np.asarray(res.valid)
    assert valid.mean() > 0.9
    err = np.linalg.norm(np.asarray(res.points)[valid] - scene.points[valid], axis=-1)
    assert err.max() < 0.02, err.max()


def test_triangulate_rejects_low_parallax():
    # Two nearly-identical cameras -> angle filter must reject.
    scene = make_orbit_scene(num_cameras=2, num_points=20, seed=6, arc_fraction=0.0005)
    T = scene.num_points
    rvecs = np.tile(scene.rvecs[None], (T, 1, 1))
    tvecs = np.tile(scene.tvecs[None], (T, 1, 1))
    intr = jnp.asarray(scene.intrinsics[0])
    xy = np.asarray(pixel_to_camera(jnp.asarray(scene.pixels.transpose(1, 0, 2)), intr))
    res = triangulate_tracks(
        jnp.asarray(rvecs), jnp.asarray(tvecs), jnp.asarray(xy),
        jnp.asarray(scene.visible.T), min_angle_deg=1.5, max_error_norm=0.01,
    )
    assert not np.asarray(res.valid).any()
