"""OpenCV cross-validation (SURVEY.md §4.3): cv2 is the behavioral oracle in
lieu of the unreadable reference binary.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.sift import extract_features
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.ops import solvers
from sfm_tpu.utils.synthetic import render_blob_scene, make_orbit_scene


@pytest.fixture(scope="module")
def blob_images():
    imgs, scene = render_blob_scene(image_size=(256, 256), num_images=2, arc_fraction=0.04)
    return imgs, scene


def test_keypoint_repeatability_vs_cv2(blob_images):
    """Most of our keypoints should be near a cv2.SIFT keypoint (both
    detectors should fire on the same blobs)."""
    imgs, _ = blob_images
    cfg = SiftConfig(max_keypoints=512, max_candidates=2048, num_octaves=3, image_max_dim=256)
    f = extract_features(jnp.asarray(imgs), cfg, jnp.asarray([[256, 256]] * 2))
    sift = cv2.SIFT_create(nfeatures=1024)
    for i in range(2):
        kps_cv = sift.detect((imgs[i] * 255).astype(np.uint8), None)
        cv_xy = np.array([k.pt for k in kps_cv])
        ours = np.asarray(f.xy[i])[np.asarray(f.valid[i])]
        assert len(ours) >= 50
        d = np.sqrt(((ours[:, None] - cv_xy[None]) ** 2).sum(-1)).min(1)
        # >=70% of our keypoints within 2px of a cv2 keypoint.
        assert (d < 2.0).mean() > 0.7, (d < 2.0).mean()


def test_fundamental_vs_cv2_on_synthetic():
    """The uncalibrated 8-point F solver agrees with cv2.findFundamentalMat:
    comparable epipolar (Sampson) residuals on noisy correspondences
    (SURVEY.md §1.4 uncalibrated verification path)."""
    scene = make_orbit_scene(num_cameras=2, num_points=200, noise_px=0.5, seed=9, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    uv1 = scene.pixels[0][vis].astype(np.float64)
    uv2 = scene.pixels[1][vis].astype(np.float64)
    F_cv, inl_cv = cv2.findFundamentalMat(uv1, uv2, cv2.FM_RANSAC, 2.0, 0.999)

    u1 = jnp.asarray(uv1, jnp.float32)
    u2 = jnp.asarray(uv2, jnp.float32)
    F_ours = solvers.fundamental_8pt(u1, u2)

    def med_sampson(F):
        e = np.asarray(solvers.sampson_error(jnp.asarray(F, jnp.float32), u1, u2))
        return float(np.median(np.sqrt(e)))

    ours = med_sampson(np.asarray(F_ours))
    cv = med_sampson(F_cv)
    assert ours < max(2.0 * cv, 1.0), (ours, cv)
    # And the full F-RANSAC verify path keeps most true correspondences.
    from sfm_tpu.config import RansacConfig
    from sfm_tpu.ops.verify import verify_block

    cfgF = RansacConfig(num_hypotheses=512, min_inliers=15, error_threshold_px=2.0, model="fundamental")
    M = len(uv1)
    geom = verify_block(
        jax.random.PRNGKey(0)[None], u1[None], u2[None],
        jnp.ones((1, M), bool),
        jnp.asarray(scene.intrinsics[0])[None], jnp.asarray(scene.intrinsics[1])[None],
        cfgF,
    )
    assert bool(geom.ok[0])
    assert int(geom.num_inliers[0]) >= 0.8 * int(inl_cv.sum())


def test_essential_vs_cv2_on_synthetic():
    """Our batched essential solver agrees with cv2.findEssentialMat."""
    scene = make_orbit_scene(num_cameras=2, num_points=150, noise_px=0.5, seed=5, arc_fraction=0.12)
    vis = scene.visible[0] & scene.visible[1]
    uv1 = scene.pixels[0][vis].astype(np.float64)
    uv2 = scene.pixels[1][vis].astype(np.float64)
    K = np.array(
        [[scene.intrinsics[0, 0], 0, scene.intrinsics[0, 2]],
         [0, scene.intrinsics[0, 1], scene.intrinsics[0, 3]],
         [0, 0, 1]]
    )
    E_cv, _ = cv2.findEssentialMat(uv1, uv2, K, method=cv2.RANSAC, threshold=2.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv1, uv2, K)

    intr = jnp.asarray(scene.intrinsics[0])
    x1 = pixel_to_camera(jnp.asarray(uv1, dtype=jnp.float32), intr)
    x2 = pixel_to_camera(jnp.asarray(uv2, dtype=jnp.float32), intr)
    E_ours = solvers.essential_minimal(x1, x2)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    R_ours, t_ours, _ = solvers.decompose_essential(E_ours, x1, x2, mask)

    # Both estimators carry their own ~0.3 deg error at 0.5px noise; parity
    # means agreeing within the sum of those errors.
    rot_err = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R_ours).T @ R_cv) - 1) / 2, -1, 1)))
    t_err = np.degrees(np.arccos(np.clip(abs(np.asarray(t_ours) @ t_cv[:, 0]), -1, 1)))
    assert rot_err < 1.0, rot_err
    assert t_err < 2.0, t_err


def test_pnp_vs_cv2():
    """Batched EPnP+RANSAC agrees with cv2.solvePnPRansac."""
    import jax
    from sfm_tpu.ops.pnp import pnp_ransac
    from sfm_tpu.utils.synthetic import add_outliers
    from sfm_tpu.geometry.rotations import so3_exp

    scene = make_orbit_scene(num_cameras=1, num_points=150, noise_px=0.5, seed=6)
    pix, _ = add_outliers(scene.pixels, scene.visible, fraction=0.25, image_size=scene.image_size, seed=7)
    vis = scene.visible[0]
    X = scene.points[vis].astype(np.float64)
    uv_pix = pix[0][vis].astype(np.float64)
    K = np.array(
        [[scene.intrinsics[0, 0], 0, scene.intrinsics[0, 2]],
         [0, scene.intrinsics[0, 1], scene.intrinsics[0, 3]],
         [0, 0, 1]]
    )
    ok_cv, rvec_cv, tvec_cv, _ = cv2.solvePnPRansac(
        X, uv_pix.reshape(-1, 1, 2), K, None, reprojectionError=4.0, flags=cv2.SOLVEPNP_EPNP
    )
    assert ok_cv

    intr = jnp.asarray(scene.intrinsics[0])
    uv_norm = pixel_to_camera(jnp.asarray(uv_pix, dtype=jnp.float32), intr)
    thr = (4.0 / 600.0) ** 2
    pose, inl, n, ok = pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X, dtype=jnp.float32), uv_norm,
        jnp.ones(len(X), dtype=bool), num_hypotheses=512, threshold_sq=thr, min_inliers=12,
    )
    assert bool(ok)
    R_ours = np.asarray(so3_exp(pose[:3]))
    R_cv = cv2.Rodrigues(rvec_cv)[0]
    rot_err = np.degrees(np.arccos(np.clip((np.trace(R_ours.T @ R_cv) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(np.asarray(pose[3:]) - tvec_cv[:, 0])
    assert rot_err < 1.0, rot_err
    assert t_err < 0.05, t_err
