"""EXIF-prior ingest + COLMAP export consistency (SURVEY.md §2.2, §2.8)."""

import os

import numpy as np
import pytest

from sfm_tpu.pipeline.ingest import exif_focal_px, load_images
from sfm_tpu.config import SiftConfig
from sfm_tpu.scene.export import write_colmap_text
from sfm_tpu.scene.state import Reconstruction


def _write_jpeg(path, w=96, h=64, exif_tags=None):
    from PIL import Image

    arr = (np.linspace(0, 255, w * h).reshape(h, w)).astype(np.uint8)
    im = Image.fromarray(arr)
    if exif_tags:
        exif = Image.Exif()
        ifd = exif.get_ifd(0x8769)
        for k, v in exif_tags.items():
            ifd[k] = v
        im.save(path, exif=exif.tobytes())
    else:
        im.save(path)
    return path


def test_exif_focal_35mm(tmp_path):
    p = _write_jpeg(str(tmp_path / "a.jpg"), exif_tags={0xA405: 50})
    # f_px = f35 / 36mm * width_px
    assert exif_focal_px(p) == pytest.approx(50 / 36 * 96)


def test_exif_focal_plane_resolution(tmp_path):
    p = _write_jpeg(
        str(tmp_path / "b.jpg"),
        exif_tags={0x920A: 4.3, 0xA20E: 1000.0, 0xA210: 3},  # mm, px/cm, cm
    )
    assert exif_focal_px(p) == pytest.approx(4.3 * 100.0)


def test_exif_focal_absent(tmp_path):
    p = _write_jpeg(str(tmp_path / "c.jpg"))
    assert exif_focal_px(p) is None


def test_load_images_uses_exif_prior(tmp_path):
    p_exif = _write_jpeg(str(tmp_path / "a.jpg"), exif_tags={0xA405: 50})
    p_plain = _write_jpeg(str(tmp_path / "b.jpg"))
    batch = load_images([p_exif, p_plain], SiftConfig(image_max_dim=128))
    assert batch.intrinsics[0, 0] == pytest.approx(50 / 36 * 96, rel=1e-5)
    assert batch.intrinsics[1, 0] == pytest.approx(1.2 * 96)


def test_load_images_exif_prior_scales_with_resize(tmp_path):
    p = _write_jpeg(str(tmp_path / "a.jpg"), w=96, h=64, exif_tags={0xA405: 50})
    batch = load_images([p], SiftConfig(image_max_dim=48))  # forced 2x downscale
    assert batch.intrinsics[0, 0] == pytest.approx((50 / 36 * 96) * 0.5, rel=1e-5)


def _toy_rec():
    """2 cameras, 2 points; point 0 seen by both, point 1 only by camera 1."""
    return Reconstruction(
        intrinsics=np.array([[100.0, 100, 32, 24, 0, 0], [100, 100, 32, 24, 0.01, 0]], np.float32),
        rvecs=np.zeros((2, 3), np.float32),
        tvecs=np.zeros((2, 3), np.float32),
        registered=np.ones(2, bool),
        image_sizes=np.array([[64, 48], [64, 48]], np.int32),
        points=np.array([[0, 0, 5.0], [1, 1, 5.0]], np.float32),
        point_errors=np.zeros(2, np.float32),
        point_valid=np.ones(2, bool),
        obs_point=np.array([0, 1, 0], np.int32),
        obs_image=np.array([0, 1, 1], np.int32),
        obs_kp=np.array([7, 9, 11], np.int32),  # raw detector ids: NOT POINT2D idx
        obs_uv=np.array([[32, 24], [52, 44], [32, 24]], np.float32),
    )


def test_colmap_track_point2d_idx_consistent(tmp_path):
    """points3D TRACK[] (IMAGE_ID, POINT2D_IDX) must index the image's
    POINTS2D line, and that entry must point back at the same 3D point."""
    rec = _toy_rec()
    write_colmap_text(rec, str(tmp_path))

    points2d = {}  # image_id -> list of (u, v, point3d_id)
    with open(tmp_path / "images.txt") as f:
        lines = [l.rstrip("\n") for l in f if not l.startswith("#")]
    for meta, pts in zip(lines[0::2], lines[1::2]):
        img_id = int(meta.split()[0])
        vals = pts.split()
        points2d[img_id] = [
            (float(vals[k]), float(vals[k + 1]), int(vals[k + 2]))
            for k in range(0, len(vals), 3)
        ]

    with open(tmp_path / "points3D.txt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            vals = line.split()
            pid = int(vals[0])
            track = vals[8:]
            for k in range(0, len(track), 2):
                img_id, p2d_idx = int(track[k]), int(track[k + 1])
                assert p2d_idx < len(points2d[img_id]), "POINT2D_IDX out of range"
                assert points2d[img_id][p2d_idx][2] == pid, "round-trip mismatch"


def test_colmap_camera_dims_and_model(tmp_path):
    rec = _toy_rec()
    write_colmap_text(rec, str(tmp_path))
    with open(tmp_path / "cameras.txt") as f:
        lines = [l.split() for l in f if not l.startswith("#")]
    # True canvas dims from image_sizes, not 2*principal point.
    assert lines[0][2:4] == ["64", "48"]
    assert lines[0][1] == "PINHOLE"        # no distortion
    assert lines[1][1] == "SIMPLE_RADIAL"  # fx == fy, k1 != 0


def test_local_ba_all_free_window_keeps_gauge_anchors():
    from sfm_tpu.ba.problem import build_problem

    rec = _toy_rec()
    # Window covers every camera: the gauge must still be anchored.
    prob, cam_idx, _ = build_problem(rec, free_cams=np.array([0, 1]))
    fixed = np.asarray(prob.cam_fixed)[: len(cam_idx)]
    assert fixed.sum() >= 2


def test_colmap_bin_roundtrip(tmp_path):
    """write_colmap_bin -> read_colmap_bin reproduces the model exactly, and
    the binary TRACK[] obeys the same POINT2D_IDX contract as the text."""
    from sfm_tpu.scene.export import write_colmap_bin, read_colmap_bin

    rec = _toy_rec()
    write_colmap_bin(rec, str(tmp_path))
    cameras, images, points3D = read_colmap_bin(str(tmp_path))

    assert len(cameras) == 2
    assert cameras[1]["model_id"] == 1            # PINHOLE
    assert cameras[1]["width"] == 64 and cameras[1]["height"] == 48
    assert cameras[2]["model_id"] == 2            # SIMPLE_RADIAL

    assert set(images) == {1, 2}
    np.testing.assert_allclose(images[2]["tvec"], rec.tvecs[1], atol=1e-12)
    # Image 2 observes two points (rows 1, 2 of the obs table).
    assert len(images[2]["xys"]) == 2

    assert set(points3D) == {1, 2}
    np.testing.assert_allclose(points3D[1]["xyz"], [0, 0, 5.0], atol=1e-12)
    for pid, pt in points3D.items():
        for img_id, p2d in zip(pt["image_ids"], pt["point2D_idxs"]):
            assert int(images[int(img_id)]["point3D_ids"][int(p2d)]) == pid
