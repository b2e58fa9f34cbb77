"""Real-image benchmark scene: a textured room corner rendered with REAL
photographic textures (matplotlib's bundled grace_hopper.jpg + friends)
through exact plane homographies, written as JPEG files with EXIF focal
metadata — so the pipeline's actual decode + EXIF ingest path runs, and the
content is photographic texture, not synthetic blobs (VERDICT r3 next #5).

Three mutually perpendicular planes (floor + two walls) with distinct
textures, viewed from an arc of cameras looking into the corner: every view
sees all three planes, parallax is strong, and ground-truth K/R/t are exact
(the render IS the projection model).
"""

from __future__ import annotations

import os

import numpy as np


def _textures(size=768):
    """Three distinct real-content textures, square uint8 grayscale."""
    import cv2
    import matplotlib

    sample = os.path.join(os.path.dirname(matplotlib.__file__),
                          "mpl-data", "sample_data")
    hopper = cv2.imread(os.path.join(sample, "grace_hopper.jpg"),
                        cv2.IMREAD_GRAYSCALE)
    hopper = cv2.resize(hopper, (size, size), interpolation=cv2.INTER_AREA)

    # Terrain DEM rendered to grayscale — natural mid-frequency content.
    topo = np.load(os.path.join(sample, "topobathy.npz"))["topo"].astype(np.float32)
    topo = (topo - topo.min()) / (topo.max() - topo.min())
    topo = cv2.resize((topo * 255).astype(np.uint8), (size, size),
                      interpolation=cv2.INTER_CUBIC)

    # Third texture: hopper rotated + histogram-shifted so cross-plane
    # descriptor matches don't fire, plus DEM blend for extra gradients.
    mix = cv2.addWeighted(cv2.rotate(hopper, cv2.ROTATE_180), 0.6, topo, 0.4, 0)
    return [hopper, topo, mix]


def _look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """World->camera rotation R (x_cam = R @ (x_world - eye)), z forward."""
    z = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    z /= np.linalg.norm(z)
    x = np.cross(z, np.asarray(up, np.float64))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def render_textured_corner(out_dir: str, num_images: int = 40, size: int = 640,
                           jpeg_quality: int = 92, focal_factor: float = 40.0 / 36.0,
                           seed: int = 0):
    """Render the corner scene to JPEGs. Returns (paths, K, rvecs, tvecs).

    rvec/tvec are world->camera (x_cam = R x + t), matching the pipeline's
    convention. The default focal_factor (40/36 ≈ 1.11) differs from the
    ingest fallback (1.2) on purpose — a correct reconstruction proves the
    EXIF path was used — and makes FocalLengthIn35mmFilm exactly 40, so the
    EXIF short round-trips with zero quantization error.
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    texs = _textures()
    th, tw = texs[0].shape

    # Planes: origin o, full-extent basis U, V (3D). Corner at (0,0,0).
    planes = [
        (np.array([0.0, 0.0, 0.0]), np.array([2.0, 0.0, 0.0]), np.array([0.0, 0.0, 2.0])),   # floor y=0
        (np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 2.0]), np.array([0.0, 1.6, 0.0])),   # wall x=0
        (np.array([0.0, 0.0, 0.0]), np.array([2.0, 0.0, 0.0]), np.array([0.0, 1.6, 0.0])),   # wall z=0
    ]
    target = np.array([0.8, 0.5, 0.8])

    f_px = focal_factor * size
    K = np.array([[f_px, 0, size / 2], [0, f_px, size / 2], [0, 0, 1]], np.float64)

    rng = np.random.default_rng(seed)
    paths, rvecs, tvecs = [], [], []
    for i in range(num_images):
        # Arc in the +x+z octant looking into the corner, with elevation
        # and radius jitter for non-degenerate baselines.
        az = np.deg2rad(20 + 50 * i / max(num_images - 1, 1) + rng.normal(0, 1.0))
        el = np.deg2rad(22 + 10 * np.sin(2.2 * i) + rng.normal(0, 1.0))
        r = 3.4 + 0.25 * np.sin(1.3 * i)
        eye = target + r * np.array([np.cos(el) * np.sin(az), np.sin(el),
                                     np.cos(el) * np.cos(az)])
        R = _look_at(eye, target)
        t = -R @ eye

        canvas = np.zeros((size, size), np.uint8)
        # Paint farthest plane first (the three planes of an open corner
        # seen from outside never truly occlude, but seams stay clean).
        order = np.argsort([-(R @ (o + 0.5 * U + 0.5 * V) + t)[2]
                            for o, U, V in planes])
        for pi in order:
            o, U, V = planes[pi]
            # Texture px -> image px homography (see module doc).
            H = K @ np.stack([R @ U / tw, R @ V / th, R @ o + t], axis=1)
            warped = cv2.warpPerspective(texs[pi], H, (size, size),
                                         flags=cv2.INTER_LINEAR)
            mask = cv2.warpPerspective(np.full((th, tw), 255, np.uint8), H,
                                       (size, size), flags=cv2.INTER_NEAREST)
            canvas[mask > 0] = warped[mask > 0]

        # Mild sensor noise so JPEG blocks don't produce fake corners.
        noisy = np.clip(canvas.astype(np.float32)
                        + rng.normal(0, 1.5, canvas.shape), 0, 255).astype(np.uint8)
        path = os.path.join(out_dir, f"view_{i:04d}.jpg")
        _write_jpeg_with_exif(path, noisy, f_px, size, jpeg_quality)
        paths.append(path)
        rvecs.append(cv2.Rodrigues(R)[0].ravel())
        tvecs.append(t)

    return paths, K, np.asarray(rvecs, np.float32), np.asarray(tvecs, np.float32)


def _write_jpeg_with_exif(path: str, gray: np.ndarray, f_px: float,
                          width_px: int, quality: int):
    """JPEG with FocalLengthIn35mmFilm so ingest's EXIF focal prior fires
    (sfm_tpu/pipeline/ingest.py exif_focal_px derivation #1)."""
    from PIL import Image

    im = Image.fromarray(gray, mode="L")
    exif = Image.Exif()
    ifd = exif.get_ifd(0x8769)
    ifd[0xA405] = int(round(f_px * 36.0 / width_px))   # FocalLengthIn35mmFilm
    im.save(path, "JPEG", quality=quality, exif=exif)
