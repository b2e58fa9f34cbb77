"""Exporters (SURVEY.md §2.8): COLMAP-compatible text model + PLY cloud.

Host-side writers over the Reconstruction state; formats follow the public
COLMAP sparse-model text layout so downstream MVS/visualization tools accept
the output directly.
"""

from __future__ import annotations

import os

import numpy as np

from sfm_tpu.geometry.rotations import aa_to_quat
from sfm_tpu.scene.state import Reconstruction
import jax.numpy as jnp


def write_ply(rec: Reconstruction, path: str, colors: np.ndarray | None = None) -> None:
    """Sparse point cloud as ASCII PLY."""
    pts = rec.points[rec.point_valid]
    if colors is None:
        colors = np.full((len(pts), 3), 200, dtype=np.uint8)
    else:
        colors = colors[rec.point_valid].astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\nend_header\n")
        for p, c in zip(pts, colors):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def write_colmap_text(rec: Reconstruction, out_dir: str) -> None:
    """cameras.txt / images.txt / points3D.txt in COLMAP sparse text format."""
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for i in range(len(rec.intrinsics)):
            fx, fy, cx, cy, k1, k2 = (float(v) for v in rec.intrinsics[i])
            if rec.image_sizes is not None:
                w, h = int(rec.image_sizes[i][0]), int(rec.image_sizes[i][1])
            else:  # legacy fallback: principal point assumed centered
                w, h = int(round(cx * 2)), int(round(cy * 2))
            # Pick the COLMAP model that actually represents the intrinsics —
            # never silently drop fy or k2.
            if k1 == 0.0 and k2 == 0.0:
                f.write(f"{i + 1} PINHOLE {w} {h} {fx:.6f} {fy:.6f} {cx:.6f} {cy:.6f}\n")
            elif fx == fy and k2 == 0.0:
                f.write(f"{i + 1} SIMPLE_RADIAL {w} {h} {fx:.6f} {cx:.6f} {cy:.6f} {k1:.8f}\n")
            elif fx == fy:
                f.write(f"{i + 1} RADIAL {w} {h} {fx:.6f} {cx:.6f} {cy:.6f} {k1:.8f} {k2:.8f}\n")
            else:
                f.write(
                    f"{i + 1} OPENCV {w} {h} {fx:.6f} {fy:.6f} {cx:.6f} {cy:.6f} "
                    f"{k1:.8f} {k2:.8f} 0.0 0.0\n"
                )

    # Group observations by image for the POINTS2D lines.
    obs_by_image: dict[int, list[int]] = {}
    if rec.num_observations:
        for row, img in enumerate(rec.obs_image):
            obs_by_image.setdefault(int(img), []).append(row)

    # POINT2D_IDX in points3D.txt TRACK[] must index into the image's
    # POINTS2D line (0-based row order below), not the detector keypoint id.
    point2d_idx = np.zeros(rec.num_observations, dtype=np.int64)
    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        f.write("# Image list: IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        for i in range(len(rec.registered)):
            if not rec.registered[i]:
                continue
            q = np.asarray(aa_to_quat(jnp.asarray(rec.rvecs[i])))
            t = rec.tvecs[i]
            name = rec.image_names[i] if i < len(rec.image_names) else f"image_{i:06d}.jpg"
            f.write(
                f"{i + 1} {q[0]:.8f} {q[1]:.8f} {q[2]:.8f} {q[3]:.8f} "
                f"{t[0]:.8f} {t[1]:.8f} {t[2]:.8f} {i + 1} {name}\n"
            )
            rows = obs_by_image.get(i, [])
            parts = []
            for idx, r in enumerate(rows):
                u, v = rec.obs_uv[r]
                parts.append(f"{u:.3f} {v:.3f} {int(rec.obs_point[r]) + 1}")
                point2d_idx[r] = idx
            f.write(" ".join(parts) + "\n")

    errs = rec.reprojection_errors() if rec.num_observations else np.zeros(0)
    with open(os.path.join(out_dir, "points3D.txt"), "w") as f:
        f.write("# 3D point list: POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] (IMAGE_ID, POINT2D_IDX)\n")
        if rec.points is None:
            return
        track_rows: dict[int, list[int]] = {}
        for row, pid in enumerate(rec.obs_point if rec.num_observations else []):
            track_rows.setdefault(int(pid), []).append(row)
        for pid in range(len(rec.points)):
            if not rec.point_valid[pid]:
                continue
            p = rec.points[pid]
            rows = track_rows.get(pid, [])
            err = float(np.mean([errs[r] for r in rows])) if rows else 0.0
            track = " ".join(f"{int(rec.obs_image[r]) + 1} {int(point2d_idx[r])}" for r in rows)
            f.write(f"{pid + 1} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 200 200 200 {err:.4f} {track}\n")
