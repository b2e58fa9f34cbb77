"""Cluster merge (SURVEY.md §2.7): sim3 alignment via shared cameras +
track-level deduplication.

Reference-class realization: Umeyama alignment over common cameras/points,
conflict resolution, merged bundle adjustment. Here: vmapped Umeyama on
shared camera centers (device), host-side observation-table merge keyed by
(image, keypoint) identity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import PipelineConfig
from sfm_tpu.geometry.projection import camera_center
from sfm_tpu.geometry.rotations import so3_exp, matrix_to_aa
from sfm_tpu.geometry.similarity import umeyama
from sfm_tpu.scene.state import Reconstruction


def _centers(rec: Reconstruction, imgs: np.ndarray) -> np.ndarray:
    return np.asarray(
        camera_center(jnp.asarray(rec.rvecs[imgs]), jnp.asarray(rec.tvecs[imgs]))
    )


def apply_sim3_to_reconstruction(rec: Reconstruction, s: float, R: np.ndarray, t: np.ndarray) -> Reconstruction:
    """Transform a reconstruction's world frame: x' = s R x + t.

    Camera pose update (preserving pixel projections, depth scaled by s):
    R' = R_cam R^T, t' = s t_cam - R' t.
    """
    rec = Reconstruction(**{**rec.__dict__})
    Rc = np.asarray(so3_exp(jnp.asarray(rec.rvecs)))
    Rp = np.einsum("kij,lj->kil", Rc, R)  # R_cam @ R^T
    rec.rvecs = np.asarray(matrix_to_aa(jnp.asarray(Rp))).astype(np.float32)
    rec.tvecs = (s * rec.tvecs - np.einsum("kij,j->ki", Rp, t)).astype(np.float32)
    rec.points = (s * rec.points @ R.T + t).astype(np.float32)
    return rec


def merge_two(base: Reconstruction, other: Reconstruction, min_shared: int = 3, verbose: bool = False) -> Reconstruction:
    """Align `other` into `base`'s frame via shared registered cameras, then
    union points/observations with (image, keypoint)-keyed dedup."""
    shared = np.where(base.registered & other.registered)[0]
    if len(shared) < min_shared:
        raise ValueError(f"only {len(shared)} shared cameras; need >= {min_shared}")

    src = _centers(other, shared)
    dst = _centers(base, shared)
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    s, R, t = float(s), np.asarray(R), np.asarray(t)
    other = apply_sim3_to_reconstruction(other, s, R, t)

    # Merged camera set: base wins on shared cameras.
    out = Reconstruction(**{**base.__dict__})
    out.rvecs = base.rvecs.copy()
    out.tvecs = base.tvecs.copy()
    out.registered = base.registered.copy()
    only_other = other.registered & ~base.registered
    out.rvecs[only_other] = other.rvecs[only_other]
    out.tvecs[only_other] = other.tvecs[only_other]
    out.registered |= other.registered

    # Observation-key -> base point id.
    key_to_point: dict[tuple[int, int], int] = {}
    for r in range(base.num_observations):
        key_to_point[(int(base.obs_image[r]), int(base.obs_kp[r]))] = int(base.obs_point[r])

    points = list(base.points)
    point_valid = list(base.point_valid)
    obs = {
        "point": list(base.obs_point), "image": list(base.obs_image),
        "kp": list(base.obs_kp), "uv": list(base.obs_uv),
    }
    seen_obs = set(zip(obs["image"], obs["kp"]))

    # Group other's observations by point.
    rows_by_point: dict[int, list[int]] = {}
    for r in range(other.num_observations):
        rows_by_point.setdefault(int(other.obs_point[r]), []).append(r)

    for pid, rows in rows_by_point.items():
        if not other.point_valid[pid]:
            continue
        # Does this track intersect an existing base point?
        target = None
        for r in rows:
            k = (int(other.obs_image[r]), int(other.obs_kp[r]))
            if k in key_to_point:
                target = key_to_point[k]
                break
        if target is None:
            target = len(points)
            points.append(other.points[pid])
            point_valid.append(True)
        for r in rows:
            k = (int(other.obs_image[r]), int(other.obs_kp[r]))
            if k in seen_obs:
                continue
            seen_obs.add(k)
            key_to_point[k] = target
            obs["point"].append(target)
            obs["image"].append(int(other.obs_image[r]))
            obs["kp"].append(int(other.obs_kp[r]))
            obs["uv"].append(other.obs_uv[r])

    out.points = np.asarray(points, np.float32).reshape(-1, 3)
    out.point_valid = np.asarray(point_valid, bool)
    out.point_errors = np.zeros(len(points), np.float32)
    out.obs_point = np.asarray(obs["point"], np.int32)
    out.obs_image = np.asarray(obs["image"], np.int32)
    out.obs_kp = np.asarray(obs["kp"], np.int32)
    out.obs_uv = np.asarray(obs["uv"], np.float32).reshape(-1, 2)
    return out


def merge_reconstructions(recs: list[Reconstruction], cfg: PipelineConfig) -> Reconstruction:
    """Merge clusters largest-first; clusters that never share enough cameras
    with the merged set are retried after others have joined, then dropped."""
    recs = sorted(recs, key=lambda r: -r.num_registered)
    merged = recs[0]
    pending = list(recs[1:])
    progress = True
    while pending and progress:
        progress = False
        still = []
        for rec in pending:
            try:
                merged = merge_two(merged, rec, verbose=cfg.verbose)
                progress = True
            except ValueError:
                still.append(rec)
        pending = still
    if pending and cfg.verbose:
        print(f"[sfm_tpu] {len(pending)} cluster(s) could not be aligned (no shared cameras)")
    return merged
