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
    """Align `other` into `base`'s frame via shared registered cameras AND
    shared 3D points, then union points/observations with (image,
    keypoint)-keyed dedup.

    The overlap cameras alone are a short, nearly-collinear arc of the
    capture path, so a camera-only Umeyama leaves a free rotation about that
    arc — at pod scale the cluster chain accumulated that gauge slack into
    global distortion. Shared tracks (matched by observation identity, which
    needs no geometry) add volumetric correspondences that pin the rotation;
    one trimmed re-fit drops gross outlier pairs."""
    shared = np.where(base.registered & other.registered)[0]
    if len(shared) < min_shared:
        raise ValueError(f"only {len(shared)} shared cameras; need >= {min_shared}")

    # Observation-identity match (image, keypoint) — geometry-free, so it can
    # run BEFORE alignment and feed shared-point correspondences into it.
    kb = base.obs_image.astype(np.int64) << 32 | base.obs_kp.astype(np.int64)
    ko = other.obs_image.astype(np.int64) << 32 | other.obs_kp.astype(np.int64)
    order = np.argsort(kb, kind="stable")
    kb_sorted = kb[order]
    pos = np.searchsorted(kb_sorted, ko)
    pos_c = np.minimum(pos, len(kb_sorted) - 1) if len(kb_sorted) else np.zeros_like(pos)
    matched = (len(kb_sorted) > 0) & (kb_sorted[pos_c] == ko)
    base_pid_of_row = np.where(matched, base.obs_point[order[pos_c]], -1)

    # Shared-point pairs: rows whose tracks are valid on both sides.
    pair_rows = np.where(
        matched
        & other.point_valid[other.obs_point]
        & base.point_valid[np.maximum(base_pid_of_row, 0)]
    )[0]
    pid_pairs = np.unique(
        np.stack([other.obs_point[pair_rows], base_pid_of_row[pair_rows]], axis=1), axis=0
    ) if len(pair_rows) else np.zeros((0, 2), np.int64)

    src = np.concatenate([_centers(other, shared), other.points[pid_pairs[:, 0]]])
    dst = np.concatenate([_centers(base, shared), base.points[pid_pairs[:, 1]]])
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    s, R, t = float(s), np.asarray(R), np.asarray(t)
    if len(src) > 2 * len(shared):
        # Trimmed re-fit: drop the worst-residual 25% (wrongly-linked tracks
        # or badly-triangulated points would otherwise skew the alignment).
        res = np.linalg.norm((s * src @ R.T + t) - dst, axis=1)
        keep = res <= np.quantile(res, 0.75)
        if keep.sum() >= 3:
            s, R, t = umeyama(jnp.asarray(src[keep]), jnp.asarray(dst[keep]))
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

    valid_row = other.point_valid[other.obs_point]
    P_other = len(other.points)
    # Track-level link: an other-track that shares any (image, kp) with base
    # merges into that base point (smallest matching id on conflicts).
    target = np.full(P_other, np.iinfo(np.int64).max, np.int64)
    link_rows = np.where(matched & valid_row)[0]
    np.minimum.at(target, other.obs_point[link_rows], base_pid_of_row[link_rows].astype(np.int64))
    linked = target != np.iinfo(np.int64).max

    # Fresh points for unlinked valid tracks that actually carry observations.
    has_rows = np.zeros(P_other, bool)
    has_rows[other.obs_point[valid_row]] = True
    fresh = other.point_valid & ~linked & has_rows
    n_base = len(base.points)
    fresh_ids = np.cumsum(fresh) - 1 + n_base
    target = np.where(fresh, fresh_ids, target)

    # Rows to append: valid-track rows whose key is not already in base.
    app = np.where(valid_row & ~matched & (linked | fresh)[other.obs_point])[0]
    # Guard against duplicate keys inside `other` itself (keep first).
    _, first_idx = np.unique(ko[app], return_index=True)
    app = app[np.sort(first_idx)]

    out.points = np.concatenate([base.points, other.points[fresh]]).astype(np.float32)
    out.point_valid = np.concatenate([base.point_valid, np.ones(int(fresh.sum()), bool)])
    out.point_errors = np.zeros(len(out.points), np.float32)
    out.obs_point = np.concatenate([base.obs_point, target[other.obs_point[app]]]).astype(np.int32)
    out.obs_image = np.concatenate([base.obs_image, other.obs_image[app]]).astype(np.int32)
    out.obs_kp = np.concatenate([base.obs_kp, other.obs_kp[app]]).astype(np.int32)
    out.obs_uv = np.concatenate([base.obs_uv, other.obs_uv[app]]).astype(np.float32)
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
