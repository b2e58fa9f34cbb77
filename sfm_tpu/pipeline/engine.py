"""Incremental reconstruction engine (SURVEY.md §2.5, §3.4).

Host-driven outer loop (the register -> triangulate -> local-BA ->
periodic-global-BA cycle is data-dependent by nature), device inner steps
(PnP RANSAC, masked-DLT triangulation, Schur-LM bundle adjustment). All
device calls use geometrically-bucketed capacities so the number of jit
compiles is O(log scene size), never O(registrations).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.geometry.cameras import pixel_to_camera
from sfm_tpu.geometry.rotations import so3_exp
from sfm_tpu.ops.pnp import pnp_ransac
from sfm_tpu.ops.triangulate import triangulate_tracks
from sfm_tpu.ba import build_problem, writeback, dispatch_bundle_adjust
from sfm_tpu.pipeline.stages import FeatureSet, MatchGraph
from sfm_tpu.scene.tracks import build_tracks, TrackSet
from sfm_tpu.scene.state import Reconstruction

_PNP_CAP = 2048      # 2D-3D correspondence budget per registration
_MIN_PNP_FLOOR = 6   # stall-rescue floor: EPnP needs >=6 links; below that a
                     # pose is unconstrained and rescue would do more harm
_TRI_VIEW_CAP = 8    # observations used per track triangulation

# Engine-internal wall-clock accounting, printed at the end of a run when
# SFM_TPU_ENGINE_PROFILE is set (SURVEY.md §5.1 observability).
_PROF: dict[str, float] = {}


def _prof(name: str):
    import contextlib
    import os
    import time

    @contextlib.contextmanager
    def cm():
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _PROF[name] = _PROF.get(name, 0.0) + time.perf_counter() - t0

    return cm() if os.environ.get("SFM_TPU_ENGINE_PROFILE") else contextlib.nullcontext()


@jax.jit
def _p2c_jit(uv, intr):
    return pixel_to_camera(uv, intr)


def _pixel_to_camera_padded(uv_pix: np.ndarray, intr: np.ndarray) -> np.ndarray:
    """Host->jit pixel normalization over bucket-padded arrays.

    Eager jnp calls on variable-length arrays cost seconds each on a remote
    device and recompile per length; this pads to power-of-2 buckets so one
    compiled program serves each bucket."""
    n = len(uv_pix)
    cap = 1024
    while cap < n:
        cap *= 2
    uv = np.zeros((cap, 2), np.float32)
    it = np.ones((cap, 6), np.float32)
    uv[:n] = uv_pix
    it[:n] = intr
    return np.asarray(_p2c_jit(jnp.asarray(uv), jnp.asarray(it)))[:n]


def _bucket(n: int, base: int = 256) -> int:
    cap = base
    n = max(n, 1)
    while cap < n:
        cap *= 2
    return cap


@dataclass
class EngineState:
    """Mutable host-side scene bookkeeping during incremental SfM.

    Points live in PREALLOCATED arrays (amortized doubling, capped by
    EngineConfig.max_points): the round-1 growable-list design re-copied
    every point on every registration round (np.asarray per round), which
    dominated host time at 1k+ images (VERDICT r1 item 3)."""

    feats: FeatureSet
    tracks: TrackSet
    intrinsics: np.ndarray           # [B, 6]
    rvecs: np.ndarray                # [B, 3]
    tvecs: np.ndarray                # [B, 3]
    registered: np.ndarray           # [B] bool
    failed: np.ndarray               # [B] bool (PnP failed; retry later)
    track_point: np.ndarray          # [T] int32 point id or -1
    points: np.ndarray = None        # [cap, 3] preallocated
    point_valid: np.ndarray = None   # [cap] bool
    num_points: int = 0
    obs_alive: np.ndarray = None     # [O] per track-observation row

    def ensure_point_capacity(self, n: int) -> None:
        cap = len(self.points)
        if n <= cap:
            return
        while cap < n:
            cap *= 2
        pts = np.zeros((cap, 3), np.float32)
        pv = np.zeros(cap, bool)
        pts[: self.num_points] = self.points[: self.num_points]
        pv[: self.num_points] = self.point_valid[: self.num_points]
        self.points = pts
        self.point_valid = pv

    def materialize(self) -> Reconstruction:
        """Snapshot as a Reconstruction (active obs only). Point arrays are
        VIEWS into the engine state — BA writeback flows straight through."""
        pts = self.points[: self.num_points]
        pv = self.point_valid[: self.num_points]
        tr = self.tracks
        has_pt = self.track_point[tr.track_id] >= 0
        act = self.obs_alive & self.registered[tr.obs_image] & has_pt
        if len(pv):
            act &= np.where(has_pt, pv[np.maximum(self.track_point[tr.track_id], 0)], False)
        else:  # no points triangulated yet: an empty-but-valid Reconstruction
            act[:] = False
        rows = np.where(act)[0]
        return Reconstruction(
            intrinsics=self.intrinsics,
            rvecs=self.rvecs,
            tvecs=self.tvecs,
            registered=self.registered.copy(),
            points=pts,
            point_errors=np.zeros(len(pts), np.float32),
            point_valid=pv,
            obs_point=self.track_point[tr.track_id[rows]].astype(np.int32),
            obs_image=tr.obs_image[rows].astype(np.int32),
            obs_kp=tr.obs_kp[rows].astype(np.int32),
            obs_uv=self._uv(rows),
        )

    def _uv(self, rows: np.ndarray) -> np.ndarray:
        return self.feats.xy[self.tracks.obs_image[rows], self.tracks.obs_kp[rows]].astype(np.float32)


def _np_rotmat(rvec: np.ndarray) -> np.ndarray:
    """Host Rodrigues for edge ranking: angle-axis [..., 3] -> [..., 3, 3]."""
    theta = np.linalg.norm(rvec, axis=-1)
    k = rvec / np.maximum(theta, 1e-12)[..., None]
    K = np.zeros(rvec.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    st, ct = np.sin(theta)[..., None, None], np.cos(theta)[..., None, None]
    R = np.eye(3) + st * K + (1.0 - ct) * (K @ K)
    R[theta < 1e-10] = np.eye(3)
    return R


def _edge_parallax_deg(
    graph: MatchGraph, edges: np.ndarray, feats: FeatureSet, intrinsics: np.ndarray
) -> np.ndarray:
    """Median rotation-compensated ray angle per edge (degrees).

    A near-zero-baseline pair looks like a pure rotation: after mapping image
    j's bearing rays back through R_ij, they coincide with image i's rays and
    the residual angle -> 0. This is exactly the triangulation angle the
    bootstrap will get, so it ranks init pairs by achievable parallax without
    running triangulation (COLMAP's init criterion, computed batched on host;
    pinhole-only — distortion is second-order for ranking)."""
    i, j = graph.pairs[edges, 0], graph.pairs[edges, 1]
    uv_i = feats.xy[i[:, None], graph.idx_i[edges]].astype(np.float64)  # [E, M, 2]
    uv_j = feats.xy[j[:, None], graph.idx_j[edges]].astype(np.float64)

    def rays(uv, intr):
        f = intr[:, None, 0:2]
        c = intr[:, None, 2:4]
        xy = (uv - c) / np.maximum(f, 1e-6)
        r = np.concatenate([xy, np.ones_like(xy[..., :1])], axis=-1)
        return r / np.linalg.norm(r, axis=-1, keepdims=True)

    r_i = rays(uv_i, intrinsics[i])
    r_j = rays(uv_j, intrinsics[j])
    R = _np_rotmat(graph.rvec[edges].astype(np.float64))       # cam_i -> cam_j
    r_j_in_i = np.einsum("ekj,emk->emj", R, r_j)               # R^T @ r_j
    cosang = np.clip(np.sum(r_i * r_j_in_i, axis=-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosang))
    ang = np.where(graph.inlier[edges], ang, np.nan)
    with np.errstate(all="ignore"):
        med = np.nanmedian(ang, axis=-1)
    return np.where(np.isfinite(med), med, 0.0)


def rank_init_pairs(
    graph: MatchGraph, feats: FeatureSet, intrinsics: np.ndarray, cfg: PipelineConfig
) -> np.ndarray:
    """Ranked bootstrap candidates: many inliers, not homography-degenerate,
    and with real parallax (SURVEY.md §2.5 init-pair selection).

    Returns edge ids best-first. Edges failing the parallax gate rank after
    every edge that passes it — on dense video-like capture the highest-inlier
    pairs are near-identical views whose E (and hence bootstrap triangulation)
    is degenerate, so inlier count alone picks the worst possible pair."""
    pose_ok = graph.pose_ok if graph.pose_ok is not None else graph.ok
    ok = graph.ok & pose_ok
    h_ratio = graph.num_h_inliers / np.maximum(graph.num_inliers, 1)
    ok &= graph.num_inliers >= cfg.engine.init_min_inliers
    ok &= h_ratio <= cfg.engine.init_max_h_ratio
    if not ok.any():
        # Fallback: relax the inlier bar but keep the degeneracy gate.
        ok = graph.ok & pose_ok & (h_ratio <= cfg.engine.init_max_h_ratio)
        if not ok.any():
            # Fully planar scene: every edge is H-dominated, but verify kept
            # a usable pose (homography decomposition) wherever one exists —
            # bootstrap from the best-supported of those. Edges that are
            # correspondence-only (pose_ok=False) cannot seed a map.
            ok = graph.ok & pose_ok
            if not ok.any():
                return np.zeros(0, np.int64)
    score = np.where(ok, graph.num_inliers * (1.0 - 0.5 * h_ratio), -1.0)
    top = np.where(score > 0)[0]
    if len(top) == 0:
        return np.zeros(0, np.int64)
    # Parallax over ALL surviving edges, chunked (dense-capture graphs can
    # have thousands of high-inlier near-degenerate edges, so a fixed-size
    # score-ranked pool can miss every usable pair).
    parallax = np.concatenate([
        _edge_parallax_deg(graph, top[s: s + _PARALLAX_CHUNK], feats, intrinsics)
        for s in range(0, len(top), _PARALLAX_CHUNK)
    ])
    gate = parallax >= max(cfg.engine.init_min_triangulation_angle_deg, 1e-3)
    # Pass-group by score; fail-group by parallax (most parallax first) so the
    # retry loop still makes progress on scenes where nothing passes the gate.
    order = np.lexsort((-np.where(gate, score[top], parallax), ~gate))
    return top[order]


_PARALLAX_CHUNK = 4096


def _register_bootstrap(st: EngineState, graph: MatchGraph, edge: int, cfg: PipelineConfig,
                        rvec: np.ndarray | None = None, tvec: np.ndarray | None = None):
    i, j = graph.pairs[edge]
    st.rvecs[i] = 0.0
    st.tvecs[i] = 0.0
    st.rvecs[j] = graph.rvec[edge] if rvec is None else rvec
    st.tvecs[j] = graph.tvec[edge] if tvec is None else tvec
    st.registered[i] = st.registered[j] = True


@jax.jit
def _two_view_pose_search(x1, x2, mask, rvec0, tvec0, min_angle_deg, thr_norm_sq):
    """Best relative pose for a bootstrap edge, by triangulability.

    Refits E and H on the edge's inlier correspondences (normalized camera
    coords, padded + masked) and scores ALL their decomposition candidates —
    4 from E, 4 from H, plus the stored verify pose — by how many
    correspondences land in front of both cameras with parallax above the
    triangulation gate. The verify-stage cheirality/plane votes are near
    coin-flips when the baseline is marginal (H explains everything), which
    silently killed whole clusters at dense-capture scale; counting what a
    pose actually triangulates is decisive. Returns (rvec, tvec, count)."""
    from sfm_tpu.geometry.rotations import matrix_to_aa
    from sfm_tpu.ops import solvers

    w = mask.astype(x1.dtype)
    E = solvers.essential_minimal(x1, x2, w)
    Re, te = solvers.decompose_essential_all(E)
    Hn = solvers.homography_4pt(x1, x2, w)
    Rh, th = solvers.decompose_homography_all(Hn)
    R0 = so3_exp(rvec0)
    t0 = tvec0 / jnp.maximum(jnp.linalg.norm(tvec0), 1e-9)
    Rs = jnp.concatenate([R0[None], Re, Rh])          # [9, 3, 3]
    ts = jnp.concatenate([t0[None], te, th])          # [9, 3]

    r1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    r2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    cos_gate = jnp.cos(jnp.deg2rad(min_angle_deg))

    f1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    f2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)

    def score(R, t):
        z1, z2 = solvers.two_view_depths(R, t, x1, x2)
        r2_in_1 = r2 @ R                               # R^T r2 rowwise
        cosang = jnp.sum(r1 * r2_in_1, axis=-1)
        # Reprojection gate: a garbage pose can fake parallax (wrong R) and
        # still put half the depths in front by chance — but its rays are
        # skew, so the least-squares 3D point reprojects far from the
        # measurements. Midpoint of the two ray endpoints, both-view check.
        X1 = z1[:, None] * f1
        X2_in_1 = (z2[:, None] * f2 - t) @ R
        Xm = 0.5 * (X1 + X2_in_1)
        zm1 = jnp.where(jnp.abs(Xm[:, 2]) < 1e-9, 1e-9, Xm[:, 2])
        e1 = jnp.sum((Xm[:, :2] / zm1[:, None] - x1) ** 2, axis=-1)
        Xc2 = Xm @ R.T + t
        zm2 = jnp.where(jnp.abs(Xc2[:, 2]) < 1e-9, 1e-9, Xc2[:, 2])
        e2 = jnp.sum((Xc2[:, :2] / zm2[:, None] - x2) ** 2, axis=-1)
        ok = (mask & (z1 > 0) & (z2 > 0) & (Xm[:, 2] > 0) & (Xc2[:, 2] > 0)
              & (cosang <= cos_gate) & (e1 <= thr_norm_sq) & (e2 <= thr_norm_sq))
        return jnp.sum(ok)

    counts = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return matrix_to_aa(Rs[best]), ts[best], counts[best]


def _triangulate_new(st: EngineState, cfg: PipelineConfig, verbose: bool,
                     min_angle_override: float | None = None) -> int:
    """Triangulate tracks seen by >=2 registered images that lack a point.

    min_angle_override: bootstrap passes the (much lower) seed-pair parallax
    floor here; steady-state triangulation uses the map-quality gate."""
    tr = st.tracks
    reg_obs = st.obs_alive & st.registered[tr.obs_image]
    seen = np.bincount(tr.track_id[reg_obs], minlength=tr.num_tracks)
    cand = np.where((seen >= 2) & (st.track_point < 0))[0]
    if len(cand) == 0:
        return 0

    T_cap = _bucket(len(cand))
    V = _TRI_VIEW_CAP
    rvecs = np.zeros((T_cap, V, 3), np.float32)
    tvecs = np.zeros((T_cap, V, 3), np.float32)
    xy = np.zeros((T_cap, V, 2), np.float32)
    mask = np.zeros((T_cap, V), bool)

    # Vectorized gather of up to V registered observations per candidate
    # track: track rows are stored sorted by track id, so each row's rank
    # within its track comes from a searchsorted, and the whole fill plus the
    # pixel normalization happens in two fancy-index ops and ONE device call
    # (the per-row loop was the host-side bottleneck at scale).
    rows = np.where(reg_obs)[0]
    tids = tr.track_id[rows]
    slot_of_track = -np.ones(tr.num_tracks, np.int64)
    slot_of_track[cand] = np.arange(len(cand))
    keep = slot_of_track[tids] >= 0
    rows, tids = rows[keep], tids[keep]
    first = np.searchsorted(tids, tids, side="left")
    rank = np.arange(len(rows)) - first
    keep = rank < V
    rows, tids, rank = rows[keep], tids[keep], rank[keep]
    slots = slot_of_track[tids]

    imgs = tr.obs_image[rows]
    rvecs[slots, rank] = st.rvecs[imgs]
    tvecs[slots, rank] = st.tvecs[imgs]
    uv_pix = st.feats.xy[imgs, tr.obs_kp[rows]]
    xy[slots, rank] = _pixel_to_camera_padded(uv_pix, st.intrinsics[imgs])
    mask[slots, rank] = True

    f_mean = float(np.mean(st.intrinsics[st.registered, 0]))
    min_angle = (cfg.engine.min_triangulation_angle_deg
                 if min_angle_override is None else min_angle_override)
    res = triangulate_tracks(
        jnp.asarray(rvecs), jnp.asarray(tvecs), jnp.asarray(xy), jnp.asarray(mask),
        min_angle_deg=min_angle,
        max_error_norm=cfg.engine.max_reprojection_error_px / f_mean,
    )
    valid = np.asarray(res.valid)[: len(cand)]
    pts = np.asarray(res.points)[: len(cand)]
    new = np.where(valid)[0]
    # Scene-state point budget (EngineConfig.max_points): keep the best
    # candidates that fit; the rest stay untriangulated (track_point = -1)
    # and can be picked up after filtering frees capacity.
    budget = cfg.engine.max_points - st.num_points
    if len(new) > budget:
        if cfg.verbose:
            print(f"[sfm_tpu] point budget hit: dropping {len(new) - budget} of {len(new)} new points")
        new = new[:max(budget, 0)]
    n0 = st.num_points
    st.ensure_point_capacity(n0 + len(new))
    st.track_point[cand[new]] = n0 + np.arange(len(new))
    st.points[n0:n0 + len(new)] = pts[new]
    st.point_valid[n0:n0 + len(new)] = True
    st.num_points = n0 + len(new)
    return len(new)


def _pnp_register(st: EngineState, img: int, cfg: PipelineConfig, key,
                  floor: int | None = None) -> bool:
    min_inl = cfg.engine.abs_pose_min_inliers if floor is None else floor
    tr = st.tracks
    rows = np.where((tr.obs_image == img) & st.obs_alive)[0]
    rows = rows[st.track_point[tr.track_id[rows]] >= 0]
    if len(rows) < min_inl:
        return False
    pts_arr = st.points[: st.num_points]
    pv = st.point_valid[: st.num_points]
    pids = st.track_point[tr.track_id[rows]]
    keep = pv[pids]
    rows, pids = rows[keep], pids[keep]
    if len(rows) < min_inl:
        return False
    rows = rows[:_PNP_CAP]
    pids = pids[:_PNP_CAP]

    X = np.zeros((_PNP_CAP, 3), np.float32)
    uv = np.zeros((_PNP_CAP, 2), np.float32)
    mask = np.zeros(_PNP_CAP, bool)
    X[: len(rows)] = pts_arr[pids]
    uv_pix = st.feats.xy[img, tr.obs_kp[rows]]
    uv[: len(rows)] = _pixel_to_camera_padded(
        uv_pix, np.broadcast_to(st.intrinsics[img], (len(rows), 6))
    )
    mask[: len(rows)] = True

    f = (st.intrinsics[img, 0] + st.intrinsics[img, 1]) * 0.5
    thr = (cfg.engine.abs_pose_error_px / f) ** 2
    pose, inl, n, ok = pnp_ransac(
        key, jnp.asarray(X), jnp.asarray(uv), jnp.asarray(mask),
        num_hypotheses=cfg.ransac.num_hypotheses,
        threshold_sq=thr,
        min_inliers=min_inl,
    )
    if not bool(ok):
        return False
    st.rvecs[img] = np.asarray(pose[:3])
    st.tvecs[img] = np.asarray(pose[3:])
    st.registered[img] = True
    # Kill the outlier 2D-3D links so they don't poison BA.
    bad = rows[~np.asarray(inl)[: len(rows)]]
    st.obs_alive[bad] = False
    return True


def _local_ba_cameras(rec: Reconstruction, window: np.ndarray, cap: int) -> np.ndarray:
    """Camera set for a local BA problem: the window plus the cameras most
    co-observing its points (capped). Restricting the problem this way keeps
    local BA O(window) as the scene grows — at 1k registered cameras the
    full-scene problem per registration round dominated wall-clock."""
    in_window = np.zeros(len(rec.registered), bool)
    in_window[window] = True
    win_obs = in_window[rec.obs_image]
    pts = np.zeros(len(rec.points), bool)
    pts[rec.obs_point[win_obs]] = True
    co_rows = pts[rec.obs_point] & ~win_obs
    counts = np.bincount(rec.obs_image[co_rows], minlength=len(rec.registered))
    counts[~rec.registered] = 0
    co = np.argsort(-counts)
    co = co[counts[co] > 0][: max(cap - len(window), 0)]
    return np.sort(np.concatenate([np.asarray(window), co]).astype(np.int64))


def _run_ba(st: EngineState, cfg: PipelineConfig, free_cams=None) -> None:
    rec = st.materialize()
    if rec.num_observations < 8 or rec.num_points < 4:
        return
    # Intrinsics refinement only in global BA (free_cams None): local windows
    # lack the coverage to constrain focal/distortion.
    refine = free_cams is None and (cfg.ba.refine_focal or cfg.ba.refine_distortion)
    cam_indices = None
    if free_cams is not None:
        cam_indices = _local_ba_cameras(rec, free_cams, cfg.engine.local_ba_max_cameras)
    prob, cams, pids = build_problem(
        rec, cam_indices=cam_indices, free_cams=free_cams, refine_intrinsics=refine
    )
    out, stats = dispatch_bundle_adjust(prob, cfg)
    # rec.points is a view into st.points (materialize), so writeback lands
    # directly in the engine state; poses are plain arrays and copy back.
    writeback(rec, out, cams, pids)
    st.rvecs[:] = rec.rvecs
    st.tvecs[:] = rec.tvecs


def _filter_observations(st: EngineState, cfg: PipelineConfig) -> int:
    """Drop observations above the reprojection gate; invalidate starved points."""
    rec = st.materialize()
    if rec.num_observations == 0:
        return 0
    err = rec.reprojection_errors()
    bad = err > cfg.engine.max_reprojection_error_px
    # Map back to track rows: materialize() selected rows in order.
    tr = st.tracks
    has_pt = st.track_point[tr.track_id] >= 0
    pv = st.point_valid[: st.num_points]
    act = st.obs_alive & st.registered[tr.obs_image] & has_pt
    act &= np.where(has_pt, pv[np.maximum(st.track_point[tr.track_id], 0)], False)
    rows = np.where(act)[0]
    st.obs_alive[rows[bad]] = False

    # Points need >=2 alive registered observations.
    alive = st.obs_alive & st.registered[tr.obs_image]
    pids_alive = st.track_point[tr.track_id[alive]]
    counts = np.bincount(pids_alive[pids_alive >= 0], minlength=st.num_points)
    starved = counts < 2
    newly = pv & starved
    st.point_valid[: st.num_points] &= ~starved
    # Allow re-triangulation of their tracks later.
    dropped = np.zeros(st.num_points + 1, bool)
    dropped[np.where(newly)[0]] = True
    tp = st.track_point
    st.track_point = np.where((tp >= 0) & dropped[np.minimum(tp, st.num_points)], -1, tp)
    return int(bad.sum())


def incremental_reconstruct(
    feats: FeatureSet, graph: MatchGraph, intrinsics: np.ndarray, cfg: PipelineConfig,
    checkpoint_cb=None,
) -> Reconstruction:
    """checkpoint_cb(step, reconstruction) is invoked every
    cfg.engine.checkpoint_every registrations (SURVEY.md §5.3: elastic
    recovery - a killed run resumes from the last SceneState snapshot)."""
    B, N = feats.valid.shape
    if B > cfg.engine.max_images:
        raise ValueError(
            f"{B} images exceeds EngineConfig.max_images={cfg.engine.max_images}; "
            "raise the capacity or enable partitioning (PartitionConfig)"
        )
    tracks = build_tracks(graph, B, N)
    if tracks.num_tracks == 0:
        raise RuntimeError("no tracks: match/verify produced no usable edges")
    if len(tracks.obs_image) > cfg.engine.max_observations:
        raise ValueError(
            f"{len(tracks.obs_image)} track observations exceed "
            f"EngineConfig.max_observations={cfg.engine.max_observations}; "
            "raise the capacity, prune the match graph, or partition"
        )

    st = EngineState(
        feats=feats,
        tracks=tracks,
        intrinsics=intrinsics.copy(),
        rvecs=np.zeros((B, 3), np.float32),
        tvecs=np.zeros((B, 3), np.float32),
        registered=np.zeros(B, bool),
        failed=np.zeros(B, bool),
        track_point=-np.ones(tracks.num_tracks, np.int32),
        points=np.zeros((4096, 3), np.float32),
        point_valid=np.zeros(4096, bool),
        obs_alive=np.ones(len(tracks.obs_image), bool),
    )

    cands = rank_init_pairs(graph, feats, intrinsics, cfg)
    if len(cands) == 0:
        raise RuntimeError("no valid initial pair")
    # Bootstrap retry (SURVEY.md §2.5): an edge can pass 2-view verification
    # yet triangulate nothing (tiny baseline -> degenerate E / all points
    # below the triangulation-angle gate). Try ranked candidates until one
    # produces a usable seed map; roll the 2-camera state back in between.
    min_seed_pts = max(8, cfg.engine.abs_pose_min_inliers)
    M = graph.idx_i.shape[1]

    def searched_pose(e: int):
        """Triangulability-scored pose for edge e (see _two_view_pose_search)."""
        i, j = graph.pairs[e]
        uv_i = feats.xy[i, graph.idx_i[e]]
        uv_j = feats.xy[j, graph.idx_j[e]]
        x1 = _pixel_to_camera_padded(uv_i, np.broadcast_to(intrinsics[i], (M, 6)))
        x2 = _pixel_to_camera_padded(uv_j, np.broadcast_to(intrinsics[j], (M, 6)))
        m = np.zeros(len(x1), bool)
        m[:M] = graph.inlier[e]
        f_pair = float(np.sqrt(max(intrinsics[i, 0] * intrinsics[j, 0], 1.0)))
        thr = (cfg.ransac.error_threshold_px / f_pair) ** 2
        rv, tv, n = _two_view_pose_search(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(m),
            jnp.asarray(graph.rvec[e]), jnp.asarray(graph.tvec[e]),
            float(cfg.engine.init_min_triangulation_angle_deg), thr,
        )
        return np.asarray(rv), np.asarray(tv), int(n)

    tried = 0
    edge = int(cands[0])
    for cand in cands[: 4 * cfg.engine.init_candidates]:
        if tried >= cfg.engine.init_candidates:
            break
        edge = int(cand)
        rv, tv, n_tri = searched_pose(edge)
        if n_tri < min_seed_pts:
            # No pose interpretation of this edge triangulates a seed map —
            # skip without touching state (one tiny device call, no rollback).
            if cfg.verbose:
                print(f"[sfm_tpu] bootstrap edge {graph.pairs[edge]} rejected: "
                      f"best pose triangulates {n_tri} < {min_seed_pts}")
            tried += 1
            continue
        _register_bootstrap(st, graph, edge, cfg, rvec=rv, tvec=tv)
        _triangulate_new(st, cfg, cfg.verbose,
                         min_angle_override=cfg.engine.init_min_triangulation_angle_deg)
        if st.num_points >= min_seed_pts:
            break
        if cfg.verbose:
            print(f"[sfm_tpu] bootstrap edge {graph.pairs[edge]} rejected: "
                  f"{st.num_points} points < {min_seed_pts}")
        i, j = graph.pairs[edge]
        st.registered[i] = st.registered[j] = False
        st.rvecs[i] = st.rvecs[j] = 0.0
        st.tvecs[i] = st.tvecs[j] = 0.0
        st.track_point[:] = -1
        st.point_valid[: st.num_points] = False
        st.num_points = 0
        tried += 1
    if st.num_points == 0:
        # Last resort: take the globally best searched pose even below the
        # seed bar (a 2-camera map can still grow via retries).
        best = None
        for cand in cands[: cfg.engine.init_candidates]:
            rv, tv, n_tri = searched_pose(int(cand))
            if best is None or n_tri > best[3]:
                best = (int(cand), rv, tv, n_tri)
        if best is not None and best[3] > 0:
            edge = best[0]
            _register_bootstrap(st, graph, edge, cfg, rvec=best[1], tvec=best[2])
            _triangulate_new(st, cfg, cfg.verbose,
                             min_angle_override=cfg.engine.init_min_triangulation_angle_deg)
    if st.num_points == 0:
        raise RuntimeError("bootstrap failed: no candidate pair triangulated any points")
    _run_ba(st, cfg)  # two-view BA
    if cfg.verbose:
        print(f"[sfm_tpu] bootstrap edge {graph.pairs[edge]}: {st.num_points} points")

    key = jax.random.PRNGKey(cfg.seed + 1)
    recent: list[int] = list(graph.pairs[edge])
    since_global = 0
    since_retri = 0
    retries_left = 2
    # Adaptive PnP floor (stall rescue): sparse scenes with short tracks can
    # leave a frontier image with slightly fewer visible triangulated points
    # than abs_pose_min_inliers (ladder #2 stalled at 38/48 with the next
    # image seeing 9 < 10). When the march stalls AND bounded retries are
    # exhausted, halve the floor (never below _MIN_PNP_FLOOR) and continue —
    # local BA + the reprojection filter guard against a bad low-count pose,
    # and every rescue-registration re-densifies the frontier so later images
    # usually register at the full floor again.
    floor = cfg.engine.abs_pose_min_inliers
    while True:
        # Rank unregistered images by visible triangulated points, then
        # register a ROUND of the best candidates before re-triangulating and
        # bundle-adjusting once — batching amortizes the device round trips
        # that dominate per-registration latency (SURVEY.md §7 hard part 3:
        # "avoid host-device ping-pong by batching candidate views per round").
        tr = st.tracks
        vis_rows = st.obs_alive & (st.track_point[tr.track_id] >= 0)
        cand_imgs = tr.obs_image[vis_rows]
        counts = np.bincount(cand_imgs, minlength=B)
        counts[st.registered | st.failed] = 0
        order = np.argsort(-counts)
        round_size = max(1, min(cfg.engine.local_ba_window // 2, 3))
        registered_round: list[int] = []
        with _prof("pnp"):
            for img in order[:round_size + 2]:
                if len(registered_round) >= round_size:
                    break
                if counts[img] < floor:
                    break
                key, sub = jax.random.split(key)
                if _pnp_register(st, int(img), cfg, sub, floor=floor):
                    registered_round.append(int(img))
                else:
                    st.failed[img] = True
        if registered_round:
            if floor < cfg.engine.abs_pose_min_inliers:
                # A rescue round advanced the frontier: return to the full
                # floor and re-arm one retry so the newly-densified map gets
                # a normal pass before the next rescue.
                floor = cfg.engine.abs_pose_min_inliers
                retries_left = max(retries_left, 1)
                st.failed[:] = False
            recent.extend(registered_round)
            with _prof("triangulate"):
                n_new = _triangulate_new(st, cfg, cfg.verbose)
            window = recent[-cfg.engine.local_ba_window:]
            with _prof("local_ba"):
                _run_ba(st, cfg, free_cams=np.asarray(window))
            if cfg.engine.filter_every:
                with _prof("filter"):
                    _filter_observations(st, cfg)
            since_global += len(registered_round)
            since_retri += len(registered_round)
            # Geometric schedule: at scale, run global BA on ~25% model
            # growth rather than every k registrations (COLMAP-style) — a
            # fixed period means O(B) ever-larger global solves.
            ba_period = max(
                cfg.engine.global_ba_every,
                int((cfg.engine.global_ba_growth - 1.0) * st.registered.sum()),
            )
            if since_global >= ba_period:
                with _prof("global_ba"):
                    _run_ba(st, cfg)
                with _prof("filter"):
                    _filter_observations(st, cfg)
                with _prof("triangulate"):
                    _triangulate_new(st, cfg, cfg.verbose)
                since_global = 0
                since_retri = 0
            elif cfg.engine.retriangulate_every and since_retri >= cfg.engine.retriangulate_every:
                # Periodic retriangulation between global BAs (SURVEY.md §2.5
                # outlier filtering / retriangulation): re-filter and retry
                # tracks whose points were dropped or never triangulated.
                _filter_observations(st, cfg)
                _triangulate_new(st, cfg, cfg.verbose)
                since_retri = 0
            if checkpoint_cb is not None:
                n_reg = int(st.registered.sum())
                every = max(cfg.engine.checkpoint_every, 1)
                if n_reg // every > (n_reg - len(registered_round)) // every:
                    checkpoint_cb(n_reg, st.materialize())
            if cfg.verbose:
                pv = st.point_valid[: st.num_points]
                print(
                    f"[sfm_tpu] registered {registered_round}: +{n_new} pts, "
                    f"{int(st.registered.sum())}/{B} cams, {int(pv.sum())} pts"
                )
        else:
            # Bounded retry rounds: failed images get another chance once the
            # map has grown (SURVEY.md §2.5 retriangulation/retry policy).
            if retries_left > 0 and st.failed.any() and st.registered.sum() > 2:
                retries_left -= 1
                st.failed[:] = False
                continue
            # Stall rescue: lower the PnP floor and try again (see above).
            if floor > _MIN_PNP_FLOOR and st.registered.sum() >= 2 and not st.registered.all():
                floor = max(_MIN_PNP_FLOOR, floor // 2)
                st.failed[:] = False
                if cfg.verbose:
                    print(f"[sfm_tpu] stall at {int(st.registered.sum())}/{B}: "
                          f"lowering PnP floor to {floor} for a rescue round")
                continue
            if cfg.verbose and not st.registered.all():
                top = order[:4]
                print(
                    f"[sfm_tpu] stall at {int(st.registered.sum())}/{B}: best "
                    f"unregistered candidates {[(int(t), int(counts[t])) for t in top]} "
                    f"(need >= {cfg.engine.abs_pose_min_inliers} visible points)"
                )
            break

    # Final polish: global BA + filter + last retriangulation + BA.
    with _prof("global_ba"):
        _run_ba(st, cfg)
        _filter_observations(st, cfg)
        _triangulate_new(st, cfg, cfg.verbose)
        _run_ba(st, cfg)
    import os

    if os.environ.get("SFM_TPU_ENGINE_PROFILE") and cfg.verbose:
        print(f"[sfm_tpu] engine profile (s): " +
              ", ".join(f"{k}={v:.1f}" for k, v in sorted(_PROF.items())))
    return st.materialize()
