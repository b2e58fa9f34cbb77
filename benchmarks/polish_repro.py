"""Reproduce / debug the merged-model global polish BA at 10k-ladder shapes.

The 10k#2 ladder run (2026-08-17) crashed the Axon TPU worker inside the
first merged global BA (C=9998 reg -> C_cap=10000, P~5.6k, O~1.05M,
cg=64, 40 LM iters). This script rebuilds that problem two ways:

  python benchmarks/polish_repro.py <ladder_cache_dir>   # real artifact
  python benchmarks/polish_repro.py                      # synthetic twin

Also the 10k-bend LM postmortem bench: REPRO_DEBUG=1 prints per-LM-step
diagnostics (accept/reject, |dc|, CG residual, and a step-scale sweep that
separates "CG step is garbage" from "quadratic model breaks down"), and
REPRO_FUSE=N applies N proximity track-merge rounds first to reproduce the
post-fusion state where the refine loop's global BA froze (RMSE pinned at
1.1993 across rounds while reproj climbed 0.49->2.2px).

Synthetic twin: a Reconstruction with the same shape signature — few
points with VERY long tracks (600 physical blobs seen by thousands of
cameras -> mean track length ~180), which is the regime the ba_sweep
never covered (it used P=164k with 8-obs tracks). Goes through the REAL
build_problem (alignment, bucketing) and BAConfig the polish uses.

Env toggles for bisection:
  REPRO_CG=64 REPRO_ITERS=40       CG steps / LM iterations
  REPRO_C=10000 REPRO_P=5600 REPRO_O=1050000
  REPRO_NO_BIGNE=1                 disable fused_ne_payloads_big gate
  REPRO_NO_BIGMV=1                 disable the large-C coupling matvec
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_merged(C: int, P: int, O_target: int, seed: int = 0):
    """A merged-model twin: C cams on an orbit, P points, tracks whose
    lengths follow the 10k ladder's distribution (most points seen by a
    long contiguous arc of cameras)."""
    from sfm_tpu.scene.state import Reconstruction

    rng = np.random.default_rng(seed)
    # Track lengths: lognormal bulk clipped to [22, C*0.6], mean ~ O/P.
    mean_len = O_target / P
    raw = rng.lognormal(mean=np.log(mean_len), sigma=0.9, size=P)
    lengths = np.clip(raw, 8, int(C * 0.6)).astype(np.int64)
    lengths = np.maximum((lengths * (O_target / lengths.sum())).astype(np.int64), 4)

    ang = np.linspace(0, 2 * np.pi, C, endpoint=False)
    centers = np.stack([4.0 * np.cos(ang), 0.3 * np.sin(3 * ang), 4.0 * np.sin(ang)], 1)
    # Look-at-origin rotations (z forward).
    rvecs = np.zeros((C, 3), np.float32)
    for k in range(C):  # host-side; fine at 10k
        z = -centers[k] / np.linalg.norm(centers[k])
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 0)
        # rvec from R via scipy-free log map
        ct = np.clip((np.trace(R) - 1) / 2, -1, 1)
        th = np.arccos(ct)
        if th < 1e-8:
            rvecs[k] = 0
        else:
            w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
            rvecs[k] = th * w / (2 * np.sin(th))
    tvecs = np.einsum("kij,kj->ki", _exp_batch(rvecs), -centers).astype(np.float32)

    points = rng.uniform(-1.5, 1.5, (P, 3)).astype(np.float32)

    obs_point = np.repeat(np.arange(P, dtype=np.int32), lengths)
    # Contiguous camera arcs per point (orbit visibility), jittered start.
    starts = rng.integers(0, C, P)
    obs_image = np.concatenate([
        (starts[p] + np.arange(lengths[p])) % C for p in range(P)
    ]).astype(np.int32)
    O = len(obs_point)

    intr = np.tile([300.0, 300.0, 128.0, 128.0, 0.0, 0.0], (C, 1)).astype(np.float32)
    # Project for plausible uv (+noise): done in numpy, chunked.
    R_all = _exp_batch(rvecs)
    xc = np.einsum("oij,oj->oi", R_all[obs_image], points[obs_point]) + tvecs[obs_image]
    z = np.where(np.abs(xc[:, 2]) < 1e-6, 1e-6, xc[:, 2])
    uv = xc[:, :2] / z[:, None] * 300.0 + 128.0
    uv += rng.normal(0, 0.5, uv.shape)

    rec = Reconstruction(
        intrinsics=intr,
        rvecs=rvecs + rng.normal(0, 0.005, rvecs.shape).astype(np.float32),
        tvecs=tvecs + rng.normal(0, 0.01, tvecs.shape).astype(np.float32),
        registered=np.ones(C, bool),
        points=points + rng.normal(0, 0.01, points.shape).astype(np.float32),
        point_errors=np.zeros(P, np.float32),
        point_valid=np.ones(P, bool),
        obs_point=obs_point,
        obs_image=obs_image,
        obs_kp=np.zeros(O, np.int32),
        obs_uv=uv.astype(np.float32),
    )
    return rec


def _exp_batch(rvecs):
    th = np.linalg.norm(rvecs, axis=1, keepdims=True)
    th = np.where(th < 1e-12, 1e-12, th)
    k = rvecs / th
    K = np.zeros((len(rvecs), 3, 3), np.float32)
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    s = np.sin(th)[:, :, None]
    c = (1 - np.cos(th))[:, :, None]
    return (np.eye(3)[None] + s * K + c * np.einsum("kij,kjl->kil", K, K)).astype(np.float32)


def main():
    import jax

    from sfm_tpu.ba import build_problem
    from sfm_tpu.ba.core import bundle_adjust
    from sfm_tpu.config import BAConfig

    stage = os.environ.get("REPRO_STAGE", "merged_prepolish")
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]):
        from sfm_tpu.scene.artifacts import ArtifactStore
        rec = ArtifactStore(sys.argv[1]).load_reconstruction(stage=stage)
        print(f"loaded {stage}: {rec.num_registered} cams, "
              f"{rec.num_points} pts, {len(rec.obs_point)} obs")
    else:
        C = int(os.environ.get("REPRO_C", 10000))
        P = int(os.environ.get("REPRO_P", 5600))
        O = int(os.environ.get("REPRO_O", 1050000))
        rec = synthetic_merged(C, P, O)
        print(f"synthetic merged twin: C={C} P={P} O_target={O}")

    n_fuse = int(os.environ.get("REPRO_FUSE", 0))
    if n_fuse:
        from sfm_tpu.pipeline.merge import merge_tracks_by_proximity
        from sfm_tpu.scene.state import filter_observations
        for k in range(n_fuse):
            n = merge_tracks_by_proximity(rec, max_px=6.0, verbose=True)
            print(f"fuse round {k}: fused={n} pts={int(rec.point_valid.sum())}")
            if n == 0:
                break
        pre = filter_observations(rec, 32.0)  # _merged_polish's sanitation gate
        print(f"sanitation: dropped {pre} obs > 32px")

    if os.environ.get("REPRO_NO_BIGNE"):
        import sfm_tpu.ba.core as core
        core._use_fused_ne_big = lambda *a, **k: False
        print("fused_ne_payloads_big DISABLED")
    if os.environ.get("REPRO_NO_BIGMV"):
        from sfm_tpu.kernels import schur_spmv
        schur_spmv.matvec_tile_big = lambda *a, **k: 0
        print("large-C coupling matvec kernel DISABLED")

    cfg = BAConfig(
        max_iterations=int(os.environ.get("REPRO_ITERS", 40)),
        cg_iterations=int(os.environ.get("REPRO_CG", 64)),
        robust_loss="huber",
    )
    # tight=True mirrors _merged_polish's production build exactly.
    prob, cams, pids = build_problem(rec, tight=True)
    print(f"problem: C={prob.num_cameras} P={prob.num_points} "
          f"O={prob.obs_w.shape[0]} align={prob.point_align}", flush=True)

    if os.environ.get("REPRO_DEBUG"):
        _debug_steps(prob, cfg)
        return

    t0 = time.perf_counter()
    out, stats = bundle_adjust(prob, cfg)
    jax.block_until_ready(out.cam_params)
    t1 = time.perf_counter()
    print(f"OK: iters={int(stats.iterations)} cost {float(stats.initial_cost):.4f} "
          f"-> {float(stats.final_cost):.4f} in {t1 - t0:.1f}s "
          f"(incl. compile on first run)")


def _debug_steps(prob, cfg, n_steps: int | None = None):
    """Host-driven LM iterations with per-step diagnostics (the jitted
    while_loop hides why steps are rejected).

    Per step, besides the full-step cost, probes:
      - a step-scale sweep (alpha in {0.5, 0.1, 0.01}) — decreasing cost at
        small alpha but not alpha=1 means the CG step overshoots the valid
        region of the quadratic model (damping/CG-quality problem), while
        increasing cost at EVERY alpha means the step is not even a descent
        direction (normal equations / preconditioner / matvec bug);
      - point-only (alpha*dp, dc=0) — whether back-substitution alone helps.
    """
    import jax
    import jax.numpy as jnp

    from sfm_tpu.ba import core

    if n_steps is None:
        n_steps = int(os.environ.get("REPRO_DEBUG_STEPS", 4))
    lam = float(cfg.initial_lambda)
    cams, pts = prob.cam_params, prob.points
    cost = float(core.compute_cost(prob, cams, pts, cfg))
    print(f"initial cost {cost:.6f}")
    inv = core._solve_invariants(prob, cams, cfg, None)
    for it in range(n_steps):
        ne = core.build_normal_equations(prob, cams, pts, jnp.asarray(lam), cfg, inv=inv)
        rhs = core._schur_rhs(ne, prob)
        dc = core._pcg(ne, prob, rhs, cfg)
        dp = core._back_substitute(ne, prob, dc)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)
        dp = jnp.where(prob.point_fixed[:, None], 0.0, dp)
        resid = core._schur_matvec(ne, prob, dc) - rhs
        new_cost = float(core.compute_cost(prob, cams + dc, pts + dp, cfg))
        sweep = {
            a: float(core.compute_cost(prob, cams + a * dc, pts + a * dp, cfg))
            for a in (0.5, 0.1, 0.01)
        }
        dp_only = float(core.compute_cost(prob, cams, pts + dp, cfg))
        print(f"it{it}: lam={lam:.2e} cost={cost:.6f} new={new_cost:.6f} "
              f"|dc|={float(jnp.linalg.norm(dc)):.3e} |dp|={float(jnp.linalg.norm(dp)):.3e} "
              f"nan(dc)={int(jnp.isnan(dc).sum())} nan(dp)={int(jnp.isnan(dp).sum())} "
              f"|rhs|={float(jnp.linalg.norm(rhs)):.3e} "
              f"cg_rel={float(jnp.linalg.norm(resid) / (jnp.linalg.norm(rhs) + 1e-20)):.3e}")
        print(f"     sweep: " + " ".join(f"a={a}:{c:.6f}" for a, c in sweep.items())
              + f" dp_only:{dp_only:.6f}", flush=True)
        if new_cost < cost:
            cams, pts, cost = cams + dc, pts + dp, new_cost
            lam = max(lam / cfg.lambda_down, cfg.min_lambda)
        else:
            lam = min(lam * cfg.lambda_up, cfg.max_lambda)


if __name__ == "__main__":
    main()
