"""Pinpoint the non-finite tensor in the 10k post-fusion normal equations.

The refine loop's global BA freezes because every LM step is NaN
(polish_repro REPRO_DEBUG on the post-fusion model: nan(dc)=59994 — every
free camera). rhs is finite, so the poison enters between NE assembly and
PCG. This probe builds the NE once and reports, per tensor, the count of
non-finite entries plus the scale extremes that would explain fp32
overflow (per-camera Schur diagonal, per-obs depth z).

    python benchmarks/ne_probe.py benchmarks/.ladder_cache_10000_256_vocab_tree
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(name, arr):
    a = np.asarray(arr)
    n_nan = int(np.isnan(a).sum())
    n_inf = int(np.isinf(a).sum())
    fin = a[np.isfinite(a)]
    mx = float(np.abs(fin).max()) if fin.size else float("nan")
    print(f"{name:12s} shape={a.shape} nan={n_nan} inf={n_inf} max|finite|={mx:.3e}")
    return n_nan + n_inf


def main():
    import jax.numpy as jnp

    from sfm_tpu.ba import build_problem, core
    from sfm_tpu.config import BAConfig
    from sfm_tpu.pipeline.merge import merge_tracks_by_proximity
    from sfm_tpu.scene.artifacts import ArtifactStore
    from sfm_tpu.scene.state import filter_observations

    rec = ArtifactStore(sys.argv[1]).load_reconstruction(
        stage=os.environ.get("REPRO_STAGE", "reconstruction"))
    if int(os.environ.get("REPRO_FUSE", 1)):
        merge_tracks_by_proximity(rec, max_px=6.0, verbose=True)
        filter_observations(rec, 32.0)
    cfg = BAConfig()
    prob, _, _ = build_problem(rec, tight=True)
    print(f"problem: C={prob.num_cameras} P={prob.num_points} O={prob.obs_w.shape[0]}")

    # Depth extremes: the fused/averaged 3D positions can land near or behind
    # far-arc camera planes; z -> 0 explodes the Jacobians (f*x/z^2).
    import jax

    from sfm_tpu.geometry.rotations import so3_exp

    cams = np.asarray(prob.cam_params)
    pts = np.asarray(prob.points)
    w = np.asarray(prob.obs_w)
    oc, op = np.asarray(prob.obs_cam), np.asarray(prob.obs_point)
    R = np.asarray(jax.vmap(so3_exp)(jnp.asarray(cams[:, :3])))
    xc = np.einsum("oij,oj->oi", R[oc], pts[op]) + cams[oc, 3:6]
    z = xc[:, 2]
    live = w > 0
    print(f"depth z over weighted obs: min={z[live].min():.3e} "
          f"p0.1={np.percentile(z[live], 0.1):.3e} "
          f"neg={(z[live] <= 0).sum()} of {live.sum()} "
          f"|z|<1e-2={(np.abs(z[live]) < 1e-2).sum()}")

    if int(os.environ.get("PROBE_ZGATE", 1)):
        # Same cheirality/near-plane weight gate bundle_adjust_impl applies.
        z0j = core._obs_depths(prob, prob.cam_params, prob.points)
        w_sum = jnp.sum(prob.obs_w)
        z_rms = jnp.sqrt(jnp.sum(prob.obs_w * z0j * z0j) / jnp.maximum(w_sum, 1.0))
        z_floor = 1e-3 * jnp.maximum(z_rms, 1e-9)
        w_new = jnp.where(z0j > z_floor, prob.obs_w, 0.0)
        print(f"z-gate: floor={float(z_floor):.3e} "
              f"zeroed={int((w_new == 0).sum() - (prob.obs_w == 0).sum())} obs")
        prob = prob._replace(obs_w=w_new)

    inv = core._solve_invariants(prob, prob.cam_params, cfg, None)
    lam = jnp.asarray(1e-3, jnp.float32)
    ne = core.build_normal_equations(prob, prob.cam_params, prob.points, lam, cfg, inv=inv)
    bad = 0
    bad += report("Hcc", ne.Hcc)
    bad += report("Hpp_inv", ne.Hpp_inv)
    bad += report("bc", ne.bc)
    bad += report("bp", ne.bp)
    bad += report("M_inv", ne.M_inv)
    if ne.W is not None:
        bad += report("W", ne.W)
    if ne.w_t is not None:
        bad += report("w_t", ne.w_t)
    if ne.hinv_t is not None:
        bad += report("hinv_t", ne.hinv_t)

    # The Schur diagonal M = Hcc_d - diag(W Hpp_inv W^T) cancels
    # catastrophically when both operands are huge: rebuild it the way
    # build_normal_equations does and report its diagonal extremes.
    rhs = core._schur_rhs(ne, prob)
    bad += report("rhs", rhs)
    v = rhs / jnp.maximum(jnp.linalg.norm(rhs), 1e-20)
    sv = core._schur_matvec(ne, prob, v)
    bad += report("S@v", sv)
    z0 = jnp.einsum("cij,cj->ci", ne.M_inv, rhs)
    bad += report("Minv@rhs", z0)

    # Scaled-CG iteration-0 anatomy: why would _pcg freeze immediately?
    d = ne.sdiag
    report("sdiag", d)
    dmin, dmax = float(d.min()), float(d.max())
    print(f"sdiag min={dmin:.3e} max={dmax:.3e}")
    dinv = 1.0 / d
    b = dinv * rhs
    report("b_scaled", b)
    p = d * jnp.einsum("cij,cj->ci", ne.M_inv, d * b)
    report("p0", p)
    Ap = dinv * core._schur_matvec(ne, prob, dinv * p)
    report("Ap0", Ap)
    pAp = float(jnp.sum(p * Ap))
    rz = float(jnp.sum(b * p))
    print(f"pAp0={pAp:.6e} rz0={rz:.6e}")
    print("VERDICT:", "POISONED" if bad else "all finite")


if __name__ == "__main__":
    main()
