"""NE-build / LM-epilogue sub-phase profiler (VERDICT r3 next #4 follow-up).

ba_midc.py showed WHERE an LM iteration goes at the phase level (NE build,
matvecs, cost). This drills one level down: which INDIVIDUAL ops inside the
NE build, the cost evaluation, and the epilogue carry the time — the usual
suspects are lane-padded [O, k] intermediates (k < 128 pads to 128 lanes on
TPU, an 8-40x traffic expansion at O >= 2^20).

    python benchmarks/ne_phase.py [C] [P] [obs_per]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ba_midc import make_problem  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba import core

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    P = int(sys.argv[2]) if len(sys.argv) > 2 else C * 128
    obs_per = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    O = P * obs_per
    cfg = BAConfig(max_iterations=20, cg_iterations=16, function_tolerance=0.0,
                   robust_loss="huber")
    lam = jnp.asarray(1e-3, jnp.float32)

    p0 = make_problem(0, C, P, obs_per)
    inv = jax.jit(lambda p: core._solve_invariants(p, p.cam_params, cfg, None))(p0)
    print(f"C={C} P={P} O={O} mv_tile={inv.mv_tile} mv_big={inv.mv_big_tile}", flush=True)

    def timed(name, fn, reps=3):
        out = fn(make_problem(0, C, P, obs_per))
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts = []
        for r in range(reps):
            p = make_problem(r + 1, C, P, obs_per)
            jax.block_until_ready(p.obs_uv)
            t0 = time.perf_counter()
            out = fn(p)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:42s}: {med * 1000:7.1f} ms  (all: {[round(t*1e3) for t in ts]})", flush=True)
        return med

    from sfm_tpu.kernels import schur_spmv

    # --- NE-build sub-phases -------------------------------------------------
    @jax.jit
    def ph_obs_depths(p):
        return core._obs_depths(p, p.cam_params, p.points)

    @jax.jit
    def ph_pts_gather(p):
        return jnp.take(p.points.T, p.obs_point, axis=1)

    @jax.jit
    def ph_fused_ne(p):
        st = core._ne_static_misc(p)
        pts_t = jnp.concatenate([jnp.take(p.points.T, p.obs_point, axis=1),
                                 jnp.zeros((1, O), jnp.float32)], 0)
        pad = jnp.zeros((C, 2), jnp.float32)
        if C <= schur_spmv._MAX_CAMS:
            return schur_spmv.fused_ne_payloads(
                p.obs_cam, pts_t, st,
                jnp.concatenate([p.cam_params, pad], 1),
                jnp.concatenate([p.intrinsics, pad], 1),
                C, cfg.robust_loss, cfg.robust_scale_px)
        cams_t = jnp.concatenate([p.cam_params, pad], 1).T[:, p.obs_cam]
        intr_t = jnp.concatenate([p.intrinsics, pad], 1).T[:, p.obs_cam]
        return schur_spmv.fused_ne_payloads_big(
            pts_t, st, cams_t, intr_t, cfg.robust_loss, cfg.robust_scale_px)

    @jax.jit
    def ph_ne_full(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg, inv=inv)
        return ne.bc, ne.bp, ne.M_inv

    @jax.jit
    def ph_point_segsum(p):
        vals = jnp.broadcast_to(p.obs_uv[:, :1], (O, 9)) * 0.5
        return jax.ops.segment_sum(vals, p.obs_point, P)

    @jax.jit
    def ph_point_bounds_cumsum(p):
        vals = jnp.broadcast_to(p.obs_uv[:, :1], (O, 9)) * 0.5
        return core._point_reduce(vals, p, inv.bounds, None)

    @jax.jit
    def ph_hinv_gather_rowmajor(p):
        Hpp_inv = jnp.broadcast_to(jnp.eye(3)[None], (P, 3, 3))
        return Hpp_inv.reshape(P, 9)[p.obs_point].T

    @jax.jit
    def ph_hinv_gather_featmajor(p):
        Hpp_inv = jnp.broadcast_to(jnp.eye(3)[None], (P, 3, 3))
        return jnp.take(Hpp_inv.reshape(P, 9).T, p.obs_point, axis=1)

    @jax.jit
    def ph_whw(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg, inv=inv)
        w_t = ne.w_t if ne.w_t is not None else ne.W.reshape(O, 18).T
        hinv_t = ne.Hpp_inv.reshape(P, 9)[p.obs_point].T
        if C <= schur_spmv._MAX_CAMS:
            return schur_spmv.whw_cam_reduce(w_t, hinv_t, p.obs_cam, C)
        pay = schur_spmv.whw_payloads_big(w_t, hinv_t)
        return core._cam_reduce_sorted(pay.T, inv.cam_perm, inv.cam_bounds)

    # --- epilogue / cost -----------------------------------------------------
    def _ne(p):
        return core.build_normal_equations(p, p.cam_params, p.points, lam, cfg, inv=inv)

    @jax.jit
    def ph_rhs(p):
        ne = _ne(p)
        return core._schur_rhs(ne, p)

    @jax.jit
    def ph_backsub(p):
        ne = _ne(p)
        return core._back_substitute(ne, p, ne.bc)

    @jax.jit
    def ph_matvec1(p):
        ne = _ne(p)
        return core._schur_matvec(ne, p, ne.bc)

    zf = jnp.asarray(0.001, jnp.float32)

    @jax.jit
    def ph_cost_plain(p):
        return core.compute_cost(p, p.cam_params, p.points, cfg)

    @jax.jit
    def ph_cost_zfloor(p):
        return core.compute_cost(p, p.cam_params, p.points, cfg, z_floor=zf)

    ne_med = timed("NE full (build_normal_equations)", ph_ne_full)
    fused_med = timed("  fused NE kernel (+gathers)", ph_fused_ne)
    timed("  pts_t gather [3,O]", ph_pts_gather)
    timed("  point segsum [O,9] (scatter)", ph_point_segsum)
    timed("  point bounds-cumsum [O,9]", ph_point_bounds_cumsum)
    timed("  hinv gather row-major -> [9,O]", ph_hinv_gather_rowmajor)
    timed("  hinv gather feat-major [9,O]", ph_hinv_gather_featmajor)
    timed("  WHW preconditioner reduce", ph_whw)
    timed("obs_depths (z gate)", ph_obs_depths)
    timed("NE + rhs", ph_rhs)
    timed("NE + backsub", ph_backsub)
    timed("NE + 1 matvec", ph_matvec1)
    timed("cost (no z-floor)", ph_cost_plain)
    timed("cost (with z-floor)", ph_cost_zfloor)
    print(f"[NE full {ne_med*1e3:.0f} ms, kernel+gathers {fused_med*1e3:.0f} ms]",
          flush=True)


if __name__ == "__main__":
    main()
