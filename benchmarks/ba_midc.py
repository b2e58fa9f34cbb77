"""Mid-C BA phase profiler (VERDICT r3 next #4): where do LM iterations go
at C=1024..4096, O=1-4M — NE build, preconditioner, CG matvecs, or epilogue?

    python benchmarks/ba_midc.py [C] [P] [obs_per_point]

Times each phase separately (fresh inputs per timed call, host-forced), then
a full fixed-iteration bundle_adjust for the end-to-end number. Appends to
benchmarks/ba_midc.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(seed, C, P, obs_per):
    import jax.numpy as jnp
    from sfm_tpu.ba.problem import BAProblem

    rng = np.random.default_rng(seed)
    O = P * obs_per
    obs_point = np.repeat(np.arange(P, dtype=np.int32), obs_per)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    return BAProblem(
        cam_params=jnp.asarray(np.concatenate([rng.normal(0, 0.1, (C, 3)),
                                               rng.normal(0, 1.0, (C, 3)) + [0, 0, 4]], 1).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile([800.0, 800, 512, 384, 0, 0], (C, 1)).astype(np.float32)),
        points=jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.uniform(0, 1024, (O, 2)).astype(np.float32)),
        obs_w=jnp.ones(O, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        point_fixed=jnp.zeros(P, bool),
        point_align=256,
    )


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

    @jax.jit
    def cost_only(p):
        return core.compute_cost(p, p.cam_params, p.points, cfg)

    @jax.jit
    def ne_only(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        return ne.bc, ne.bp, ne.M_inv

    @jax.jit
    def matvec16(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        rhs = core._schur_rhs(ne, p)
        def body(_, v):
            return core._schur_matvec(ne, p, v) / (jnp.linalg.norm(v) + 1e-20)
        return jnp.sum(jax.lax.fori_loop(0, 16, body, rhs))

    @jax.jit
    def pcg_only(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        rhs = core._schur_rhs(ne, p)
        dc = core._pcg(ne, p, rhs, cfg)
        return jnp.sum(dc)

    def timed(name, fn, reps=3):
        out = fn(make_problem(0, C, P, obs_per))
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for r in range(reps):
            p = make_problem(r + 1, C, P, obs_per)
            jax.block_until_ready(p.obs_uv)
            t0 = time.perf_counter()
            out = fn(p)
            _ = np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med * 1000:.1f} ms  (all: {[round(t*1e3) for t in ts]})", flush=True)
        return med

    print(f"C={C} P={P} O={O}", flush=True)
    phases = {
        "cost": timed("cost only", cost_only),
        "ne": timed("NE build (resid+jac+segsums+Minv)", ne_only),
        "ne_mv16": timed("NE + 16 matvecs", matvec16),
        "ne_pcg": timed("NE + 16-iter PCG", pcg_only),
    }

    from sfm_tpu.ba.core import bundle_adjust
    out, _ = bundle_adjust(make_problem(0, C, P, obs_per), cfg)
    _ = np.asarray(out.cam_params)
    t0 = time.perf_counter()
    out, stats = bundle_adjust(make_problem(9, C, P, obs_per), cfg)
    _ = np.asarray(out.cam_params)
    dt = time.perf_counter() - t0
    phases["lm_iters_per_sec"] = cfg.max_iterations / dt
    print(f"full LM: {cfg.max_iterations / dt:.2f} iters/s", flush=True)

    row = dict(C=C, P=P, O=O, **{k: round(v, 4) for k, v in phases.items()},
               backend=jax.default_backend())
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "ba_midc.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
