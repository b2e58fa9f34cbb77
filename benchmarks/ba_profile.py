"""BA sub-stage profiler (axon-aware: fresh inputs, host-forced timing).

    python benchmarks/ba_profile.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _make_ba_problem
    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba import core

    cfg = BAConfig(max_iterations=20, cg_iterations=16, function_tolerance=0.0, robust_loss="huber")
    lam = jnp.asarray(1e-3, jnp.float32)

    @jax.jit
    def ne_only(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        return ne.bc, ne.bp, ne.M_inv, ne.W

    @jax.jit
    def pcg_only(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        rhs = core._schur_rhs(ne, p)
        dc = core._pcg(ne, p, rhs, cfg)
        return jnp.sum(dc)

    def timed(name, fn):
        out = fn(_make_ba_problem(1))
        _ = np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(_make_ba_problem(2))
        _ = np.asarray(jax.tree.leaves(out)[0])
        print(f"{name}: {(time.perf_counter() - t0) * 1000:.1f} ms", flush=True)

    @jax.jit
    def matvec16(p):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        rhs = core._schur_rhs(ne, p)
        def body(_, v):
            return core._schur_matvec(ne, p, v) / (jnp.linalg.norm(v) + 1e-20)
        return jnp.sum(jax.lax.fori_loop(0, 16, body, rhs))

    timed("normal_eq (resid+jac+segsums+Minv)", ne_only)
    timed("normal_eq + 16 matvecs", matvec16)
    timed("normal_eq + 16-iter PCG", pcg_only)


if __name__ == "__main__":
    main()
