"""TPU-side parity + compile proof for the two-level coupling matvec
(VERDICT r4 next #1).

The round-4 rewrite (commit 1f83e8c) replaced the flat [C,T] camera one-hot
with two-level indexing ([L,T] lo one-hot + hi-mask accumulate), extending
the in-kernel coupling matvec from C<=2048 to C<=16384. The OLD fori_loop
composition crashed the remote TPU compiler at C=4096; this script proves
on the real chip that the rewrite (a) compiles, (b) matches the XLA
reference matvec to fp32 tolerance, and (c) full-solve parity holds
(kernels on vs SFM_TPU_BA_DISABLE_KERNELS) across the extended range,
including C=10240 — the 10k-flagship polish camera count.

    python benchmarks/matvec_parity.py [C ...]     (default 2304 4096 10240 16384)

Appends one JSON line per C to benchmarks/matvec_parity.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(seed, C, P, obs_per):
    import jax.numpy as jnp
    from sfm_tpu.ba.problem import BAProblem

    rng = np.random.default_rng(seed)
    O = P * obs_per
    obs_point = np.repeat(np.arange(P, dtype=np.int32), obs_per)
    return BAProblem(
        cam_params=jnp.asarray(np.concatenate(
            [rng.normal(0, 0.1, (C, 3)),
             rng.normal(0, 1.0, (C, 3)) + [0, 0, 4]], 1).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile([800.0, 800, 512, 384, 0, 0], (C, 1)).astype(np.float32)),
        points=jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32)),
        obs_cam=jnp.asarray(rng.integers(0, C, O).astype(np.int32)),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.uniform(0, 1024, (O, 2)).astype(np.float32)),
        obs_w=jnp.ones(O, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        point_fixed=jnp.zeros(P, bool),
        point_align=256,
    )


def run_one(C):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba import core
    from sfm_tpu.kernels import schur_spmv

    # O scales with C but is capped to keep the sweep under a few minutes.
    P = min(C * 16, 131072)
    obs_per = 8
    O = P * obs_per
    tile = schur_spmv.matvec_tile(C, 256)
    print(f"C={C} P={P} O={O} tile={tile}", flush=True)
    assert tile > 0 and O % tile == 0

    cfg = BAConfig(robust_loss="huber", max_iterations=2, cg_iterations=8,
                   dense_schur_max_cameras=0)
    prob = make_problem(0, C, P, obs_per)
    lam = jnp.asarray(1e-3, jnp.float32)

    # The NE build must happen INSIDE the jit: _NormalEq.mv_tile is a
    # trace-time Python int (the static kernel gate), and round-tripping
    # the ne pytree through a jit boundary would turn it into a tracer.
    def build_ne(p, use_kernel):
        ne = core.build_normal_equations(p, p.cam_params, p.points, lam, cfg)
        if not use_kernel:
            ne = ne._replace(mv_tile=0, mv_big_tile=0)
        return ne

    @partial(jax.jit, static_argnames=("use_kernel",))
    def mv_once(p, v0, use_kernel):
        ne = build_ne(p, use_kernel)
        return core._schur_matvec(ne, p, v0, use_kernel=use_kernel)

    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))

    t0 = time.perf_counter()
    y_k = np.asarray(mv_once(prob, v, True))
    compile_s = time.perf_counter() - t0
    y_r = np.asarray(mv_once(prob, v, False))
    scale = max(np.abs(y_r).max(), 1.0)
    rel = float(np.abs(y_k - y_r).max() / scale)
    print(f"  matvec rel err {rel:.2e} (compile {compile_s:.1f}s)", flush=True)
    assert rel < 3e-5, rel

    # Timing: 16 matvecs inside one jit (amortizes the tunnel).
    @partial(jax.jit, static_argnames=("use_kernel",))
    def mv16(p, v0, use_kernel):
        ne = build_ne(p, use_kernel)

        def body(_, x):
            return core._schur_matvec(ne, p, x, use_kernel=use_kernel) / (
                jnp.linalg.norm(x) + 1e-20)
        return jnp.sum(jax.lax.fori_loop(0, 16, body, v0))

    times = {}
    for name, uk in (("kernel", True), ("xla", False)):
        fn = lambda v0, uk=uk: mv16(prob, v0, uk)
        _ = np.asarray(fn(v))
        ts = []
        for r in range(3):
            vv = jnp.asarray(np.random.default_rng(r).normal(size=(C, 6)).astype(np.float32))
            jax.block_until_ready(vv)
            t0 = time.perf_counter()
            _ = np.asarray(fn(vv))
            ts.append((time.perf_counter() - t0) / 16 * 1000)
        times[name] = sorted(ts)[1]
        print(f"  {name} matvec: {times[name]:.2f} ms", flush=True)

    # Full-solve parity: kernels on vs all off (same problem, same config).
    out_k, st_k = core.bundle_adjust(make_problem(1, C, P, obs_per), cfg)
    ck = float(st_k.final_cost)
    os.environ["SFM_TPU_BA_DISABLE_KERNELS"] = "1"
    try:
        out_r, st_r = core.bundle_adjust(make_problem(1, C, P, obs_per), cfg)
    finally:
        del os.environ["SFM_TPU_BA_DISABLE_KERNELS"]
    cr = float(st_r.final_cost)
    dp = float(np.abs(np.asarray(out_k.cam_params) - np.asarray(out_r.cam_params)).max())
    cost_rel = abs(ck - cr) / max(abs(cr), 1e-12)
    print(f"  solve parity: cost {ck:.6g} vs {cr:.6g} (rel {cost_rel:.2e}), "
          f"max param delta {dp:.2e}", flush=True)
    assert cost_rel < 1e-3, (ck, cr)
    assert dp < 5e-3, dp

    return dict(C=C, P=P, O=O, tile=tile,
                matvec_rel_err=rel,
                matvec_kernel_ms=round(times["kernel"], 3),
                matvec_xla_ms=round(times["xla"], 3),
                solve_cost_rel=cost_rel, solve_param_delta=dp,
                backend="tpu", ok=True)


def main():
    import jax

    assert jax.default_backend() == "tpu", "parity proof must run on the real chip"
    Cs = [int(a) for a in sys.argv[1:]] or [2304, 4096, 10240, 16384]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matvec_parity.jsonl")
    for C in Cs:
        row = run_one(C)
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    print("all OK", flush=True)


if __name__ == "__main__":
    main()
