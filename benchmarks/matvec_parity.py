"""TPU-side parity + compile proof for the two-level coupling matvec
(VERDICT r4 next #1).

The round-4 rewrite (commit 1f83e8c) replaced the flat [C,T] camera one-hot
with two-level indexing ([L,T] lo one-hot + hi-mask accumulate), extending
the in-kernel coupling matvec from C<=2048 to C<=16384. The OLD fori_loop
composition crashed the remote TPU compiler at C=4096; this script proves
on the real chip that the rewrite (a) compiles at every extended scale,
(b) matches the XLA feature-major reference to fp32 tolerance (which also
covers the reduce_precision fix for XLA's excess-precision folding of the
wrapper's 3-term bf16 split — see schur_coupling_matvec), and (c) a full
kernel-on bundle_adjust runs at C=10240 — the 10k-flagship polish camera
count — with finite, non-increasing cost.

Remote-compile economy: every fresh program costs minutes in bad tunnel
weather, so parity is asserted at the KERNEL level (one pallas program +
one XLA reference program per C) and the full-LM proof compiles once.

    python benchmarks/matvec_parity.py [C ...]     (default 2304 4096 10240 16384)
    MATVEC_PARITY_SOLVE=0 disables the final bundle_adjust proof.

Appends one JSON line per C to benchmarks/matvec_parity.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 512
# O stays small: each (C, O) pair is a fresh ~5-10 min remote compile in bad
# tunnel weather, correctness coverage comes from C (n_hi blocks), and the
# measured steady-state ms at O=8192 is noted as small-O in the log.
O = 8192             # observations per case; multiple of TILE
OBS_PER = 8          # aligned segment length (point_align certificate)


def make_arrays(seed, C):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    P = O // OBS_PER
    obs_point = np.repeat(np.arange(P, dtype=np.int32), OBS_PER)
    op = obs_point.reshape(O // TILE, TILE)
    lids = jnp.asarray((op - op[:, :1]).reshape(O))
    hs = rng.normal(size=(O, 9)).astype(np.float32)
    return dict(
        obs_cam=jnp.asarray(rng.integers(0, C, O).astype(np.int32)),
        obs_point=jnp.asarray(obs_point),
        lids=lids,
        w_t=jnp.asarray(rng.normal(size=(18, O)).astype(np.float32)),
        hinv_t=jnp.asarray(hs.T),
        v=jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32)),
        P=P,
    )


def xla_ref(a, C):
    """Feature-major XLA coupling matvec (the product's large-C fallback
    shape: no [O,6,3] materialization)."""
    import jax
    import jax.numpy as jnp
    from sfm_tpu.ba.core import _wt_apply, _wt_apply_T

    @jax.jit
    def f(obs_cam, obs_point, w_t, hinv_t, v):
        x_t = v.T[:, obs_cam]                                   # [6, O]
        u_t = _wt_apply_T(w_t, x_t)                             # [3, O]
        g = jax.ops.segment_sum(u_t.T, obs_point, a["P"])       # [P, 3]
        g_t = g.T[:, obs_point]                                 # [3, O]
        Hm = hinv_t.reshape(3, 3, w_t.shape[1])
        h_t = jnp.einsum("klo,lo->ko", Hm, g_t)                 # [3, O]
        y_t = _wt_apply(w_t, h_t)                               # [6, O]
        return jax.ops.segment_sum(y_t.T, obs_cam, C)           # [C, 6]

    return f(a["obs_cam"], a["obs_point"], a["w_t"], a["hinv_t"], a["v"])


def run_one(C):
    from sfm_tpu.kernels import schur_spmv

    tile = schur_spmv.matvec_tile(C, OBS_PER)
    print(f"C={C} O={O} tile={tile} "
          f"L={schur_spmv._matvec_lo_width(C)}", flush=True)
    assert tile == TILE and O % tile == 0

    a = make_arrays(0, C)
    t0 = time.perf_counter()
    y_k = np.asarray(schur_spmv.schur_coupling_matvec(
        a["obs_cam"], a["lids"], a["w_t"], a["hinv_t"], a["v"], tile=tile))
    t_kernel = time.perf_counter() - t0
    print(f"  kernel compiled+ran in {t_kernel:.1f}s", flush=True)

    t0 = time.perf_counter()
    y_r = np.asarray(xla_ref(a, C))
    t_ref = time.perf_counter() - t0
    scale = max(np.abs(y_r).max(), 1.0)
    rel = float(np.abs(y_k - y_r).max() / scale)
    print(f"  rel err {rel:.2e} (ref {t_ref:.1f}s)", flush=True)
    assert rel < 3e-5, rel

    # Steady-state timing: 8 repeat calls on resident inputs (compile done).
    import jax
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(schur_spmv.schur_coupling_matvec(
            a["obs_cam"], a["lids"], a["w_t"], a["hinv_t"], a["v"], tile=tile))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1000
    print(f"  kernel matvec {ms:.2f} ms (O={O})", flush=True)
    return dict(C=C, O=O, tile=tile, rel_err=rel, kernel_ms=round(ms, 3),
                compile_s=round(t_kernel, 1), backend="tpu", ok=True)


def run_solve_proof(C=10240):
    """Full kernel-on LM at the flagship polish camera count: the entire
    while_loop program (NE kernels + two-level matvec + epilogue) must
    compile and converge."""
    import jax.numpy as jnp
    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba import core
    from sfm_tpu.ba.problem import BAProblem

    rng = np.random.default_rng(7)
    P = C * 8
    Osolve = P * 8
    obs_point = np.repeat(np.arange(P, dtype=np.int32), 8)
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    prob = BAProblem(
        cam_params=jnp.asarray(np.concatenate(
            [rng.normal(0, 0.1, (C, 3)),
             rng.normal(0, 1.0, (C, 3)) + [0, 0, 4]], 1).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile([800.0, 800, 512, 384, 0, 0], (C, 1)).astype(np.float32)),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(rng.integers(0, C, Osolve).astype(np.int32)),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.uniform(0, 1024, (Osolve, 2)).astype(np.float32)),
        obs_w=jnp.ones(Osolve, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        point_fixed=jnp.zeros(P, bool),
        point_align=256,
    )
    cfg = BAConfig(max_iterations=3, cg_iterations=8, robust_loss="huber",
                   dense_schur_max_cameras=0)
    t0 = time.perf_counter()
    out, stats = core.bundle_adjust(prob, cfg)
    ci, cf = float(stats.initial_cost), float(stats.final_cost)
    dt = time.perf_counter() - t0
    print(f"solve C={C} O={Osolve}: cost {ci:.4g} -> {cf:.4g} in {dt:.0f}s "
          f"(incl. compile)", flush=True)
    assert np.isfinite(cf) and cf <= ci
    assert np.isfinite(np.asarray(out.cam_params)).all()
    return dict(C=C, O=Osolve, solve_cost_initial=ci, solve_cost_final=cf,
                solve_s=round(dt, 1), backend="tpu", ok=True, kind="solve")


def main():
    import jax

    assert jax.default_backend() == "tpu", "parity proof must run on the real chip"
    Cs = [int(x) for x in sys.argv[1:]] or [2304, 4096, 10240, 16384]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matvec_parity.jsonl")
    for C in Cs:
        row = run_one(C)
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    if os.environ.get("MATVEC_PARITY_SOLVE", "1") != "0":
        row = run_solve_proof()
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    print("all OK", flush=True)


if __name__ == "__main__":
    main()
