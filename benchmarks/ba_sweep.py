"""BA LM throughput across camera counts (VERDICT r2 item #5: the fused
kernels previously vanished past C=2048 — measure the small-C one-hot
kernels AND the large-C pre-gathered/camera-sorted path).

    python benchmarks/ba_sweep.py [C1,C2,...]

Appends rows to benchmarks/ba_sweep.jsonl. Problems are device-generated,
point-sorted and tile-aligned (kernels engage where gated); timed calls use
fresh inputs (the Axon runtime memoizes identical (executable, inputs)).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(C, seed, obs_per_pt=8, pts_per_cam=128):
    import jax.numpy as jnp
    from sfm_tpu.ba.problem import BAProblem

    P = C * pts_per_cam
    O = P * obs_per_pt
    rng = np.random.default_rng(seed)
    obs_point = np.repeat(np.arange(P, dtype=np.int32), obs_per_pt)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    return BAProblem(
        cam_params=jnp.asarray(np.concatenate([
            rng.normal(0, 0.1, (C, 3)), rng.normal(0, 1.0, (C, 3)) + [0, 0, 4]
        ], 1).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile([800.0, 800, 512, 384, 0, 0], (C, 1)).astype(np.float32)),
        points=jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.uniform(0, 1024, (O, 2)).astype(np.float32)),
        obs_w=jnp.ones(O, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        point_fixed=jnp.zeros(P, bool),
        point_align=256,  # 8-long segments at 8-aligned offsets
    )


def main():
    cams = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "128,1024,4096").split(",")]
    ppc = int(os.environ.get("SWEEP_PTS_PER_CAM", "128"))
    import jax
    from sfm_tpu.config import BAConfig
    from sfm_tpu.ba.core import bundle_adjust

    cfg = BAConfig(max_iterations=20, cg_iterations=16, function_tolerance=0.0,
                   robust_loss="huber", dense_schur_max_cameras=0)
    rows = []
    for C in cams:
        prob = make_problem(C, seed=1, pts_per_cam=ppc)
        t0 = time.perf_counter()
        out, _ = bundle_adjust(prob, cfg)
        np.asarray(out.cam_params)
        t_compile = time.perf_counter() - t0
        prob2 = make_problem(C, seed=2, pts_per_cam=ppc)
        t0 = time.perf_counter()
        out, stats = bundle_adjust(prob2, cfg)
        np.asarray(out.cam_params)
        dt = time.perf_counter() - t0
        it = max(int(stats.iterations), 1)
        row = {
            "C": C, "P": C * ppc, "O": C * ppc * 8, "cg": cfg.cg_iterations,
            "lm_iters_per_sec": round(it / dt, 2), "iters": it,
            "run_s": round(dt, 2), "compile_plus_first_s": round(t_compile, 1),
            "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "ba_sweep.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
