"""Probe: where does the BA compile time explode past C=2048?

Round-2 observation (partition.py): the merged-polish BA compiled in tens
of seconds at C<=2048, >15 min at C=4096, and crashed the remote compiler
at C~16k. This probe times jit lowering+compile of bundle_adjust (and its
pieces) across C to find the superlinear term.

Usage: JAX_PLATFORMS=cpu python benchmarks/compile_probe.py [piece ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import BAProblem


def make_problem(C, obs_per_cam=100, pts_per_cam=8):
    P = C * pts_per_cam
    O = C * obs_per_cam
    O = -(-O // 1024) * 1024
    rng = np.random.default_rng(0)
    obs_point = np.sort(rng.integers(0, P, O)).astype(np.int32)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    return BAProblem(
        cam_params=jnp.zeros((C, 6), jnp.float32),
        intrinsics=jnp.tile(jnp.asarray([400, 400, 256, 256, 0, 0], jnp.float32), (C, 1)),
        points=jnp.asarray(rng.normal(size=(P, 3)), jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(rng.normal(size=(O, 2)) * 100 + 256, jnp.float32),
        obs_w=jnp.ones(O, jnp.float32),
        cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        point_fixed=jnp.zeros(P, bool),
        point_align=0,
    )


def time_compile(label, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"  {label:30s} lower {t1-t0:7.2f}s  compile {t2-t1:7.2f}s")


def main():
    import os

    pieces = sys.argv[1:] or ["full", "inv", "ne", "pcg"]
    from sfm_tpu.ba import core

    cg = int(os.environ.get("PROBE_CG", "8"))
    opc = int(os.environ.get("PROBE_OBS_PER_CAM", "100"))
    lm_iters = int(os.environ.get("PROBE_LM", "4"))
    cams = [int(c) for c in os.environ.get("PROBE_C", "512,1024,2048,4096").split(",")]
    cfg = BAConfig(max_iterations=lm_iters, cg_iterations=cg, dense_schur_max_cameras=0)
    for C in cams:
        prob = make_problem(C, obs_per_cam=opc)
        print(f"C={C} O={prob.obs_w.shape[0]} P={prob.points.shape[0]}")
        if "run" in pieces:
            fn = jax.jit(lambda p, cfg=cfg: core.bundle_adjust_impl(p, cfg))
            t0 = time.time()
            out, stats = fn(prob)
            np.asarray(out.cam_params)  # host-force (Axon memoizes + pipelines)
            t1 = time.time()
            # Fresh inputs: the Axon runtime memoizes identical (executable,
            # inputs) calls (NOTES.md gotcha 2).
            prob2 = prob._replace(cam_params=prob.cam_params + 1e-4)
            t2 = time.time()
            out, stats = fn(prob2)
            np.asarray(out.cam_params)
            t3 = time.time()
            it = int(stats.iterations)
            print(f"  full LM run: compile+1st {t1-t0:.1f}s, fresh 2nd {t3-t2:.2f}s "
                  f"({it} iters, {it/max(t3-t2,1e-9):.1f} iters/s, "
                  f"cost {float(stats.initial_cost):.4f}->{float(stats.final_cost):.4f})")
        if "inv" in pieces:
            M = jnp.tile(jnp.eye(6)[None], (C, 1, 1))
            time_compile("linalg.inv [C,6,6]", jnp.linalg.inv, M)
        if "ne" in pieces:
            time_compile(
                "build_normal_equations",
                lambda p, cfg=cfg: core.build_normal_equations(
                    p, p.cam_params, p.points, jnp.float32(1e-3), cfg
                ),
                prob,
            )
        if "pcg" in pieces:
            def pcg_only(p, cfg=cfg):
                ne = core.build_normal_equations(p, p.cam_params, p.points, jnp.float32(1e-3), cfg)
                rhs = core._schur_rhs(ne, p)
                return core._pcg(ne, p, rhs, cfg)
            time_compile("NE + PCG", pcg_only, prob)
        if "full" in pieces:
            time_compile(
                "bundle_adjust (full LM)",
                lambda p, cfg=cfg: core.bundle_adjust_impl(p, cfg),
                prob,
            )


if __name__ == "__main__":
    main()
