"""Camera-sharded bundle adjustment (SURVEY.md §2.7).

Observations are sharded across the mesh (by camera blocks at build time);
camera/point parameter blocks are replicated. Every observation-indexed
segment-sum in the BA core completes with a psum (see _maybe_psum in
ba/core.py), after which all chips hold identical replicated normal
equations and the CG/LM iterates stay bitwise-identical — no further
synchronization needed. This is the TPU-native analog of PBA-style
distributed BA over MPI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import BAProblem
from sfm_tpu.ba.core import bundle_adjust_impl, BAStats


def shard_problem_by_camera(prob: BAProblem, num_shards: int) -> BAProblem:
    """Reorder + pad observations so shard s holds cameras' obs blocks of
    roughly equal size (greedy balance by per-camera observation count)."""
    obs_cam = np.asarray(prob.obs_cam)
    obs_w = np.asarray(prob.obs_w)
    C = prob.num_cameras

    counts = np.bincount(obs_cam[obs_w > 0], minlength=C)
    order = np.argsort(-counts)
    shard_of_cam = np.zeros(C, np.int32)
    load = np.zeros(num_shards, np.int64)
    for c in order:  # greedy longest-processing-time balance
        s = int(np.argmin(load))
        shard_of_cam[c] = s
        load[s] += counts[c]

    per_shard_rows = [np.where((shard_of_cam[obs_cam] == s) & (obs_w > 0))[0] for s in range(num_shards)]
    cap = max(1, max(len(r) for r in per_shard_rows))
    # Geometric capacity bucket (not just sublane alignment): the incremental
    # engine calls this as the scene grows, and a data-dependent cap would
    # recompile the sharded LM program on every invocation.
    bucket = 256
    while bucket < cap:
        bucket *= 2
    cap = bucket

    def pad_rows(rows):
        out = np.zeros(cap, np.int64)
        out[: len(rows)] = rows
        return out, len(rows)

    idx = np.zeros(num_shards * cap, np.int64)
    w = np.zeros(num_shards * cap, np.float32)
    for s in range(num_shards):
        rows, n = pad_rows(per_shard_rows[s])
        idx[s * cap:(s + 1) * cap] = rows
        w[s * cap: s * cap + n] = obs_w[per_shard_rows[s]]

    return prob._replace(
        obs_cam=prob.obs_cam[idx],
        obs_point=prob.obs_point[idx],
        obs_uv=prob.obs_uv[idx],
        obs_w=jnp.asarray(w),
        point_align=0,  # camera-major reorder voids the point-tile contract
    )


from functools import lru_cache


@lru_cache(maxsize=None)
def _sharded_ba_fn(cfg: BAConfig, mesh: Mesh, axis: str):
    """One jitted shard_map program per (config, mesh): the engine calls BA
    every few registrations, so the compiled executable must be reused
    (shapes inside still specialize via jit's own cache)."""
    obs_spec = P(axis)
    rep = P()
    in_specs = BAProblem(
        cam_params=rep, intrinsics=rep, points=rep,
        obs_cam=obs_spec, obs_point=obs_spec, obs_uv=obs_spec, obs_w=obs_spec,
        cam_fixed=rep, point_fixed=rep,
    )
    out_specs = (in_specs, BAStats(initial_cost=rep, final_cost=rep, iterations=rep, lam=rep))

    @partial(shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs, check_vma=False)
    def run(p):
        return bundle_adjust_impl(p, cfg, axis_name=axis)

    return jax.jit(run)


def bundle_adjust_sharded(prob: BAProblem, cfg: BAConfig, mesh: Mesh, axis: str = "shard"):
    """Sharded LM; obs arrays must be pre-sharded (shard_problem_by_camera).

    Returns (updated problem, stats), parameters replicated.
    """
    return _sharded_ba_fn(cfg, mesh, axis)(prob)
