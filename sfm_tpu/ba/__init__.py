"""Bundle adjustment (SURVEY.md §2.6) — native component #5.

Reference-class realization: C++ Ceres / multicore PBA. TPU-native
re-design: the sparse normal equations live in segment-sum form — per-camera
6x6 blocks, per-point 3x3 blocks, and the cam-point coupling W kept
per-observation (block-sparse, never materialized as a matrix). The reduced
camera system is solved by preconditioned CG on implicit Schur products
S.v, and the whole Levenberg-Marquardt loop runs on device inside
lax.while_loop.
"""

from sfm_tpu.ba.problem import BAProblem, build_problem, writeback  # noqa: F401
from sfm_tpu.ba.core import bundle_adjust, ba_cost  # noqa: F401


def dispatch_bundle_adjust(prob, cfg):
    """Route one BA solve to the single-chip or camera-sharded path.

    cfg is the full PipelineConfig: when cfg.shard asks for multi-chip BA
    (SURVEY.md §2.7 sharded BA) and the backend has the devices, the
    observations are balanced across the mesh by camera and the LM runs with
    psum-completed normal equations; otherwise the single-chip LM runs.
    Returns (problem, stats) with parameters replicated either way.
    """
    shard = cfg.shard
    if shard.num_devices > 1 and shard.shard_ba:
        import jax

        if jax.device_count() >= shard.num_devices:
            from sfm_tpu.dist.mesh import make_mesh
            from sfm_tpu.dist.sharded_ba import (
                bundle_adjust_sharded,
                shard_problem_by_camera,
            )

            mesh = make_mesh(shard.num_devices, shard.mesh_axis)
            prob_s = shard_problem_by_camera(prob, shard.num_devices)
            return bundle_adjust_sharded(prob_s, cfg.ba, mesh, shard.mesh_axis)
    return bundle_adjust(prob, cfg.ba)
