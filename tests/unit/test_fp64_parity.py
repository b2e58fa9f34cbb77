"""fp32 BA vs float64 verification path (SURVEY.md §7 hard part 1).

TPUs are fp32-only for this workload; the acceptance bar (BASELINE.md) is
reprojection-error parity within 1%. This runs the SAME LM solver in x64 on
CPU and checks the fp32 result lands within the bar.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import build_problem, writeback
from sfm_tpu.ba.core import bundle_adjust_impl, bundle_adjust
from sfm_tpu.utils.synthetic import make_orbit_scene
from tests.unit.test_ba import scene_to_reconstruction


def test_fp32_ba_matches_fp64_within_parity_bar():
    scene = make_orbit_scene(num_cameras=8, num_points=80, noise_px=0.5, seed=21)
    rec32 = scene_to_reconstruction(scene, pose_noise=0.01, point_noise=0.03, seed=22)
    rec64 = scene_to_reconstruction(scene, pose_noise=0.01, point_noise=0.03, seed=22)
    cfg = BAConfig(max_iterations=25, robust_loss="none")

    prob32, cams, pids = build_problem(rec32)
    out32, stats32 = bundle_adjust(prob32, cfg)
    writeback(rec32, out32, cams, pids)
    err32 = rec32.mean_reprojection_error()

    with jax.enable_x64(True):
        prob64, cams64, pids64 = build_problem(rec64)
        prob64 = jax.tree.map(
            lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            prob64,
        )
        out64, stats64 = jax.jit(
            lambda p: bundle_adjust_impl(p, cfg), backend="cpu"
        )(prob64)
    rec64.rvecs[cams64] = np.asarray(out64.cam_params)[:, :3]
    rec64.tvecs[cams64] = np.asarray(out64.cam_params)[:, 3:6]
    rec64.points[pids64] = np.asarray(out64.points)[: len(pids64)]
    err64 = rec64.mean_reprojection_error()

    # Both converge to the noise floor; fp32 within 1% of fp64 (the
    # BASELINE.md reprojection-parity bar).
    assert err64 < 0.8
    assert abs(err32 - err64) / err64 < 0.01, (err32, err64)
