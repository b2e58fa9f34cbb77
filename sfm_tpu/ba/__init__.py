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
