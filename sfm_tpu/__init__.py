"""sfm_tpu — a TPU-native large-scale structure-from-motion framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
IITD-COMPUTER-VISION-GROUP/large-scale-sfm (see SURVEY.md; the reference
mount was empty, so the build targets the driver spec in BASELINE.json):

  images in -> per-image camera intrinsics, 6-DoF poses, sparse 3D point
  cloud (with tracks/observations) out.

Pipeline stages (each a jit-compiled batched function over padded,
statically-shaped arrays):

  SIFT feature extraction  -> blocked-matmul descriptor matching (MXU)
  -> vmapped batched RANSAC (E/F/H) -> track building -> incremental
  reconstruction (PnP + triangulation + local BA) -> global Schur-complement
  Levenberg-Marquardt bundle adjustment -> COLMAP/PLY export.

Scale-out is via jax.sharding Mesh + shard_map: ring-ppermute descriptor
exchange for the O(N^2) matching sweep, psum-sharded bundle adjustment.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry and bundle adjustment are float32 (TPUs have no fast fp64 —
# SURVEY.md §7 hard part 1); fp32 matmuls must therefore run at full
# precision on the MXU, not the bf16-passthrough default. Hot kernels that
# want bf16 throughput (the descriptor matcher) cast to bf16 explicitly, so
# this only affects the small/accuracy-critical fp32 contractions.
_jax.config.update("jax_default_matmul_precision", "highest")

# Concurrent processes sharing one persistent compile cache can corrupt it
# (observed: reader abort inside get_executable_and_time). Redirect to a
# per-process staging dir with an atomic merge-back at exit.
import os as _os  # noqa: E402

if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    from sfm_tpu.utils.compile_cache import setup_cache as _setup_cache

    _setup_cache(_os.environ["JAX_COMPILATION_CACHE_DIR"])

from sfm_tpu.api import reconstruct  # noqa: F401
