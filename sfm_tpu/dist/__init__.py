"""Multi-chip distribution (SURVEY.md §2.7, §5.7-5.8).

The reference class scales via cluster nodes exchanging files/MPI; the
TPU-native equivalent is a jax.sharding Mesh with shard_map-wrapped stage
functions and XLA collectives over ICI/DCN:

  - DP feature extraction: images sharded across chips (trivial map)
  - ring matching: descriptor shards rotate via ppermute so every block
    pair meets on some chip — the SfM analog of ring attention (§5.7)
  - sharded BA: observations sharded by camera, normal-equation segments
    and CG products completed with psum (§2.7)
"""

from sfm_tpu.dist.mesh import initialize_multihost, make_mesh  # noqa: F401
