"""Ring-sharded all-pairs matching (SURVEY.md §5.7) — the SfM analog of
ring attention.

The O(N^2) pairwise-matching sweep is the structural twin of long-context
attention: descriptors are sharded over the chip mesh, each chip keeps a
resident block, and shards rotate via ppermute so every block pair meets on
some chip. Blockwise, bandwidth-optimal over ICI, never all-gathers the full
descriptor set. Reference-class equivalent: the match workload partitioned
across cluster nodes by file handoff.

Layout: images [B] split into D contiguous shards of b = B/D. At ring step
s, chip d holds resident shard d and visiting shard (d - s) mod D, and
matches all resident-vs-visiting image pairs. After D steps every ordered
pair (i, j) with i in shard d has been matched on chip d.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfm_tpu.config import MatchConfig
from sfm_tpu.ops.match import match_pair


def ring_match_all(
    desc: jnp.ndarray,     # [B, N, 128] (B divisible by mesh size)
    valid: jnp.ndarray,    # [B, N]
    cfg: MatchConfig,
    mesh: Mesh,
    axis: str = "shard",
):
    """All ordered pairs (i, j != i): returns (idx_i, idx_j, match_valid)
    of shapes [B, B, M] — row i holds image i's matches against every j.

    Memory per chip is O(b * B * M), the match-graph row block; for larger B
    callers stream column blocks instead (pipeline does this at the host
    level).
    """
    D = mesh.devices.size
    B = desc.shape[0]
    assert B % D == 0, f"B={B} must be divisible by mesh size {D}"
    b = B // D

    def shard_fn(desc_loc, valid_loc):
        # desc_loc: [b, N, 128] resident block.
        my = jax.lax.axis_index(axis)
        visiting = (desc_loc, valid_loc)

        out_ii = jnp.zeros((b, B, cfg.max_matches), jnp.int32)
        out_jj = jnp.zeros((b, B, cfg.max_matches), jnp.int32)
        out_ok = jnp.zeros((b, B, cfg.max_matches), bool)

        for step in range(D):
            vdesc, vvalid = visiting
            src_shard = (my - step) % D

            # Match every resident image against every visiting image.
            def match_rv(di, vi):
                return jax.vmap(lambda dj, vj: match_pair(di, vi, dj, vj, cfg))(vdesc, vvalid)

            ii, jj, ok = jax.vmap(match_rv)(desc_loc, valid_loc)  # [b, b, M] each

            # Mask self-pairs on the diagonal step.
            if True:
                eye = jnp.eye(b, dtype=bool)[:, :, None]
                is_self = jnp.where(step == 0, eye, jnp.zeros_like(eye))
                ok = ok & jnp.logical_not(is_self)

            col0 = src_shard * b
            out_ii = jax.lax.dynamic_update_slice(out_ii, ii, (0, col0, 0))
            out_jj = jax.lax.dynamic_update_slice(out_jj, jj, (0, col0, 0))
            out_ok = jax.lax.dynamic_update_slice(out_ok, ok, (0, col0, 0))

            if step + 1 < D:
                perm = [(d, (d + 1) % D) for d in range(D)]
                visiting = jax.lax.ppermute(visiting, axis, perm)

        return out_ii, out_jj, out_ok

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return fn(desc, valid)


def ring_match_rows(
    desc_rows: jnp.ndarray,   # [Br, N, 128] resident row block (Br divisible by D)
    valid_rows: jnp.ndarray,  # [Br, N]
    desc_all: jnp.ndarray,    # [B, N, 128] full column set (B divisible by D)
    valid_all: jnp.ndarray,   # [B, N]
    cfg: MatchConfig,
    mesh: Mesh,
    axis: str = "shard",
):
    """Rectangular ring matching: a resident ROW block against every image.

    The memory-bounded building block behind ring_match_all at scale: the
    full [B, B, M] match table is O(B^2 M) (VERDICT r1: ~1.6TB at Rome16K),
    so the pipeline streams row blocks — per call the output is
    [Br, B, M] and per-chip memory O((Br/D) * B * M). Column shards rotate
    via ppermute exactly as in the square case.

    Returns (idx_i, idx_j, ok) of shapes [Br, B, M].
    """
    D = mesh.devices.size
    B = desc_all.shape[0]
    Br = desc_rows.shape[0]
    assert B % D == 0 and Br % D == 0
    b = B // D
    br = Br // D

    def shard_fn(dr, vr, dc, vc):
        my = jax.lax.axis_index(axis)
        visiting = (dc, vc)
        out_ii = jnp.zeros((br, B, cfg.max_matches), jnp.int32)
        out_jj = jnp.zeros((br, B, cfg.max_matches), jnp.int32)
        out_ok = jnp.zeros((br, B, cfg.max_matches), bool)
        for step in range(D):
            vdesc, vvalid = visiting
            src_shard = (my - step) % D

            def match_rv(di, vi):
                return jax.vmap(lambda dj, vj: match_pair(di, vi, dj, vj, cfg))(vdesc, vvalid)

            ii, jj, ok = jax.vmap(match_rv)(dr, vr)              # [br, b, M]
            col0 = src_shard * b
            out_ii = jax.lax.dynamic_update_slice(out_ii, ii, (0, col0, 0))
            out_jj = jax.lax.dynamic_update_slice(out_jj, jj, (0, col0, 0))
            out_ok = jax.lax.dynamic_update_slice(out_ok, ok, (0, col0, 0))
            if step + 1 < D:
                perm = [(d, (d + 1) % D) for d in range(D)]
                visiting = jax.lax.ppermute(visiting, axis, perm)
        return out_ii, out_jj, out_ok

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return fn(desc_rows, valid_rows, desc_all, valid_all)


def ring_match_reference(desc, valid, cfg: MatchConfig):
    """Unsharded reference with identical semantics (for equality tests)."""
    B = desc.shape[0]

    def row(di, vi):
        return jax.vmap(lambda dj, vj: match_pair(di, vi, dj, vj, cfg))(desc, valid)

    ii, jj, ok = jax.vmap(row)(desc, valid)
    eye = jnp.eye(B, dtype=bool)[:, :, None]
    return ii, jj, ok & jnp.logical_not(eye)
