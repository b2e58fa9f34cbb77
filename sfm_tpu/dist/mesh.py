"""Device mesh construction (SURVEY.md §2.7)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_multihost_initialized = False


def initialize_multihost(shard_cfg) -> bool:
    """Join the multi-host runtime per ShardConfig (SURVEY.md §5.8).

    Calls jax.distributed.initialize exactly once per process (idempotent —
    re-entry from nested pipeline calls is a no-op). After it returns,
    jax.devices() lists the GLOBAL device set, so make_mesh below and every
    shard_map/psum/ppermute path already work unchanged across hosts: the
    collectives address mesh axes, not processes, and XLA routes them over
    ICI within a slice / DCN across slices.

    Returns True if initialization ran (or had already run), False when the
    config doesn't ask for multi-host. All-None coordinator fields are valid
    on TPU pods: JAX resolves the coordinator from the TPU metadata service.
    """
    global _multihost_initialized
    if not getattr(shard_cfg, "multihost", False):
        return False
    if _multihost_initialized:
        return True
    kwargs = {}
    if shard_cfg.coordinator_address is not None:
        kwargs["coordinator_address"] = shard_cfg.coordinator_address
    if shard_cfg.num_processes is not None:
        kwargs["num_processes"] = shard_cfg.num_processes
    if shard_cfg.process_id is not None:
        kwargs["process_id"] = shard_cfg.process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # user initialized it themselves — fine
        if "already" not in str(e).lower():
            raise
    _multihost_initialized = True
    return True


def make_mesh(num_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first num_devices devices (default: all).

    Multi-host runs call initialize_multihost (or jax.distributed.initialize)
    before this; a 1-D ring is the right topology for both the ppermute
    matcher and psum-sharded BA (ICI rings are native on TPU slices).
    """
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))
