"""Device mesh construction (SURVEY.md §2.7)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first num_devices devices (default: all).

    Multi-host runs call jax.distributed.initialize before this; a 1-D ring
    is the right topology for both the ppermute matcher and psum-sharded BA
    (ICI rings are native on TPU slices).
    """
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))
