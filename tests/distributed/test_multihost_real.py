"""REAL multi-process multi-host bring-up (VERDICT r4 next #5, SURVEY §5.8).

Two OS processes on this machine each run jax.distributed.initialize via the
product path (dist.mesh.initialize_multihost with explicit ShardConfig
coordinator fields), form the 2-device GLOBAL mesh, and run a psum across
it — the same collective the sharded BA uses, now genuinely crossing a
process boundary instead of a mocked call or a single-process virtual mesh.
DCN/ICI transport specifics remain unexercisable here (no second TPU host),
but the coordinator handshake, global device enumeration, cross-process
array assembly, and collective execution are the real code path.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
coord, pid_s, repo = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")

from sfm_tpu.config import ShardConfig
from sfm_tpu.dist.mesh import initialize_multihost, make_mesh

cfg = ShardConfig(multihost=True, coordinator_address=coord,
                  num_processes=2, process_id=int(pid_s))
assert initialize_multihost(cfg) is True
assert initialize_multihost(cfg) is True  # idempotent re-entry
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = make_mesh()
# Each process contributes its local shard: process i holds (i+1)s.
local = np.full((1, 8), float(int(pid_s) + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("shard")), local)
assert garr.shape == (2, 8)

f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "shard"),
                      mesh=mesh, in_specs=P("shard"), out_specs=P()))
out = f(garr)
got = np.asarray(out.addressable_shards[0].data)
np.testing.assert_allclose(got, np.full((1, 8), 3.0, np.float32))
print("MULTIHOST_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_over_global_mesh():
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COMPILATION_CACHE_DIR")}
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i), REPO],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}\n--- other ---\n{outs[1 - i]}"
        assert "MULTIHOST_OK" in out
