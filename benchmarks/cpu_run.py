"""Force the CPU backend, then exec another benchmark script.

This machine's axon sitecustomize re-pins JAX_PLATFORMS=axon at interpreter
start, so the env var CANNOT select CPU (verified: JAX_PLATFORMS=cpu still
yields the TPU backend). The only reliable switch is jax.config AFTER
importing jax and BEFORE first device use — which scripts can't do for
themselves without editing. Usage:

    python benchmarks/cpu_run.py benchmarks/ladder.py 512 256 vocab_tree global_partition
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

path = sys.argv[1]
sys.argv = sys.argv[1:]
code = compile(open(path).read(), path, "exec")
exec(code, {"__name__": "__main__", "__file__": os.path.abspath(path)})
