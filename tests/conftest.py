"""Test environment: CPU backend with 8 virtual devices.

SURVEY.md §4.6 — distributed tests run single-process against a forced
8-device CPU topology (`xla_force_host_platform_device_count`), the standard
JAX stand-in for a multi-chip mesh. CPU is also deterministic and fast for
the small fixtures. The benchmark harness (bench.py), not the test suite,
exercises the real TPU chip.

Note: this machine's sitecustomize pins JAX_PLATFORMS=axon via env, so the
platform must be forced through jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # framework is fp32-first, like the TPU path

# Persistent compile cache: integration tests re-trace identical shapes.
# CPU gets its OWN cache dir: XLA:CPU persists AOT machine code specialized
# to the host's CPU features, and this VM's host type changes across
# restarts — a stale entry from a different host segfaulted (SIGILL-class)
# mid-suite when shared with the TPU cache. The TPU cache (.jax_cache) is
# unaffected: axon executables never lower to host machine code.
# Per-process staging + atomic merge-back: concurrent suite/pipeline runs
# on the same cache corrupted it once (NOTES round-4); see
# sfm_tpu/utils/compile_cache.py.
from sfm_tpu.utils.compile_cache import setup_cache  # noqa: E402

setup_cache("/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# SURVEY.md §5.2: JAX designs data races out; the remaining numeric hazard is
# silent NaN propagation. CI unit runs can flip this on.
if os.environ.get("SFM_TPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)


def pytest_collection_modifyitems(session, config, items):
    """Run unit tests BEFORE distributed/integration in one-process suites.

    XLA:CPU compiles segfault/abort non-deterministically when a fresh
    program is compiled AFTER the 8-device mesh suites have run in the same
    process (observed 3x in full-suite order at test_planar_uncalibrated —
    SIGSEGV/SIGABRT inside backend_compile or executable.serialize; every
    per-directory invocation is green, and the same module passes when run
    before the mesh tests). Known infra-level flake (NOTES round-3/-5);
    ordering unit first sidesteps the trigger without splitting the suite
    into separate processes.
    """
    rank = {"unit": 0, "oracle": 1, "integration": 2, "distributed": 3}

    def key(item):
        p = str(item.fspath)
        for name, r in rank.items():
            if f"/tests/{name}/" in p:
                return r
        return 4

    items.sort(key=key)
