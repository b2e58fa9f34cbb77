"""Per-process compile-cache isolation (sfm_tpu/utils/compile_cache.py).

NOTES round-4 diagnosed concurrent-process corruption of a shared
persistent cache dir (reader abort inside jax's cache READ). The fix is
mechanical, not folklore: each process stages into its own dir (hardlinked
warm copies) and publishes new entries via atomic os.replace. These tests
exercise the mechanism directly and via two genuinely concurrent
subprocesses sharing one cache dir.
"""

import os
import subprocess
import sys
import tempfile

from sfm_tpu.utils import compile_cache

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_publish_only_new_entries(tmp_path):
    shared = tmp_path / "shared"
    staging = tmp_path / "stage"
    shared.mkdir()
    staging.mkdir()
    (shared / "old").write_bytes(b"OLD")
    os.link(shared / "old", staging / "old")  # warm hardlink, nlink=2
    (staging / "new").write_bytes(b"NEW")

    compile_cache._publish(str(staging), str(shared))
    assert sorted(os.listdir(shared)) == ["new", "old"]
    assert (shared / "new").read_bytes() == b"NEW"
    # Published entry is a fresh inode, not a link into staging.
    assert os.stat(shared / "new").st_nlink == 1
    # No temp leftovers.
    assert not [n for n in os.listdir(shared) if n.startswith(".stage-")]


def test_publish_never_overwrites(tmp_path):
    shared = tmp_path / "shared"
    staging = tmp_path / "stage"
    shared.mkdir()
    staging.mkdir()
    (shared / "e").write_bytes(b"THEIRS")
    (staging / "e").write_bytes(b"MINE")
    compile_cache._publish(str(staging), str(shared))
    assert (shared / "e").read_bytes() == b"THEIRS"


def test_sweep_removes_dead_pid_dirs(tmp_path):
    shared = tmp_path / "cache"
    shared.mkdir()
    dead = tmp_path / "cache.proc-999999999-deadbeef"
    dead.mkdir()
    alive = tmp_path / f"cache.proc-{os.getpid()}-aaaaaaaa"
    alive.mkdir()
    compile_cache._sweep_stale(str(shared))
    assert not dead.exists()
    assert alive.exists()


_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_COMPILATION_CACHE_DIR"] = sys.argv[1]
sys.path.insert(0, sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
import sfm_tpu  # installs the per-process staging cache
import jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
salt = int(sys.argv[3])
for i in range(6):
    f = jax.jit(lambda x, i=i: jnp.sin(x * (salt * 10 + i + 2)) @ x.T)
    _ = f(jnp.ones((64, 64))).block_until_ready()
staging = jax.config.jax_compilation_cache_dir
assert staging != sys.argv[1], "staging dir must differ from shared"
assert os.path.isdir(staging)
print("OK", flush=True)
"""


def test_concurrent_processes_share_cache_safely():
    """Two processes compile against the same shared cache dir at once;
    both must finish green, the shared dir must contain only complete
    entries (no temp files), and a third run must warm-start from it."""
    with tempfile.TemporaryDirectory() as td:
        shared = os.path.join(td, "cache")
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_COMPILATION_CACHE_DIR", "XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen([sys.executable, "-c", _WORKER, shared, REPO, str(i)],
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             env=env, text=True)
            for i in range(2)
        ]
        for p in procs:
            out, _ = p.communicate(timeout=300)
            assert p.returncode == 0, out
            assert "OK" in out
        names = os.listdir(shared)
        assert names, "entries were published"
        assert not [n for n in names if n.startswith(".")]
        # No orphaned staging dirs (atexit cleaned them).
        assert not [d for d in os.listdir(td) if d.startswith("cache.proc-")]
        # Third process re-reads the published entries without error.
        p = subprocess.run([sys.executable, "-c", _WORKER, shared, REPO, "0"],
                           capture_output=True, env=env, text=True, timeout=300)
        assert p.returncode == 0, p.stdout + p.stderr
