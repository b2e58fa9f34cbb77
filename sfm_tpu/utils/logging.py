"""Observability (SURVEY.md §5.1/5.5): stage timers + structured run stats.

Reference-class systems log per-stage wall-clock; here each stage records
duration into a manifest dict that the pipeline can persist, and
`jax.profiler` tracing can be toggled around any stage via profile_dir.
"""

from __future__ import annotations

import contextlib
import json
import time


class StageTimer:
    def __init__(self, verbose: bool = True, profile_dir: str | None = None):
        self.verbose = verbose
        self.profile_dir = profile_dir
        self.durations: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = contextlib.nullcontext()
        if self.profile_dir:
            import jax

            ctx = jax.profiler.trace(self.profile_dir)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.durations[name] = self.durations.get(name, 0.0) + dt
        if self.verbose:
            print(f"[sfm_tpu] stage {name}: {dt:.2f}s")

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.durations, f, indent=2)
