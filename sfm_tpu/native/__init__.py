"""Native (C++) runtime components + ctypes bindings (SURVEY.md §2).

The reference class implements its graph/track/scheduler machinery in C++;
this package does the same for the irregular host-side hot paths (the TPU
owns the array math; these own the pointer-chasing). Built on first import
with g++ into a cached shared object; every native function has a pure-
Python fallback so the framework degrades gracefully without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_sfm_native.so")
_SRCS = [os.path.join(_HERE, "tracks.cpp")]

_lib = None
_build_error: str | None = None


def _needs_build() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    return any(os.path.getmtime(s) > so_mtime for s in _SRCS)


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           *_SRCS, "-o", _SO_PATH]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if _needs_build():
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.sfm_build_tracks.restype = ctypes.c_int64
        lib.sfm_build_tracks.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,               # pairs, ok
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # idx_i, idx_j, inlier
            ctypes.c_int64, ctypes.c_int64,                 # num_edges, m
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, # num_images, max_kp, min_length
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # obs_image, obs_kp, track_id
            ctypes.c_int64, ctypes.c_void_p,                # cap_rows, num_tracks_out
        ]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        _build_error = str(e)
        print(f"[sfm_tpu] native build unavailable, using Python fallback: {e}",
              file=sys.stderr)
    return _lib
