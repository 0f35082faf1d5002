"""Native (C++) host-runtime components, loaded via ctypes.

Built on demand with g++ (-O3 -shared -fPIC); no pybind11 dependency.  Every
native function has a numpy fallback in the pure-Python layer, and the test
suite asserts byte-identical outputs between the two (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "scene_graph_core.cpp"
_SO = _DIR / "libsfm_native.so"

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _load_failed = True
        return None

    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.build_csr.argtypes = [i64, i64, p_i32, p_i32, p_i64, p_i32]
    lib.build_csr.restype = None
    lib.get_2d3d.argtypes = [
        i64, i64, p_i64, p_i32, p_i32, p_i64, p_u8, i64, p_i32, p_i64, i64,
    ]
    lib.get_2d3d.restype = i64
    lib.triangulation_tracks.argtypes = [
        i64, i64, p_i64, p_i32, p_i32, p_i64, p_u8, p_u8, i64, i64, i64,
        p_i32, p_i64, p_i32,
    ]
    lib.triangulation_tracks.restype = i64
    lib.find_merge_partners_batch.argtypes = [
        p_i32, p_i64, i64, p_i64, p_i64, p_i32, p_i32, p_i64, p_u8, p_i64,
    ]
    lib.find_merge_partners_batch.restype = None
    lib.completion_candidates_batch.argtypes = [
        p_i32, p_i64, i64, p_i64, p_i32, p_i32, p_i64, p_u8, i64, i64,
        p_i32, p_i64, p_i32, ctypes.c_int32,
    ]
    lib.completion_candidates_batch.restype = i64
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None
