"""ctypes bindings for the native C++ g2o tokenizer/writer.

The reference's entire ingestion layer is C++ (``g2o_util.h``); ours is too:
``native/g2o_io.cpp`` is a single-pass strtod tokenizer exposed through a
minimal C ABI (no pybind11 -- the image has none, and ctypes keeps the build
to one ``g++`` invocation).  The Python parser in ``io/g2o.py`` remains the
portable fallback; behaviour is identical and tested equal.

The shared library is built lazily on first use (``scripts/build_native.sh``
equivalent) and cached at ``native/build/libg2o_io.so``.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "g2o_io.cpp"
_LIB = _NATIVE_DIR / "build" / "libg2o_io.so"

_lib = None
_lib_failed = False


def _build() -> bool:
    if not _SRC.exists():
        return False
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _LIB.exists() and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        _lib_failed = True
        return None
    lib.slam_g2o_count.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong)
    ]
    lib.slam_g2o_count.restype = ctypes.c_int
    lib.slam_g2o_parse.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_double)
    ] * 4
    lib.slam_g2o_parse.restype = ctypes.c_int
    lib.slam_write_nodes.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong,
        ctypes.c_int,
    ]
    lib.slam_write_nodes.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def parse_g2o_arrays(path: str):
    """Native parse: returns dict with 'v2' (n,4), 'e2' (m,11), 'v3' (n,8),
    'e3' (m,30) float64 arrays (empty where absent), or None if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    counts = (ctypes.c_longlong * 4)()
    if lib.slam_g2o_count(path.encode(), counts) != 0:
        raise FileNotFoundError(path)
    shapes = [(counts[0], 4), (counts[1], 11), (counts[2], 8), (counts[3], 30)]
    bufs = [np.empty(s, np.float64) for s in shapes]
    ptrs = [
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if b.size else None
        for b in bufs
    ]
    if lib.slam_g2o_parse(path.encode(), *ptrs) != 0:
        raise IOError(f"native parse failed for {path}")
    return {"v2": bufs[0], "e2": bufs[1], "v3": bufs[2], "e3": bufs[3]}


def write_nodes_native(path: str, poses: np.ndarray) -> bool:
    """Native fast node writer; returns False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    poses = np.ascontiguousarray(poses, np.float64)
    rc = lib.slam_write_nodes(
        path.encode(),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        poses.shape[0],
        poses.shape[1],
    )
    return rc == 0
