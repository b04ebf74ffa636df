"""Native (C++) tier: fast file parsers loaded via ctypes.

Compiled on demand with g++ (cached next to the source); every consumer
falls back to the pure-Python implementation when the toolchain or the
build is unavailable, so the native tier is an accelerator, never a
dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build(src: pathlib.Path, out: pathlib.Path) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        try:  # retry without -march=native (portability)
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            return False


def load_library():
    """Return the ctypes library, building it if needed; None if
    unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = _HERE / "apex_io.cpp"
        tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
        cache_dir = pathlib.Path(
            os.environ.get("APEX_TPU_NATIVE_DIR",
                           os.path.join(os.path.expanduser("~"), ".cache", "apex_tpu"))
        )
        cache_dir.mkdir(parents=True, exist_ok=True)
        so = cache_dir / f"apex_io_{tag}.so"
        if not so.exists() and not _build(src, so):
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            _LIB_FAILED = True
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.bal_open.restype = ctypes.c_void_p
        lib.bal_open.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
        lib.bal_read.argtypes = [ctypes.c_void_p, dp, dp, dp]
        lib.bal_error.restype = ctypes.c_char_p
        lib.bal_error.argtypes = [ctypes.c_void_p]
        lib.bal_close.argtypes = [ctypes.c_void_p]
        lib.g2o_open.restype = ctypes.c_void_p
        lib.g2o_open.argtypes = [ctypes.c_char_p, i64p, i64p, i64p, i64p]
        lib.g2o_read.argtypes = [ctypes.c_void_p, dp, dp, dp, dp]
        lib.g2o_error.restype = ctypes.c_char_p
        lib.g2o_error.argtypes = [ctypes.c_void_p]
        lib.g2o_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def _dptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_bal_native(path):
    """Parse a BAL file natively. Returns (obs [K,4], cams [C,9], pts [P,3])
    or None if the native library is unavailable. Raises ValueError on
    malformed files."""
    lib = load_library()
    if lib is None:
        return None
    n_cam = ctypes.c_int64()
    n_pt = ctypes.c_int64()
    n_obs = ctypes.c_int64()
    h = lib.bal_open(str(path).encode(), ctypes.byref(n_cam), ctypes.byref(n_pt),
                     ctypes.byref(n_obs))
    if not h:
        raise ValueError(f"cannot open {path}")
    try:
        if n_cam.value < 0:
            raise ValueError(f"{path}: {lib.bal_error(h).decode()}")
        obs = np.empty((n_obs.value, 4))
        cams = np.empty((n_cam.value, 9))
        pts = np.empty((n_pt.value, 3))
        lib.bal_read(h, _dptr(obs), _dptr(cams), _dptr(pts))
        return obs, cams, pts
    finally:
        lib.bal_close(h)


def parse_g2o_native(path):
    """Parse a g2o file natively. Returns (v2 [*,4], v3 [*,8], e2 [*,11],
    e3 [*,30]) or None if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    ns = [ctypes.c_int64() for _ in range(4)]
    h = lib.g2o_open(str(path).encode(), *[ctypes.byref(n) for n in ns])
    if not h:
        raise ValueError(f"cannot open {path}")
    try:
        if ns[0].value < 0:
            raise ValueError(f"{path}: {lib.g2o_error(h).decode()}")
        v2 = np.empty((ns[0].value, 4))
        v3 = np.empty((ns[1].value, 8))
        e2 = np.empty((ns[2].value, 11))
        e3 = np.empty((ns[3].value, 30))
        lib.g2o_read(h, _dptr(v2), _dptr(v3), _dptr(e2), _dptr(e3))
        return v2, v3, e2, e3
    finally:
        lib.g2o_close(h)
