"""ctypes loader for the native C++ reduced-space kernels
(native/src/reduced.cc; C ABI in native/include/arpack_tpu.h — the
framework's ICB-layer analog).

The library is built lazily on first use (g++ directly; cmake project also
provided under native/ for packaging) and cached next to the sources.  All
entry points degrade gracefully: if the toolchain or build is unavailable,
callers fall back to the scipy implementations in core/reduced.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libarpack_tpu_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "src" / "reduced.cc"
    if not src.exists():
        return False
    _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{_NATIVE_DIR / 'include'}", str(src), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("ARPACK_TPU_NO_NATIVE"):
        return None
    src = _NATIVE_DIR / "src" / "reduced.cc"
    if not _LIB_PATH.exists() or (
            src.exists()
            and src.stat().st_mtime > _LIB_PATH.stat().st_mtime):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i64 = ctypes.c_int64
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    sp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.atpu_version.restype = ctypes.c_char_p
    lib.atpu_stqrb_d.restype = i64
    lib.atpu_stqrb_d.argtypes = [i64, dp, dp, dp]
    lib.atpu_stqrb_s.restype = i64
    lib.atpu_stqrb_s.argtypes = [i64, sp, sp, sp]
    lib.atpu_steqr_d.restype = i64
    lib.atpu_steqr_d.argtypes = [i64, dp, dp, dp]
    lib.atpu_sym_shift_q_d.restype = i64
    lib.atpu_sym_shift_q_d.argtypes = [i64, dp, dp, i64, dp, dp]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def stqrb(alpha: np.ndarray, beta: np.ndarray, rnorm: float):
    """Native dstqrb: (ritz ascending, bounds).  Raises if unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = alpha.shape[0]
    d = np.ascontiguousarray(alpha, np.float64).copy()
    e = np.zeros(max(n - 1, 1), np.float64)
    e[: n - 1] = beta[: n - 1]
    z = np.zeros(n, np.float64)
    info = lib.atpu_stqrb_d(n, d, e, z)
    if info != 0:
        raise RuntimeError(f"atpu_stqrb_d failed: info={info}")
    return d, np.abs(rnorm * z)


def steqr(alpha: np.ndarray, beta: np.ndarray):
    """Native dsteqr-class: (evals ascending, eigenvector matrix S)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = alpha.shape[0]
    d = np.ascontiguousarray(alpha, np.float64).copy()
    e = np.zeros(max(n - 1, 1), np.float64)
    e[: n - 1] = beta[: n - 1]
    s = np.zeros((n, n), np.float64)
    info = lib.atpu_steqr_d(n, d, e, s)
    if info != 0:
        raise RuntimeError(f"atpu_steqr_d failed: info={info}")
    return d, s


def sym_shift_q(alpha: np.ndarray, beta: np.ndarray, shifts: np.ndarray):
    """Native dsapps Q computation: (d', e', Q)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = alpha.shape[0]
    d = np.ascontiguousarray(alpha, np.float64).copy()
    e = np.zeros(max(n - 1, 1), np.float64)
    e[: n - 1] = beta[: n - 1]
    sh = np.ascontiguousarray(shifts, np.float64)
    q = np.zeros((n, n), np.float64)
    lib.atpu_sym_shift_q_d(n, d, e, len(sh), sh, q)
    beta_out = np.zeros_like(np.asarray(beta, np.float64))
    beta_out[: n - 1] = e[: n - 1]
    return d, beta_out, q
