"""ctypes bindings for the native host-runtime kernels (batch assembly).

Compiled on first use with the system C++ toolchain and cached next to the
source; every entry point has a numpy fallback so the framework runs without
a compiler. ctypes calls release the GIL, so the prefetch thread's batch
assembly overlaps the training loop's Python work.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_LIB_PATH = os.path.join(_HERE, "libmap_tpu_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native batcher build failed ({e}); using numpy fallback")
        return False


def get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            logger.warning(f"native batcher load failed ({e})")
            _build_failed = True
            return None
        lib.map_tpu_gather_rows_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.map_tpu_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.map_tpu_build_alias.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def gather_rows_i32(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i, :] = x[idx[i], :] for a C-contiguous int32 matrix."""
    lib = get_lib()
    if lib is None or not x.flags.c_contiguous or x.dtype != np.int32:
        return np.ascontiguousarray(x[idx], dtype=np.int32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx), x.shape[1]), np.int32)
    lib.map_tpu_gather_rows_i32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(x.shape[1]),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(idx)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def build_alias(probs: np.ndarray):
    """Walker alias table (prob float32[K], alias int32[K]); None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, dtype=np.float64)
    k = len(probs)
    out_prob = np.empty(k, np.float32)
    out_alias = np.empty(k, np.int32)
    lib.map_tpu_build_alias(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(k),
        out_prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out_prob, out_alias


def gather_f32(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None or not x.flags.c_contiguous or x.dtype != np.float32:
        return np.ascontiguousarray(x[idx], dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty(len(idx), np.float32)
    lib.map_tpu_gather_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(idx)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
