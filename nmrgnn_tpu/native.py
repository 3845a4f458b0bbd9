"""ctypes bindings for the native C++ host runtime (native/).

Provides the fast host paths — TFRecord scan/write and cell-list kNN —
with automatic build-on-first-use (g++) and graceful fallback to the
pure-Python/scipy implementations when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnmrgnn_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True, text=True, timeout=300,
        )
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not os.environ.get("NMRGNN_TPU_NO_NATIVE"):
            if not _build():
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tfrecord_scan.restype = ctypes.c_long
        lib.tfrecord_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.tfrecord_write.restype = ctypes.c_int
        lib.tfrecord_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.nmrgnn_masked_crc.restype = ctypes.c_uint32
        lib.nmrgnn_masked_crc.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.cell_list_knn.restype = ctypes.c_int
        lib.cell_list_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------


def tfrecord_scan(path: str, check_crc: bool = False, max_records: int = 1 << 22):
    """[(offset, length)] of record payloads, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.empty(max_records, np.int64)
    lengths = np.empty(max_records, np.int64)
    n = lib.tfrecord_scan(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        max_records,
        1 if check_crc else 0,
    )
    if n == -2:
        raise IOError(f"CRC mismatch in {path}")
    if n < 0:
        raise IOError(f"native tfrecord_scan failed on {path} ({n})")
    return offsets[:n].copy(), lengths[:n].copy()


def tfrecord_write(path: str, payloads: list, append: bool = False) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    blob = b"".join(payloads)
    buf = np.frombuffer(blob, np.uint8)
    lengths = np.asarray([len(p) for p in payloads], np.int64)
    r = lib.tfrecord_write(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(payloads),
        1 if append else 0,
    )
    if r != 0:
        raise IOError(f"native tfrecord_write failed on {path}")
    return True


def cell_list_knn(coords: np.ndarray, k: int):
    """(nlist i32[N,k], dists f32[N,k]) or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.float32)
    n = coords.shape[0]
    nlist = np.empty((n, k), np.int32)
    dists = np.empty((n, k), np.float32)
    r = lib.cell_list_knn(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        k,
        nlist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if r != 0:
        raise RuntimeError("native cell_list_knn failed")
    return nlist, dists
