"""ctypes bridge to the native batch .npy loader (native/npy_loader.cc).

Builds the shared library on first use (g++, ~1s) and caches it next to
the source. Falls back to NumPy transparently when a toolchain is missing
— the loader API is identical either way.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnpy_loader.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "npy_loader.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib else None
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = False
            return None
        lib.nl_load_batch.restype = ctypes.c_int64
        lib.nl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.nl_probe.restype = ctypes.c_int64
        lib.nl_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def native_available() -> bool:
    return get_lib() is not None


def load_batch(paths: Sequence[str], max_elems: int,
               num_threads: int = 4
               ) -> Tuple[np.ndarray, List[Tuple[int, ...]]]:
    """Load a batch of .npy files into one (n, max_elems) float32 buffer.

    Returns (buffer, shapes). Files the native loader cannot handle are
    loaded via NumPy into the same buffer (and converted to float32).
    """
    n = len(paths)
    out = np.zeros((n, max_elems), np.float32)
    shapes: List[Tuple[int, ...]] = [()] * n
    lib = get_lib()
    missing = list(range(n))
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        shp = np.zeros((n, 4), np.int64)
        nds = np.zeros((n,), np.int32)
        cnt = np.zeros((n,), np.int64)
        lib.nl_load_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_elems, shp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_threads)
        missing = [i for i in range(n) if cnt[i] == 0]
        for i in range(n):
            if cnt[i] > 0:
                shapes[i] = tuple(int(s) for s in shp[i, :nds[i]])
    for i in missing:
        a = np.load(paths[i]).astype(np.float32)
        flat = a.reshape(-1)
        out[i, :flat.size] = flat
        shapes[i] = a.shape
    return out, shapes
