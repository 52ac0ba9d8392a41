"""ctypes loader for the native (C++/OpenMP) batch builder.

Compiles ``batcher.cpp`` on first use (cached next to the source), exposing
:func:`native_train_batch` / :func:`native_eval_batch` with the same
semantics as the numpy reference path (data/cloze.py). Falls back cleanly:
``available()`` is False if no toolchain is present, and the pipeline keeps
using numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "batcher.cpp")
_SO = os.path.join(_DIR, "libbatcher.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

# the C kernel uses a fixed 64-slot index scratch per row
MAX_ITEMS_NATIVE = 64


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fopenmp",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.build_train_batch.argtypes = [
            i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_uint64, ctypes.c_uint64, i32p, i32p, i32p,
        ]
        lib.build_eval_batch.argtypes = [
            i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p,
        ]
        lib.batcher_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_train_batch(
    values: np.ndarray,  # (total,) int32 label-space
    offsets: np.ndarray,  # (n_seqs+1,) int64
    row_indices: np.ndarray,  # (B,) int64
    max_items: int,
    max_masked: int,
    masked_percentage: float,
    seed: int,
    batch_counter: int,
):
    lib = _load()
    assert lib is not None, "native batcher unavailable"
    assert max_items <= MAX_ITEMS_NATIVE
    b = len(row_indices)
    tokens = np.empty((b, max_items + 3), np.int32)
    positions = np.empty((b, max_masked), np.int32)
    labels = np.empty((b, max_masked), np.int32)
    lib.build_train_batch(
        _ptr(values, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int64),
        _ptr(row_indices, ctypes.c_int64),
        b,
        max_items,
        max_masked,
        masked_percentage,
        seed,
        batch_counter,
        _ptr(tokens, ctypes.c_int32),
        _ptr(positions, ctypes.c_int32),
        _ptr(labels, ctypes.c_int32),
    )
    return tokens, positions, labels


def native_eval_batch(
    values: np.ndarray,
    offsets: np.ndarray,
    row_indices: np.ndarray,
    max_items: int,
    max_masked: int,
):
    lib = _load()
    assert lib is not None, "native batcher unavailable"
    assert max_items <= MAX_ITEMS_NATIVE
    b = len(row_indices)
    tokens = np.empty((b, max_items + 3), np.int32)
    positions = np.empty((b, max_masked), np.int32)
    labels = np.empty((b, max_masked), np.int32)
    lib.build_eval_batch(
        _ptr(values, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int64),
        _ptr(row_indices, ctypes.c_int64),
        b,
        max_items,
        max_masked,
        _ptr(tokens, ctypes.c_int32),
        _ptr(positions, ctypes.c_int32),
        _ptr(labels, ctypes.c_int32),
    )
    return tokens, positions, labels
