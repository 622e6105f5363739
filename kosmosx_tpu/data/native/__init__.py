"""ctypes bindings for the native host-side data kernels (packing.cpp).

The shared library is built on demand with g++ (no pybind11 in this image)
and cached next to the source; every entry point has a numpy fallback with
identical semantics, so the package works without a toolchain. The numpy
fallbacks double as the test oracle (tests/test_native_data.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packing.cpp")
_LIB_PATH = os.path.join(_HERE, "libkosmosx_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile packing.cpp -> libkosmosx_data.so (atomic rename)."""
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", tmp, _SRC]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            logger.warning("native data kernel build failed: %s", res.stderr)
            os.unlink(tmp)
            return False
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError) as e:  # no g++, RO fs, ...
        logger.warning("native data kernel build unavailable: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("KOSMOSX_NO_NATIVE"):
            return None
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < src_mtime):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native data kernel load failed: %s", e)
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ksx_pack_blocks.restype = ctypes.c_int64
        lib.ksx_pack_blocks.argtypes = [
            i32p, i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, i64p]
        lib.ksx_pad_rows.restype = None
        lib.ksx_pad_rows.argtypes = [i32p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int32, i32p]
        lib.ksx_shift_labels.restype = None
        lib.ksx_shift_labels.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int32, ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _i32(a: np.ndarray) -> "ctypes._Pointer":
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64(a: np.ndarray) -> "ctypes._Pointer":
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# ---------------------------------------------------------------------------
# pack_blocks: concat docs (+EOS each) after `carry`, chunk into seq_len rows
# ---------------------------------------------------------------------------

def pack_blocks_np(docs: Sequence[np.ndarray], seq_len: int, eos_id: int,
                   carry: Optional[np.ndarray] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle: returns ((N, seq_len) int32 blocks, remainder tail)."""
    parts: List[np.ndarray] = []
    if carry is not None and len(carry):
        parts.append(np.asarray(carry, np.int32))
    eos = np.asarray([eos_id], np.int32)
    for d in docs:
        parts.append(np.asarray(d, np.int32).ravel())
        parts.append(eos)
    stream = np.concatenate(parts) if parts else np.zeros((0,), np.int32)
    n = len(stream) // seq_len
    blocks = stream[:n * seq_len].reshape(n, seq_len).copy()
    return blocks, stream[n * seq_len:].copy()


def pack_blocks(docs: Sequence[np.ndarray], seq_len: int, eos_id: int,
                carry: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Native concat-and-chunk packing (group_texts semantics,
    /root/reference/train.py:444-462); numpy fallback when the shared
    library is unavailable."""
    lib = _load()
    if lib is None:
        return pack_blocks_np(docs, seq_len, eos_id, carry)
    flat_docs = [np.ascontiguousarray(np.asarray(d, np.int32).ravel())
                 for d in docs]
    lens = np.asarray([len(d) for d in flat_docs], np.int64)
    flat = (np.concatenate(flat_docs) if flat_docs
            else np.zeros((0,), np.int32))
    carry_a = (np.ascontiguousarray(np.asarray(carry, np.int32).ravel())
               if carry is not None else np.zeros((0,), np.int32))
    if len(carry_a) >= seq_len:  # keep native precondition carry < seq_len
        return pack_blocks_np(docs, seq_len, eos_id, carry_a)
    total = int(len(carry_a) + len(flat) + len(flat_docs))
    max_blocks = total // seq_len
    out = np.empty((max_blocks, seq_len), np.int32)
    tail = np.empty((seq_len,), np.int32)
    tail_len = np.zeros((1,), np.int64)
    n = lib.ksx_pack_blocks(_i32(flat), _i64(lens), len(flat_docs),
                            eos_id, seq_len, _i32(carry_a), len(carry_a),
                            _i32(out), max_blocks, _i32(tail), _i64(tail_len))
    if n < 0:  # caller-error guard in the C ABI; fall back rather than raise
        return pack_blocks_np(docs, seq_len, eos_id, carry_a)
    return out[:n], tail[:int(tail_len[0])].copy()


# ---------------------------------------------------------------------------
# pad_rows: ragged rows -> fixed (N, width) int32 with right padding
# ---------------------------------------------------------------------------

def pad_rows_np(rows: Sequence[np.ndarray], width: int,
                pad_id: int) -> np.ndarray:
    out = np.full((len(rows), width), pad_id, np.int32)
    for i, r in enumerate(rows):
        r = np.asarray(r, np.int32).ravel()
        n = min(len(r), width)
        out[i, :n] = r[:n]
    return out


def pad_rows(rows: Sequence[np.ndarray], width: int, pad_id: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        return pad_rows_np(rows, width, pad_id)
    flat_rows = [np.ascontiguousarray(np.asarray(r, np.int32).ravel())
                 for r in rows]
    lens = np.asarray([len(r) for r in flat_rows], np.int64)
    flat = (np.concatenate(flat_rows) if flat_rows
            else np.zeros((0,), np.int32))
    out = np.empty((len(flat_rows), width), np.int32)
    lib.ksx_pad_rows(_i32(flat), _i64(lens), len(flat_rows), width,
                     pad_id, _i32(out))
    return out


# ---------------------------------------------------------------------------
# shift_labels: next-token targets with pad masking
# ---------------------------------------------------------------------------

def shift_labels_np(ids: np.ndarray, pad_id: int,
                    ignore_id: int = -100) -> np.ndarray:
    ids = np.asarray(ids, np.int32)
    out = np.full_like(ids, ignore_id)
    out[:, :-1] = ids[:, 1:]
    out[out == pad_id] = ignore_id
    return out


def shift_labels(ids: np.ndarray, pad_id: int,
                 ignore_id: int = -100) -> np.ndarray:
    lib = _load()
    ids = np.ascontiguousarray(np.asarray(ids, np.int32))
    if lib is None or ids.ndim != 2:
        return shift_labels_np(ids, pad_id, ignore_id)
    out = np.empty_like(ids)
    lib.ksx_shift_labels(_i32(ids), ids.shape[0], ids.shape[1],
                         pad_id, ignore_id, _i32(out))
    return out
