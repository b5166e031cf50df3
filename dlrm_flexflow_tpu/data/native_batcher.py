"""ctypes bindings to the native batch gatherer (native/ffdata).

Native analog of the reference's per-iteration dataloader copy tasks
(reference: examples/cpp/DLRM/dlrm.cc:482 next_batch index launches;
python/flexflow_dataloader.cc SingleDataLoader). The host-side permuted
row gather runs multi-threaded in C++; falls back to numpy fancy indexing
when the library can't be built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libffdata.so")

_lib = None
_lib_failed = False


def get_lib():
    global _lib, _lib_failed
    if _lib is None and not _lib_failed:
        try:
            src = os.path.join(_NATIVE_DIR, "ffdata", "ffdata.cc")
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
                )
            lib = ctypes.CDLL(_LIB_PATH)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.ffdata_gather_batch.restype = None
            lib.ffdata_gather_batch.argtypes = [
                ctypes.c_int32, ctypes.POINTER(u8p), i64p, i64p, i64p,
                ctypes.c_int64, ctypes.POINTER(u8p), ctypes.c_int32,
            ]
            lib.ffdata_argsort_i64_batch.restype = None
            lib.ffdata_argsort_i64_batch.argtypes = [
                i64p, ctypes.c_int32, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def gather_batch(
    arrays: Sequence[np.ndarray],
    idx: np.ndarray,
    outs: Optional[Sequence[np.ndarray]] = None,
    num_threads: int = 0,
):
    """outs[a][i] = arrays[a][idx[i]] for every array, multi-threaded.
    Arrays must be C-contiguous; returns the out list (allocated if None)."""
    lib = get_lib()
    n = int(idx.shape[0])
    idx64 = np.ascontiguousarray(idx, np.int64)
    if outs is None:
        outs = [np.empty((n,) + a.shape[1:], a.dtype) for a in arrays]
    if lib is None:
        for a, o in zip(arrays, outs):
            # match the native library's documented clamping of bad indices
            # (np.take would raise on idx >= rows and wrap negatives)
            np.take(a, np.clip(idx64, 0, a.shape[0] - 1), axis=0, out=o)
        return outs
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    k = len(arrays)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcs = (u8p * k)()
    dsts = (u8p * k)()
    src_rows = (ctypes.c_int64 * k)()
    row_bytes = (ctypes.c_int64 * k)()
    keepalive = []  # contiguous temps must outlive the native call
    for a_i, (a, o) in enumerate(zip(arrays, outs)):
        a = np.ascontiguousarray(a)
        keepalive.append(a)
        assert o.flags["C_CONTIGUOUS"]
        srcs[a_i] = a.ctypes.data_as(u8p)
        dsts[a_i] = o.ctypes.data_as(u8p)
        src_rows[a_i] = a.shape[0]
        row_bytes[a_i] = a.dtype.itemsize * int(np.prod(a.shape[1:], dtype=np.int64))
    lib.ffdata_gather_batch(
        k, srcs, src_rows, row_bytes,
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, dsts,
        num_threads,
    )
    del keepalive
    return outs


def scatter_add_f32(table: np.ndarray, idx: np.ndarray, grads: np.ndarray,
                    scale: float = 1.0, num_threads: int = 0) -> None:
    """table[idx[i]] += scale * grads[i], in place, duplicate-safe
    multi-threaded (native ffdata; numpy np.add.at fallback)."""
    lib = get_lib()
    idx64 = np.ascontiguousarray(idx.reshape(-1), np.int64)
    g = np.ascontiguousarray(grads, np.float32)
    assert table.dtype == np.float32 and table.flags["C_CONTIGUOUS"]
    assert g.shape == (idx64.shape[0], table.shape[1])
    if lib is None:
        valid = (idx64 >= 0) & (idx64 < table.shape[0])
        np.add.at(table, idx64[valid], scale * g[valid])
        return
    if not hasattr(lib, "_scatter_ready"):
        lib.ffdata_scatter_add_f32.restype = None
        lib.ffdata_scatter_add_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_int32,
        ]
        lib._scatter_ready = True
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.ffdata_scatter_add_f32(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        table.shape[0], table.shape[1],
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), idx64.shape[0],
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale), num_threads,
    )


def argsort_i64_batch(keys: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Stable argsort per row of an int64 [T, K] array, one thread per row
    (the host-routing sort for the packed embedding update)."""
    keys = np.ascontiguousarray(keys, np.int64)
    t, k = keys.shape
    lib = get_lib()
    if lib is None:
        return np.argsort(keys, axis=1, kind="stable").astype(np.int32)
    out = np.empty((t, k), np.int32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.ffdata_argsort_i64_batch(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    return out


def argsort_i64(keys: np.ndarray, num_threads: int = 0) -> np.ndarray:
    return argsort_i64_batch(
        np.ascontiguousarray(keys, np.int64)[None], num_threads
    )[0]
