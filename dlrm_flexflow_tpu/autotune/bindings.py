"""ctypes bindings to the native ffsim core (native/ffsim).

The reference's simulator + MCMC search are C++/CUDA inside the runtime
(src/runtime/simulator.cc, model.cc:1928); ours is a standalone C++ library
built on demand with g++ and loaded via ctypes (the environment provides no
pybind11; flat-C ABI keeps the boundary simple).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libffsim.so")

_lib = None


class FFSimMachine(ctypes.Structure):
    _fields_ = [
        ("num_chips", ctypes.c_int32),
        ("chips_per_host", ctypes.c_int32),
        ("mxu_tflops", ctypes.c_double),
        ("hbm_gbps", ctypes.c_double),
        ("hbm_capacity_gb", ctypes.c_double),
        ("ici_gbps", ctypes.c_double),
        ("ici_latency_us", ctypes.c_double),
        ("dcn_gbps", ctypes.c_double),
        ("dcn_latency_us", ctypes.c_double),
        ("gather_gbps", ctypes.c_double),
        ("scatter_gbps", ctypes.c_double),
        ("step_overhead_us", ctypes.c_double),
        ("segment_bytes", ctypes.c_double),
        ("max_segments", ctypes.c_double),
        ("overlap_backward_update", ctypes.c_double),
        ("hierarchical_a2a", ctypes.c_double),
    ]


class FFSimOp(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("flops", ctypes.c_double),
        ("bytes", ctypes.c_double),
        ("param_bytes", ctypes.c_double),
        ("table_rows", ctypes.c_double),
        ("row_bytes", ctypes.c_double),
        ("lookups", ctypes.c_double),
        ("pooled_rows", ctypes.c_double),
        ("sub_count", ctypes.c_double),
        ("wire_row_bytes", ctypes.c_double),
    ]


KIND_DENSE, KIND_EMBED, KIND_OTHER = 0, 1, 2


def build_native(force: bool = False) -> str:
    """Compile libffsim.so if missing/stale. Returns the .so path."""
    src = os.path.join(_NATIVE_DIR, "ffsim", "ffsim.cc")
    hdr = os.path.join(_NATIVE_DIR, "ffsim", "ffsim.h")
    if (
        force
        or not os.path.exists(_LIB_PATH)
        or os.path.getmtime(_LIB_PATH) < max(os.path.getmtime(src), os.path.getmtime(hdr))
    ):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def get_lib():
    global _lib
    if _lib is None:
        path = build_native()
        lib = ctypes.CDLL(path)
        lib.ffsim_simulate.restype = ctypes.c_double
        lib.ffsim_simulate.argtypes = [
            ctypes.POINTER(FFSimMachine),
            ctypes.POINTER(FFSimOp),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_double,
        ]
        lib.ffsim_breakdown.restype = None
        lib.ffsim_breakdown.argtypes = lib.ffsim_simulate.argtypes[:6] + [
            ctypes.POINTER(ctypes.c_double)
        ]
        lib.ffsim_mcmc_search.restype = ctypes.c_double
        lib.ffsim_mcmc_search.argtypes = [
            ctypes.POINTER(FFSimMachine),
            ctypes.POINTER(FFSimOp),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_uint64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.ffsim_schedule_dag.restype = ctypes.c_double
        lib.ffsim_schedule_dag.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
    return _lib


def _ops_array(ops: Sequence[dict]):
    arr = (FFSimOp * len(ops))()
    for i, op in enumerate(ops):
        arr[i].kind = op.get("kind", KIND_OTHER)
        arr[i].flops = op.get("flops", 0.0)
        arr[i].bytes = op.get("bytes", 0.0)
        arr[i].param_bytes = op.get("param_bytes", 0.0)
        arr[i].table_rows = op.get("table_rows", 0.0)
        arr[i].row_bytes = op.get("row_bytes", 0.0)
        arr[i].lookups = op.get("lookups", 0.0)
        arr[i].pooled_rows = op.get("pooled_rows", 0.0)
        arr[i].sub_count = op.get("sub_count", 1.0)
        arr[i].wire_row_bytes = op.get("wire_row_bytes", 0.0)
    return arr


def simulate(machine: FFSimMachine, ops: Sequence[dict], owner: Sequence[int],
             opt_state_factor: float = 0.0) -> float:
    lib = get_lib()
    arr = _ops_array(ops)
    own = (ctypes.c_int32 * max(1, len(owner)))(*list(owner) or [0])
    return lib.ffsim_simulate(
        ctypes.byref(machine), arr, len(ops), own, len(owner), opt_state_factor
    )


def breakdown(machine: FFSimMachine, ops: Sequence[dict], owner: Sequence[int],
              opt_state_factor: float = 0.0) -> dict:
    lib = get_lib()
    arr = _ops_array(ops)
    own = (ctypes.c_int32 * max(1, len(owner)))(*list(owner) or [0])
    out = (ctypes.c_double * 7)()
    lib.ffsim_breakdown(
        ctypes.byref(machine), arr, len(ops), own, len(owner), opt_state_factor, out
    )
    keys = ["dense_us", "embed_max_us", "all2all_us", "allreduce_us",
            "update_us", "mem_penalty_us", "total_us"]
    return dict(zip(keys, list(out)))


def mcmc_search(machine: FFSimMachine, ops: Sequence[dict], owner: Sequence[int],
                budget: int = 10000, alpha: float = 0.05, seed: int = 0,
                opt_state_factor: float = 0.0):
    """Returns (best_owner_list, best_makespan_us)."""
    lib = get_lib()
    arr = _ops_array(ops)
    own = (ctypes.c_int32 * max(1, len(owner)))(*list(owner) or [0])
    cost = lib.ffsim_mcmc_search(
        ctypes.byref(machine), arr, len(ops), own, len(owner), opt_state_factor,
        budget, alpha, seed, 0, None, 0,
    )
    return list(own[: len(owner)]), cost


def schedule_dag(num_devices: int, durations, device_of, edges) -> float:
    lib = get_lib()
    n = len(durations)
    dur = (ctypes.c_double * n)(*durations)
    dev = (ctypes.c_int32 * n)(*device_of)
    ne = len(edges)
    src = (ctypes.c_int32 * max(1, ne))(*[e[0] for e in edges] or [0])
    dst = (ctypes.c_int32 * max(1, ne))(*[e[1] for e in edges] or [0])
    return lib.ffsim_schedule_dag(num_devices, dur, dev, n, src, dst, ne)
