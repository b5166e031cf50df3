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
from typing import Sequence

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
        # v2: topology-aware machine + packed-update + DAG scoring
        ("ici_axis_x", ctypes.c_int32),
        ("ici_axis_y", ctypes.c_int32),
        ("ici_domain", ctypes.c_int32),
        ("update_pass_gbps", ctypes.c_double),
        ("update_ns_per_row", ctypes.c_double),
        ("update_us_per_table", ctypes.c_double),
        ("use_dag", ctypes.c_int32),
        ("routed_exchange", ctypes.c_int32),
        ("routed_cap", ctypes.c_double),
        ("routing_ns_per_entry", ctypes.c_double),
        ("model_axis", ctypes.c_int32),
        # host-tail offload terms (parallel/host_tail.py; table mode 2)
        ("pcie_gbps", ctypes.c_double),
        ("pcie_latency_us", ctypes.c_double),
        ("host_row_ns", ctypes.c_double),
        # dense-parameter sync comparison: 0 = allreduce (the runtime's
        # XLA psum), 1 = parameter-server (reference simulator.cc:403-498
        # models both; kept for cost comparison only)
        ("param_sync", ctypes.c_int32),
        ("ps_gbps", ctypes.c_double),
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
        ("stage", ctypes.c_int32),
        ("act_bytes", ctypes.c_double),
        ("fwd_us", ctypes.c_double),
        # host-tail candidacy (mode 2 viable when tail_hot_rows > 0)
        ("tail_hot_rows", ctypes.c_double),
        ("tail_miss_frac", ctypes.c_double),
        # packed-table STORAGE bytes/row (config.table_dtype; 0 => row_bytes)
        ("table_row_bytes", ctypes.c_double),
        # expected touched-chunk fraction for the selective update pass
        # (0 => 1.0 full pass)
        ("upd_touched_frac", ctypes.c_double),
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
        i32p = ctypes.POINTER(ctypes.c_int32)
        sim2_head = [
            ctypes.POINTER(FFSimMachine), ctypes.POINTER(FFSimOp),
            ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_double,
        ]
        lib.ffsim2_simulate.restype = ctypes.c_double
        lib.ffsim2_simulate.argtypes = sim2_head
        lib.ffsim2_breakdown.restype = None
        lib.ffsim2_breakdown.argtypes = sim2_head + [
            ctypes.POINTER(ctypes.c_double)
        ]
        lib.ffsim2_search.restype = ctypes.c_double
        lib.ffsim2_search.argtypes = [
            ctypes.POINTER(FFSimMachine), ctypes.POINTER(FFSimOp),
            ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32, i32p,
            ctypes.c_int32, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_double, ctypes.c_uint64,
        ]
        # v2g: graph-generic DAG scoring (real op edges instead of the
        # 3-stage DLRM shape)
        oe_tail = [i32p, i32p, ctypes.c_int32]
        lib.ffsim2g_simulate.restype = ctypes.c_double
        lib.ffsim2g_simulate.argtypes = sim2_head + oe_tail
        lib.ffsim2g_breakdown.restype = None
        lib.ffsim2g_breakdown.argtypes = (
            sim2_head + oe_tail + [ctypes.POINTER(ctypes.c_double)]
        )
        lib.ffsim2g_search.restype = ctypes.c_double
        lib.ffsim2g_search.argtypes = lib.ffsim2_search.argtypes + oe_tail
        lib.ffsim2_wire_bytes.restype = None
        lib.ffsim2_wire_bytes.argtypes = [
            ctypes.POINTER(FFSimMachine), ctypes.POINTER(FFSimOp),
            ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    return _lib


def _i32(vals, min_len: int = 1):
    vals = list(vals)
    return (ctypes.c_int32 * max(min_len, len(vals)))(*(vals or [0]))


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
        arr[i].stage = op.get("stage", 2)
        arr[i].act_bytes = op.get("act_bytes", 0.0)
        arr[i].fwd_us = op.get("fwd_us", 0.0)
        arr[i].tail_hot_rows = op.get("tail_hot_rows", 0.0)
        arr[i].tail_miss_frac = op.get("tail_miss_frac", 0.0)
        arr[i].table_row_bytes = op.get("table_row_bytes", 0.0)
        arr[i].upd_touched_frac = op.get("upd_touched_frac", 0.0)
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


def simulate2(machine: FFSimMachine, ops: Sequence[dict], owner, split, mode,
              tp, opt_state_factor: float = 0.0, op_edges=()) -> float:
    """v2 simulate: joint (owner, split, mode, tp) state. With `op_edges`
    [(src_op_idx, dst_op_idx)] the step is scored on the graph-generic task
    DAG (ffsim2g, reference simulator.cc:328-498) instead of the staged one."""
    lib = get_lib()
    arr = _ops_array(ops)
    nt, nd = len(owner), len(tp)
    if op_edges:
        return lib.ffsim2g_simulate(
            ctypes.byref(machine), arr, len(ops), _i32(owner), _i32(split),
            _i32(mode), nt, _i32(tp), nd, opt_state_factor,
            _i32([e[0] for e in op_edges]), _i32([e[1] for e in op_edges]),
            len(op_edges),
        )
    return lib.ffsim2_simulate(
        ctypes.byref(machine), arr, len(ops), _i32(owner), _i32(split),
        _i32(mode), nt, _i32(tp), nd, opt_state_factor,
    )


def breakdown2(machine: FFSimMachine, ops: Sequence[dict], owner, split, mode,
               tp, opt_state_factor: float = 0.0, op_edges=()) -> dict:
    lib = get_lib()
    arr = _ops_array(ops)
    out = (ctypes.c_double * 9)()
    if op_edges:
        lib.ffsim2g_breakdown(
            ctypes.byref(machine), arr, len(ops), _i32(owner), _i32(split),
            _i32(mode), len(owner), _i32(tp), len(tp), opt_state_factor,
            _i32([e[0] for e in op_edges]), _i32([e[1] for e in op_edges]),
            len(op_edges), out,
        )
    else:
        lib.ffsim2_breakdown(
            ctypes.byref(machine), arr, len(ops), _i32(owner), _i32(split),
            _i32(mode), len(owner), _i32(tp), len(tp), opt_state_factor, out,
        )
    keys = ["dense_us", "embed_fwd_max_us", "embed_upd_max_us", "all2all_us",
            "allreduce_us", "update_us", "mem_penalty_us", "total_us",
            "closed_form_us"]
    return dict(zip(keys, list(out)))


def search2(machine: FFSimMachine, ops: Sequence[dict], owner, split, mode,
            tp, vocab_caps, edges=(), budget: int = 20000,
            alpha: float = 0.05, seed: int = 0,
            opt_state_factor: float = 0.0, split_cap: int = 0,
            op_edges=()):
    """Joint annealer. edges: [(src_dense_idx, dst_dense_idx, volume)] for
    the propagate moves; op_edges: [(src_op_idx, dst_op_idx)] — when given,
    candidates are scored on the graph-generic task DAG.
    Returns (owner, split, mode, tp, best_cost)."""
    lib = get_lib()
    arr = _ops_array(ops)
    nt, nd = len(owner), len(tp)
    own, spl, mod = _i32(owner), _i32(split), _i32(mode)
    tpa = _i32(tp)
    caps = _i32(vocab_caps, min_len=max(1, nt))
    es = _i32([e[0] for e in edges])
    ed = _i32([e[1] for e in edges])
    ev = (ctypes.c_double * max(1, len(edges)))(
        *([float(e[2]) for e in edges] or [0.0])
    )
    if op_edges:
        cost = lib.ffsim2g_search(
            ctypes.byref(machine), arr, len(ops), own, spl, mod, nt, tpa, nd,
            caps, es, ed, ev, len(edges), opt_state_factor, split_cap,
            budget, alpha, seed,
            _i32([e[0] for e in op_edges]), _i32([e[1] for e in op_edges]),
            len(op_edges),
        )
    else:
        cost = lib.ffsim2_search(
            ctypes.byref(machine), arr, len(ops), own, spl, mod, nt, tpa, nd,
            caps, es, ed, ev, len(edges), opt_state_factor, split_cap,
            budget, alpha, seed,
        )
    return (list(own[:nt]), list(spl[:nt]), list(mod[:nt]),
            list(tpa[:nd]), cost)


def wire_bytes(machine: FFSimMachine, ops: Sequence[dict], owner, split,
               mode) -> dict:
    """Modeled exchange wire volumes (full fwd-direction bytes): keys
    slot_payload / domain_payload / routed_wire. Used by the CI cross-check
    pinning the cost model to the runtime's step_exchange_bytes."""
    lib = get_lib()
    arr = _ops_array(ops)
    out = (ctypes.c_double * 3)()
    lib.ffsim2_wire_bytes(
        ctypes.byref(machine), arr, len(ops), _i32(owner), _i32(split),
        _i32(mode), len(owner), out,
    )
    return {
        "slot_payload": out[0],
        "domain_payload": out[1],
        "routed_wire": out[2],
    }


def schedule_dag(num_devices: int, durations, device_of, edges) -> float:
    lib = get_lib()
    n = len(durations)
    dur = (ctypes.c_double * n)(*durations)
    dev = (ctypes.c_int32 * n)(*device_of)
    ne = len(edges)
    src = (ctypes.c_int32 * max(1, ne))(*[e[0] for e in edges] or [0])
    dst = (ctypes.c_int32 * max(1, ne))(*[e[1] for e in edges] or [0])
    return lib.ffsim_schedule_dag(num_devices, dur, dev, n, src, dst, ne)
