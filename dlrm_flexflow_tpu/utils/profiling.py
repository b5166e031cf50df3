"""Profiling / observability utilities.

TPU-native analog of the reference's tracing stack (reference, SURVEY §5):
 (a) per-op wall-clock brackets — OpMeta.profiling + cudaEvent prints
     "[Linear] forward time = ..." (src/ops/linear.cu:526-541)
       -> op_timing_report(): times each op's forward in isolation on staged
          inputs (device-synced via host readback; block_until_ready does not
          synchronize through remote-tunnel backends)
 (b) Legion begin/end_trace replay (dlrm.cc:174-181)
       -> jit tracing is XLA-native; trace() wraps jax.profiler for timeline
          capture instead
 (c) Legion profiler -lg:prof
       -> trace(logdir) produces TensorBoard-loadable profiles
 (d) simulator task-graph Graphviz export (--taskgraph, simulator.cc:509-558)
       -> export_task_graph(): DOT of the framework graph with per-op cost
          stats from the autotuner cost model
 (e) mapper instance-creation log (--log-instance-creation)
       -> log_shardings(): per-param/per-input sharding table
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x) -> None:
    """Force device completion with a host readback (axon-tunnel safe)."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(jax.device_get(leaf[0]))


def op_timing_report(
    model,
    feeds: Dict[str, np.ndarray],
    reps: int = 10,
    warmup: int = 2,
) -> List[Dict[str, object]]:
    """Per-op forward timings (reference: per-op cudaEvent brackets).

    Runs the graph once to stage every op's inputs, then times each op's
    jitted forward in isolation. Returns [{name, type, ms, flops, bytes}].
    """
    from ..core.graph import OpContext

    assert model._compiled, "compile() first"
    ctx = OpContext(
        training=False,
        compute_dtype=jnp.dtype(model.config.compute_dtype),
        onehot_threshold=model.config.onehot_embedding_threshold,
        taps={},
    )
    staged, _ = model._stage(feeds, None)
    params = model._params
    graph = model.graph
    # one full pass to capture every intermediate
    graph.execute(params, staged, ctx)
    taps = ctx.taps

    def inputs_of(op):
        xs = []
        for t in op.inputs:
            own = t.owner_op
            if type(own).__name__ == "InputOp":
                xs.append(jnp.asarray(staged[own.name]))
            else:
                xs.append(taps[f"{own.name}:{t.owner_idx}"])
        return xs

    rows: List[Dict[str, object]] = []
    for op in graph.compute_ops:
        xs = inputs_of(op)
        op_params = params.get(op.name, {})
        run_ctx = OpContext(
            training=False,
            compute_dtype=ctx.compute_dtype,
            onehot_threshold=ctx.onehot_threshold,
        )
        fn = jax.jit(lambda p, inp: op.forward(p, inp, run_ctx))
        for _ in range(warmup):
            out = fn(op_params, xs)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(op_params, xs)
        _sync(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        stats = op.cost_stats()
        rows.append({
            "name": op.name,
            "type": type(op).__name__,
            "ms": ms,
            "flops": stats.get("flops", 0.0),
            "bytes": stats.get("bytes", 0.0),
        })
    return rows


def print_op_timings(rows: List[Dict[str, object]]) -> None:
    """reference print format: '[Linear] forward time = 0.123ms'."""
    for r in rows:
        gflops = r["flops"] / max(r["ms"], 1e-9) / 1e6
        print(f"[{r['type']}] {r['name']} forward time = {r['ms']:.4f}ms "
              f"({gflops:.1f} GFLOP/s)")


@contextlib.contextmanager
def trace(logdir: str):
    """Timeline capture (reference analog: -lg:prof). Produces a
    TensorBoard-loadable trace under `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def export_task_graph(model, path: str) -> None:
    """Graphviz DOT export of the compute graph with cost-model annotations
    (reference: --export-strategy-task-graph-file, simulator.cc:509-558)."""
    lines = ["digraph taskgraph {", '  rankdir="LR";']
    for op in model.graph.inputs:
        lines.append(f'  "{op.name}" [shape=box, style=dashed];')
    for op in model.graph.compute_ops:
        s = op.cost_stats()
        label = (f"{op.name}\\n{type(op).__name__}\\n"
                 f"{s.get('flops', 0) / 1e6:.1f}MF {s.get('bytes', 0) / 1e6:.1f}MB")
        lines.append(f'  "{op.name}" [label="{label}"];')
        for t in op.inputs:
            lines.append(f'  "{t.owner_op.name}" -> "{op.name}";')
    lines.append("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def log_shardings(model) -> List[str]:
    """Per-array placement table (reference analog: mapper's
    --log-instance-creation, mapper.cc:559-587)."""
    rows = []
    for name, sub in (model._params or {}).items():
        for pname, arr in sub.items():
            sh = getattr(arr, "sharding", None)
            rows.append(f"param {name}/{pname} shape={tuple(arr.shape)} sharding={sh}")
    return rows


def check_numerics(model, feeds, labels) -> Dict[str, str]:
    """NaN/Inf sweep over every activation (SURVEY §5 'race detection'
    analog: the functional-purity debug aid; reference had none in-repo).
    Returns {op_output: 'nan'|'inf'} for offending tensors."""
    from ..core.graph import OpContext

    ctx = OpContext(
        training=False,
        compute_dtype=jnp.dtype(model.config.compute_dtype),
        onehot_threshold=model.config.onehot_embedding_threshold,
        taps={},
    )
    staged, _ = model._stage(feeds, None)
    model.graph.execute(model._params, staged, ctx)
    bad: Dict[str, str] = {}
    for k, v in ctx.taps.items():
        arr = np.asarray(v)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        if np.isnan(arr).any():
            bad[k] = "nan"
        elif np.isinf(arr).any():
            bad[k] = "inf"
    return bad
