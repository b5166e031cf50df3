"""High-level autotuner: graph -> cost spec -> MCMC -> ShardingPlan.

Analog of the reference strategy-search entry (reference:
Simulator::strategy_search_task, src/runtime/simulator.cu:71-153, invoked
from FFModel::compile when --budget > 0, model.cc:1578; search loop
FFModel::optimize model.cc:1928). The discrete variable here is the
embedding-table placement vector (the reference DLRM's per-op device
assignment); dense ops are data-parallel as in the reference's default
strategies.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from ..core.graph import Graph
from ..ffconst import OperatorType
from . import bindings
from .machine import MachineSpec


def graph_to_cost_spec(graph: Graph, global_batch: int) -> Tuple[List[dict], List[str]]:
    """Lower graph ops to FFSimOp dicts. Returns (ops, embed_op_names) where
    embed_op_names lists the FFSIM_EMBED entries in order (per table)."""
    ops: List[dict] = []
    embed_names: List[str] = []
    for op in graph.compute_ops:
        stats = op.cost_stats()
        batch = op.outputs[0].shape[0] if op.outputs and op.outputs[0].shape else 1
        scale = global_batch / max(1, batch)
        if op.op_type is OperatorType.OP_EMBEDDING and hasattr(op, "layout"):
            # collection: one FFSIM_EMBED entry per table
            lay = op.layout
            bag = op.inputs[0].shape[1] if op.inputs[0].num_dims > 1 else 1
            for t, vocab in enumerate(lay.vocab_sizes):
                ops.append({
                    "kind": bindings.KIND_EMBED,
                    "table_rows": float(vocab),
                    "row_bytes": 4.0 * lay.dim,
                    "lookups": float(global_batch * bag),
                })
                embed_names.append(f"{op.name}[{t}]")
        elif op.op_type is OperatorType.OP_EMBEDDING:
            bag = op.inputs[0].shape[1] if op.inputs[0].num_dims > 1 else 1
            ops.append({
                "kind": bindings.KIND_EMBED,
                "table_rows": float(op.num_entries),
                "row_bytes": 4.0 * op.out_dim,
                "lookups": float(global_batch * bag),
            })
            embed_names.append(op.name)
        else:
            kind = (
                bindings.KIND_DENSE
                if op.op_type in (OperatorType.OP_LINEAR, OperatorType.OP_CONV2D,
                                  OperatorType.OP_BATCHMATMUL,
                                  OperatorType.OP_MULTIHEAD_ATTENTION)
                else bindings.KIND_OTHER
            )
            ops.append({
                "kind": kind,
                "flops": stats["flops"] * scale,
                "bytes": stats["bytes"] * scale,
                "param_bytes": stats["param_bytes"],
            })
    return ops, embed_names


def autotune_plan(
    graph: Graph,
    machine: MachineSpec,
    global_batch: int,
    budget: int = 20000,
    alpha: float = 0.05,
    seed: int = 0,
    opt_state_factor: float = 0.0,
    initial_owner: Optional[List[int]] = None,
):
    """Run the MCMC placement search. Returns (owner, predicted_us, report).

    report includes the cost breakdown of the found plan and of the
    round-robin baseline (the reference's default DP-ish starting point).
    """
    ops, embed_names = graph_to_cost_spec(graph, global_batch)
    n_tables = len(embed_names)
    m = machine.to_native()
    if n_tables == 0:
        return [], bindings.simulate(m, ops, [], opt_state_factor), {}
    rr = [i % machine.num_chips for i in range(n_tables)]
    owner = list(initial_owner) if initial_owner is not None else list(rr)
    rr_cost = bindings.simulate(m, ops, rr, opt_state_factor)
    best_owner, best_cost = bindings.mcmc_search(
        m, ops, owner, budget=budget, alpha=alpha, seed=seed,
        opt_state_factor=opt_state_factor,
    )
    report = {
        "tables": embed_names,
        "round_robin_us": rr_cost,
        "best_us": best_cost,
        "improvement": rr_cost / best_cost if best_cost > 0 else 1.0,
        "breakdown": bindings.breakdown(m, ops, best_owner, opt_state_factor),
    }
    return best_owner, best_cost, report
