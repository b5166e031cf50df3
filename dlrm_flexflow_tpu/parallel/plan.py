"""ShardingPlan: the per-op parallelization strategy container.

TPU-native analog of the reference's per-op ParallelConfig map (reference:
include/config.h:47-73 — device type + n-dim partition + explicit device
ids). On TPU a strategy is a PartitionSpec over named mesh axes per op
output/parameter, plus the embedding-table placement vector. The plan is
what the MCMC autotuner mutates (reference: FFModel::optimize,
src/runtime/model.cc:1928) and what gets exported/imported as a strategy
file (reference: src/runtime/strategy.cc:95-189).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .embedding_collection import (
    ShardedEmbeddingLayout,
    greedy_assignment,
    round_robin_assignment,
)


def hierarchical_subtable_assignment(
    subs, sub_vocabs, num_shards: int, chips_per_host: int
):
    """Host-aware placement for the hierarchical exchange: a table's split
    sub-tables are co-located on distinct chips of ONE host, so their pooled
    partials combine over ICI and cross DCN once (embedding_collection.py
    hierarchical notes). Hosts are chosen by row load (the HBM-balancing
    criterion of greedy_subtable_assignment), chips within a host likewise."""
    import numpy as np

    c = chips_per_host
    hosts = num_shards // c
    if hosts <= 1 or num_shards % c != 0:
        return greedy_subtable_assignment(subs, sub_vocabs, num_shards)
    by_table = {}
    for i, (t, _, _) in enumerate(subs):
        by_table.setdefault(t, []).append(i)
    host_load = [0] * hosts
    chip_load = [0] * num_shards
    owner = [0] * len(subs)
    order = sorted(
        by_table, key=lambda t: -sum(sub_vocabs[i] for i in by_table[t])
    )
    for t in order:
        members = by_table[t]
        # chunks of <=C subs each get one host (split > C spans hosts)
        for lo in range(0, len(members), c):
            chunk = members[lo : lo + c]
            h = int(np.argmin(host_load))
            chips = sorted(
                range(h * c, (h + 1) * c), key=lambda s: chip_load[s]
            )
            for j, i in enumerate(chunk):
                s = chips[j]
                owner[i] = s
                chip_load[s] += sub_vocabs[i]
                host_load[h] += sub_vocabs[i]
    return owner


def greedy_subtable_assignment(subs, sub_vocabs, num_shards: int):
    """HBM-balancing placement over sub-tables, preferring not to co-locate
    two sub-tables of the same table (that would defeat the split)."""
    import numpy as np

    owner = [0] * len(subs)
    load = [0] * num_shards
    shard_tables = [set() for _ in range(num_shards)]
    for i in sorted(range(len(subs)), key=lambda i: -sub_vocabs[i]):
        t = subs[i][0]
        order = np.argsort(load, kind="stable")
        pick = None
        for s in order:
            if t not in shard_tables[int(s)]:
                pick = int(s)
                break
        if pick is None:
            pick = int(order[0])
        owner[i] = pick
        load[pick] += sub_vocabs[i]
        shard_tables[pick].add(t)
    return owner


def _spec_to_list(spec: P) -> list:
    return [list(x) if isinstance(x, tuple) else x for x in spec]


def _list_to_spec(lst) -> P:
    return P(*[tuple(x) if isinstance(x, list) else x for x in lst])


@dataclasses.dataclass
class OpShardSpec:
    """Per-op strategy entry (≅ one ParallelConfig)."""

    # one PartitionSpec per op output
    output_specs: Optional[List[P]] = None
    # param key -> PartitionSpec (e.g. dense kernel column-sharded for TP)
    param_specs: Optional[Dict[str, P]] = None

    def to_json(self):
        return {
            "outputs": [_spec_to_list(s) for s in (self.output_specs or [])],
            "params": {k: _spec_to_list(v) for k, v in (self.param_specs or {}).items()},
        }

    @staticmethod
    def from_json(d) -> "OpShardSpec":
        return OpShardSpec(
            output_specs=[_list_to_spec(s) for s in d.get("outputs", [])] or None,
            param_specs={k: _list_to_spec(v) for k, v in d.get("params", {}).items()}
            or None,
        )


@dataclasses.dataclass
class ShardingPlan:
    """The full strategy: mesh geometry + per-op specs + table placement."""

    mesh_axes: Tuple[str, ...] = ("data",)
    batch_axis: str = "data"
    # "table_parallel" shards embedding tables over batch_axis devices with
    # all-to-all exchange; "replicated" keeps tables replicated (pure DP).
    embedding_mode: str = "table_parallel"
    # sub-table index -> shard; None => auto. With table_split all ones
    # this is one entry per table (reference ParallelConfig device_ids analog).
    table_assignment: Optional[List[int]] = None
    # per-table row-split degree (1 = whole table on one shard). Splitting a
    # hot table spreads its lookups/scatter over several shards — the
    # parallelism-DEGREE axis of the reference's per-op search space
    # (see embedding_collection.py row-splitting notes / PERF.md).
    table_split: Optional[List[int]] = None
    # graph-order embedding indices that stay OUT of the fused collection
    # (replicated one-hot execution). None => use the config's one-hot
    # threshold; chosen by the autotuner's placement-vs-replication search.
    replicated_tables: Optional[List[int]] = None
    # "round_robin" (reference parity) | "greedy" (HBM balancing)
    assignment_policy: str = "greedy"
    # chips per host for the hierarchical (ICI-combine-then-DCN) pooled
    # exchange; None/0 = flat single-stage all-to-all. Splits get co-located
    # within a host so DCN carries one partial row per (host, table).
    chips_per_host: Optional[int] = None
    # pooled-exchange mode: "dense" slot exchange or "routed" capacity
    # buckets (parallel/routed_exchange.py; SUM pooling only)
    exchange: str = "dense"
    routed_cap_factor: float = 2.0
    # store the sharded pool packed ([R_pad*D/128, 128] per shard) so the
    # local row update runs the Pallas packed kernel instead of the XLA
    # scatter (set by compile() from backend + optimizer; None = off)
    packed_pool: Optional[bool] = None
    # hash-permuted row placement (affine bijection per table): uniformizes
    # sub-bucket loads on skewed data so routed-mode capacity drops become
    # Binomial-rare; None = auto (on for routed mode with splits)
    hash_rows: Optional[bool] = None
    # host-tail offload (parallel/host_tail.py): per-table (graph order)
    # device-resident hot-prefix length; 0 = whole table on device, k > 0 =
    # rows [k, vocab) live in the demand-allocated host store. The TPU
    # recast of the reference's hetero CPU embedding placement
    # (dlrm_strategy_hetero.cc, strategy.cc:114-122); None = auto from
    # FFConfig.host_tail_threshold or the capacity-aware search
    host_tail_rows: Optional[List[int]] = None
    op_specs: Dict[str, OpShardSpec] = dataclasses.field(default_factory=dict)

    # ------------------------------------------------------------------ exec
    def batch_spec(self, ndim: int) -> P:
        return P(self.batch_axis, *([None] * (ndim - 1)))

    def input_shardings(self, graph, mesh: Mesh) -> Dict[str, NamedSharding]:
        """Batch-sharded shardings for every graph input (the data-loader
        contract; reference analog: dataloader next_batch index launches
        copying into partitioned batch tensors, dlrm.cc:482)."""
        out = {}
        for iop in graph.inputs:
            nd = len(iop.outputs[0].shape)
            out[iop.name] = NamedSharding(mesh, self.batch_spec(nd))
        return out

    def label_sharding(self, mesh: Mesh, ndim: int = 2) -> NamedSharding:
        return NamedSharding(mesh, self.batch_spec(ndim))

    def constrain_outputs(self, op, ys, mesh: Mesh):
        """Apply explicit per-op constraints (reference analog: the mapper
        enacting each op's ParallelConfig, mapper.cc:346-438). Ops without an
        entry are left to GSPMD propagation."""
        entry = self.op_specs.get(op.name)
        if entry is None or entry.output_specs is None:
            return ys
        out = []
        for y, spec in zip(ys, entry.output_specs):
            out.append(jax.lax.with_sharding_constraint(y, NamedSharding(mesh, spec)))
        out.extend(ys[len(out):])
        return out

    def shard_params(self, params, graph, mesh: Mesh):
        """Place initialized parameters onto the mesh: embedding pools on
        their table axis, per-op overrides, everything else replicated."""
        by_op = {op.name: op for op in graph.compute_ops}
        out = {}
        for op_name, sub in params.items():
            op = by_op.get(op_name)
            entry = self.op_specs.get(op_name)
            new_sub = {}
            for key, val in sub.items():
                spec = P()
                if entry is not None and entry.param_specs and key in entry.param_specs:
                    spec = entry.param_specs[key]
                elif key == "pool" and hasattr(op, "layout"):
                    spec = op.layout.param_spec(self.batch_axis)
                new_sub[key] = jax.device_put(val, NamedSharding(mesh, spec))
            out[op_name] = new_sub
        return out

    # ------------------------------------------------------------------ build
    def make_layout(
        self, vocab_sizes: Sequence[int], dim: int, num_shards: int
    ) -> ShardedEmbeddingLayout:
        from .embedding_collection import expand_subtables

        split = self.table_split
        if split is not None:
            assert len(split) == len(vocab_sizes)
        subs = expand_subtables(vocab_sizes, split)
        cph = self.chips_per_host or None
        if cph and (num_shards % cph != 0 or num_shards == cph or cph <= 1):
            cph = None
        assignment = self.table_assignment
        if assignment is not None and len(assignment) == len(vocab_sizes) and (
            len(subs) != len(vocab_sizes)
        ):
            # per-table assignment + splits: stripe each table's sub-tables
            # round-robin starting at its assigned shard — within the
            # assigned shard's host under the hierarchical exchange (keeps
            # split partials combining over ICI, crossing DCN once)
            counter = {}
            expanded = []
            for (t, _, _) in subs:
                k = counter.get(t, 0)
                counter[t] = k + 1
                a = assignment[t]
                if cph:
                    host = a // cph
                    expanded.append(host * cph + (a % cph + k) % cph)
                else:
                    expanded.append((a + k) % num_shards)
            assignment = expanded
        if assignment is None:
            sub_vocabs = [l for (_, _, l) in subs]
            if self.assignment_policy == "round_robin":
                assignment = round_robin_assignment(len(subs), num_shards)
            elif cph:
                assignment = hierarchical_subtable_assignment(
                    subs, sub_vocabs, num_shards, cph
                )
            else:
                assignment = greedy_subtable_assignment(subs, sub_vocabs, num_shards)
            self.table_assignment = assignment
        assert len(assignment) == len(subs)
        hash_rows = self.hash_rows
        if hash_rows is None:
            # auto: routed capacity buckets + splits is exactly the regime
            # where Zipf-hot rows overflow a sub-bucket
            hash_rows = bool(
                self.exchange == "routed"
                and self.routed_cap_factor > 0
                and split is not None
                and any(x > 1 for x in split)
            )
            self.hash_rows = hash_rows
        return ShardedEmbeddingLayout(
            list(vocab_sizes), dim, num_shards, assignment,
            split=list(split) if split else None, chips_per_host=cph,
            exchange=self.exchange, routed_cap_factor=self.routed_cap_factor,
            packed_pool=bool(self.packed_pool), hash_rows=bool(hash_rows),
        )

    # ------------------------------------------------------------------ file IO
    def save(self, path: str) -> None:
        """Export the strategy (reference: save_strategies_to_file,
        strategy.cc:150; export flag --export)."""
        doc = {
            "version": 1,
            "mesh_axes": list(self.mesh_axes),
            "batch_axis": self.batch_axis,
            "embedding_mode": self.embedding_mode,
            "assignment_policy": self.assignment_policy,
            "table_assignment": self.table_assignment,
            "table_split": self.table_split,
            "replicated_tables": self.replicated_tables,
            "chips_per_host": self.chips_per_host,
            "exchange": self.exchange,
            "routed_cap_factor": self.routed_cap_factor,
            "packed_pool": self.packed_pool,
            "hash_rows": self.hash_rows,
            "host_tail_rows": self.host_tail_rows,
            "ops": {k: v.to_json() for k, v in self.op_specs.items()},
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)

    @staticmethod
    def load(path: str) -> "ShardingPlan":
        """Import a strategy (reference: load_strategies_from_file,
        strategy.cc:95; --import flag consumed at compile, model.cc:1575)."""
        with open(path) as f:
            doc = json.load(f)
        return ShardingPlan(
            mesh_axes=tuple(doc["mesh_axes"]),
            batch_axis=doc["batch_axis"],
            embedding_mode=doc["embedding_mode"],
            assignment_policy=doc.get("assignment_policy", "greedy"),
            table_assignment=doc.get("table_assignment"),
            table_split=doc.get("table_split"),
            replicated_tables=doc.get("replicated_tables"),
            chips_per_host=doc.get("chips_per_host"),
            exchange=doc.get("exchange", "dense"),
            routed_cap_factor=doc.get("routed_cap_factor", 2.0),
            packed_pool=doc.get("packed_pool"),
            hash_rows=doc.get("hash_rows"),
            host_tail_rows=doc.get("host_tail_rows"),
            op_specs={k: OpShardSpec.from_json(v) for k, v in doc.get("ops", {}).items()},
        )


def data_parallel_plan() -> ShardingPlan:
    """Pure DP baseline (reference: get_basic_data_parallel_config,
    model.cc:500 — the search's starting point)."""
    return ShardingPlan(embedding_mode="replicated")


def dlrm_hybrid_plan(policy: str = "greedy") -> ShardingPlan:
    """The DLRM default: dense DP + table-parallel embeddings (reference:
    the hand-crafted dlrm strategy, dlrm_strategy.py:26-47)."""
    return ShardingPlan(embedding_mode="table_parallel", assignment_policy=policy)


def enable_parameter_parallel(
    plan: ShardingPlan, graph, model_axis: str = "model", min_out_dim: int = 64,
    only=None,
) -> ShardingPlan:
    """Add tensor-parallel (reference vocabulary: parameter-parallel) specs
    for Dense layers: the [out, in] kernel is sharded on its output-channel
    dim over `model_axis`, activations on [batch, out/axis]; XLA inserts the
    reductions the reference built by hand as replica tensors + the
    LINEAR_BWD2 reduction tree (reference: src/ops/linear.cu:769-960,
    create_linear_replica model.cc:1268; gated by --enable-parameter-parallel,
    config.h:141). Layers narrower than `min_out_dim` stay replicated (the
    collective would cost more than the matmul, same judgment the reference's
    search makes via measured cost)."""
    from ..ops.dense import Dense

    if model_axis not in plan.mesh_axes:
        plan.mesh_axes = tuple(plan.mesh_axes) + (model_axis,)
    for op in graph.compute_ops:
        if not isinstance(op, Dense) or op.out_dim < min_out_dim:
            continue
        if only is not None and op.name not in only:
            # per-op TP selection from the joint search (tp_ops)
            continue
        if op.out_dim % 2 != 0:  # unsplittable heads (e.g. final dim 1)
            continue
        specs = {"kernel": P(model_axis, None)}
        if op.use_bias:
            specs["bias"] = P(model_axis)
        out_nd = len(op.outputs[0].shape)
        out_spec = P(plan.batch_axis, *([None] * (out_nd - 2)), model_axis)
        plan.op_specs[op.name] = OpShardSpec(
            output_specs=[out_spec], param_specs=specs
        )
    return plan
