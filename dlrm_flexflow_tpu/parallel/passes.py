"""Compile-time graph passes for distributed execution.

The embedding-fusion pass is our analog of two reference mechanisms at once:
FFModel::compile creating per-op partitions from strategies
(src/runtime/model.cc:1629-1646) and the DLRM strategy placing each table on
one device (dlrm_strategy.py:26-34). All same-dim/same-aggr Embedding ops
collapse into one EmbeddingCollection whose parameter is a [N, R_pad, D]
pooled array sharded over the mesh; the exchange happens inside the op.
"""
from __future__ import annotations

import math
from typing import List, Optional

from ..core.graph import Graph
from ..ops.embedding import Embedding
from ..ops.embedding_collection_op import EmbeddingCollection
from .plan import ShardingPlan


def offload_embedding_tails(
    graph: Graph, plan: Optional[ShardingPlan], config,
) -> List[tuple]:
    """Rewrite huge-vocab Embedding ops for host-tail offload: the device
    keeps rows [0, hot), rows [hot, vocab) live in a demand-allocated host
    store, and the op gains (pos, val) inputs carrying the host's pooled
    tail partials (parallel/host_tail.py). Returns
    [(op, sparse_feed_name, full_vocab, hot, k_cap)].

    Placement comes from plan.host_tail_rows (graph-order per-table device
    prefix; 0 = whole table on device) or, when unset, from
    config.host_tail_threshold (tables with vocab above it keep exactly
    `threshold` rows on device). The strategy axis of the reference's
    hetero CPU placement (dlrm_strategy_hetero.cc) recast for TPU+host.
    """
    from ..core.graph import InputOp
    from ..ffconst import AggrMode, DataType

    embeds: List[Embedding] = [
        op for op in graph.compute_ops if isinstance(op, Embedding)
    ]
    tail_rows = plan.host_tail_rows if plan is not None else None
    thr = int(getattr(config, "host_tail_threshold", 0) or 0)
    if tail_rows is None and thr <= 0:
        return []
    out = []
    cap_frac = float(getattr(config, "host_tail_cap_frac", 1.0 / 16))
    for t, e in enumerate(embeds):
        hot = 0
        if tail_rows is not None:
            if t < len(tail_rows) and tail_rows[t]:
                hot = int(tail_rows[t])
        elif thr > 0 and e.num_entries > thr:
            hot = thr
        if hot <= 0 or hot >= e.num_entries or e.aggr is not AggrMode.AGGR_MODE_SUM:
            continue
        full = e.num_entries
        idx_spec = e.inputs[0]
        bag = idx_spec.shape[1] if idx_spec.num_dims > 1 else 1
        k_cap = max(8, int(-(-idx_spec.shape[0] * bag * cap_frac // 8)) * 8)
        pos_in = graph.add_op(InputOp(
            f"_hosttail:{e.name}:pos", (k_cap,), DataType.DT_INT32
        ))
        val_in = graph.add_op(InputOp(
            f"_hosttail:{e.name}:val", (k_cap, e.out_dim), DataType.DT_FLOAT
        ))
        # shrink the device table to the hot prefix BEFORE init_params (a
        # 293M x 128 f32 init would not fit anywhere). The hot prefix must
        # be distributed like rows of the FULL [vocab, D] table (the
        # host-tail contract: semantically one dense table) — Glorot's fan
        # would otherwise be computed from the SHRUNK shape, initializing
        # hot rows sqrt(full/hot)x larger than the tail store's rows.
        from ..core.initializers import GlorotUniform, UniformInitializer

        init = e.params[0].initializer
        if isinstance(init, GlorotUniform):
            limit = init.scale * math.sqrt(6.0 / (full + e.out_dim))
            e.params[0].initializer = UniformInitializer(
                min_val=-limit, max_val=limit
            )
            # the tail store mirrors the same distribution (FFModel
            # _setup_host_tail reads this instead of recomputing)
            e.host_tail_init_scale = limit
        e.num_entries = hot
        e.params[0].shape = (hot, e.out_dim)
        e.enable_host_tail(full, pos_in.outputs[0], val_in.outputs[0])
        out.append((e, idx_spec.owner_op.name, full, hot, k_cap))
    if out and plan is not None and plan.host_tail_rows is None:
        # record the decision so strategy export round-trips it
        lookup = {id(e): hot for (e, _, _, hot, _) in out}
        plan.host_tail_rows = [lookup.get(id(e), 0) for e in embeds]
    return out


def fuse_embedding_tables(
    graph: Graph, plan: ShardingPlan, num_shards: int,
    min_vocab: int = 0,
) -> Optional[EmbeddingCollection]:
    """Rewrite `graph` in place: replace all fusable Embedding ops with one
    EmbeddingCollection. Returns the collection op (or None if <2 tables).

    Fusable = same out_dim, same aggr mode, same batch size, and vocab >
    `min_vocab`: tables at or under the one-hot threshold stay as individual
    replicated ops — their one-hot MXU lookup runs data-parallel on every
    shard with dense grads reduced by XLA, which measured faster than
    routing them through the gather collection (PERF.md). The original
    ops' output TensorSpecs are adopted by the collection so consumers keep
    working untouched.
    """
    all_embeds: List[Embedding] = [
        op for op in graph.compute_ops if isinstance(op, Embedding)
    ]
    if plan.replicated_tables is not None:
        # explicit autotuner choice overrides the threshold
        excluded = set(plan.replicated_tables)
        embeds = [e for i, e in enumerate(all_embeds) if i not in excluded]
    else:
        embeds = [e for e in all_embeds if e.num_entries > min_vocab]
    # host-tail ops stay standalone: their forward adds the host partial
    # feed, which the fused collection does not carry (M2: compose the hot
    # prefixes into the collection)
    embeds = [e for e in embeds if not getattr(e, "host_tail_vocab", 0)]
    if len(embeds) < 2:
        return None
    dim = embeds[0].out_dim
    aggr = embeds[0].aggr
    embeds = [e for e in embeds if e.out_dim == dim and e.aggr is aggr]
    if len(embeds) < 2:
        return None

    vocab_sizes = [e.num_entries for e in embeds]
    layout = plan.make_layout(vocab_sizes, dim, num_shards)
    inits = [e.params[0].initializer for e in embeds]

    def per_table_init(key, shape, dtype):
        # shape is (vocab, dim) for one table; dispatch to that table's
        # original initializer (vocab identifies the table uniquely enough
        # for init purposes — fall back to first init otherwise)
        for e, init in zip(embeds, inits):
            if (e.num_entries, e.out_dim) == tuple(shape):
                return init(key, shape, dtype)
        return inits[0](key, shape, dtype)

    coll = EmbeddingCollection(
        graph.unique_name("embedding_collection"),
        [e.inputs[0] for e in embeds],
        layout,
        aggr,
        per_table_initializer=per_table_init,
        adopt_outputs=[e.outputs[0] for e in embeds],
    )
    # splice: insert at the position of the first fused embedding, drop the rest
    first_pos = graph.ops.index(embeds[0])
    removed = set(id(e) for e in embeds)
    new_ops = []
    for i, op in enumerate(graph.ops):
        if i == first_pos:
            new_ops.append(coll)
        if id(op) not in removed:
            new_ops.append(op)
    coll.guid = graph._next_guid
    graph._next_guid += 1
    graph.ops = new_ops
    return coll
