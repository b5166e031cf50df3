"""Compile-time graph passes for distributed execution.

The embedding-fusion pass is our analog of two reference mechanisms at once:
FFModel::compile creating per-op partitions from strategies
(src/runtime/model.cc:1629-1646) and the DLRM strategy placing each table on
one device (dlrm_strategy.py:26-34). All same-dim/same-aggr Embedding ops
collapse into one EmbeddingCollection whose parameter is a [N, R_pad, D]
pooled array sharded over the mesh; the exchange happens inside the op.
"""
from __future__ import annotations

from typing import List, Optional

from ..core.graph import Graph
from ..ops.embedding import Embedding
from ..ops.embedding_collection_op import EmbeddingCollection
from .plan import ShardingPlan


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
