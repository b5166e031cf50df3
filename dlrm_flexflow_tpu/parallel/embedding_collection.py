"""Table-sharded embedding collection with pooled all-to-all exchange.

This is the TPU-native replacement for the reference's DLRM embedding
parallelization: table i lives wholly on device owner(i) (reference strategy:
embedding i -> GPU i%N, examples/cpp/DLRM/strategies/dlrm_strategy.py:26-34)
and the embedding->concat boundary becomes an explicit pooled-embedding
all-to-all (the reference gets this implicitly from Legion region copies,
SURVEY §2.6). Two collectives per step, both over ICI under shard_map:

  1. index exchange   : int32  [B/N, N*T_max, H] -> [B, T_max, H]
  2. pooled exchange  : f32    [B, T_max, D]     -> [B/N, N*T_max, D]

Backward of (2) is another all-to-all (its own transpose); the gradient
scatter-add into the local table pool never leaves the device — same
locality argument as the reference's per-GPU atomicAdd scatter
(src/ops/embedding.cu:192-217).

Storage: each shard owns a row pool [R_pad, D]; all tables of that shard are
concatenated with static row offsets, padded so every shard has equal R_pad
(XLA needs even partitions). The global parameter is [N, R_pad, D] sharded
on axis 0 over the mesh "data" axis.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ffconst import AggrMode


def round_robin_assignment(num_tables: int, num_shards: int) -> List[int]:
    """reference parity: table i -> device i % N (dlrm_strategy.py:26-34)."""
    return [i % num_shards for i in range(num_tables)]


def greedy_assignment(vocab_sizes: Sequence[int], num_shards: int) -> List[int]:
    """HBM-balancing placement: biggest table to least-loaded shard
    (our analog of the simulator's memory penalty steering placement,
    src/runtime/simulator.cc:605-627)."""
    owner = [0] * len(vocab_sizes)
    load = [0] * num_shards
    for i in sorted(range(len(vocab_sizes)), key=lambda i: -vocab_sizes[i]):
        s = int(np.argmin(load))
        owner[i] = s
        load[s] += vocab_sizes[i]
    return owner


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass
class ShardedEmbeddingLayout:
    """Static layout derived from (vocab_sizes, dim, assignment)."""

    vocab_sizes: List[int]
    dim: int
    num_shards: int
    owner: List[int]
    # derived
    t_max: int = 0  # max tables per shard
    r_pad: int = 0  # padded rows per shard
    row_offset: Optional[np.ndarray] = None  # [T] row offset within owner pool
    slot_table: Optional[np.ndarray] = None  # [N*t_max] table id or -1
    out_slot: Optional[np.ndarray] = None  # [T] slot index of each table

    def __post_init__(self):
        n = self.num_shards
        per_shard: List[List[int]] = [[] for _ in range(n)]
        for t, s in enumerate(self.owner):
            per_shard[s].append(t)
        self.t_max = max(1, max(len(g) for g in per_shard))
        self.row_offset = np.zeros(len(self.vocab_sizes), np.int64)
        rows = []
        slot_table = -np.ones(n * self.t_max, np.int64)
        out_slot = np.zeros(len(self.vocab_sizes), np.int64)
        for s, group in enumerate(per_shard):
            off = 0
            for k, t in enumerate(group):
                self.row_offset[t] = off
                off += self.vocab_sizes[t]
                slot = s * self.t_max + k
                slot_table[slot] = t
                out_slot[t] = slot
            rows.append(off)
        self.r_pad = _round_up(max(max(rows), 1), 8)
        self.slot_table = slot_table
        self.out_slot = out_slot

    @property
    def num_tables(self) -> int:
        return len(self.vocab_sizes)

    def param_shape(self):
        return (self.num_shards, self.r_pad, self.dim)

    def param_spec(self, axis: str = "data") -> P:
        return P(axis, None, None)

    def hbm_bytes_per_shard(self, dtype_bytes: int = 4) -> int:
        return self.r_pad * self.dim * dtype_bytes

    # ---- exchange volumes for the cost model / GB/s reporting --------------
    def pooled_exchange_bytes(self, global_batch: int, dtype_bytes: int = 4) -> int:
        """Bytes crossing the interconnect in the pooled all-to-all
        (each shard keeps 1/N locally)."""
        n = self.num_shards
        total = global_batch * n * self.t_max * self.dim * dtype_bytes
        return total * (n - 1) // n

    def init_params(self, key: jax.Array, initializer, dtype=jnp.float32) -> jax.Array:
        """Build [N, R_pad, D] with each table block initialized as a
        standalone [vocab, D] table (fan shapes match single-table init)."""
        pool = jnp.zeros(self.param_shape(), dtype)
        for t, vocab in enumerate(self.vocab_sizes):
            block = initializer(jax.random.fold_in(key, t), (vocab, self.dim), dtype)
            s = self.owner[t]
            pool = pool.at[s, int(self.row_offset[t]) : int(self.row_offset[t]) + vocab].set(
                block
            )
        return pool

    def extract_table(self, pool, t: int) -> jax.Array:
        """Debug/checkpoint helper: recover table t as [vocab, D]."""
        s = self.owner[t]
        off = int(self.row_offset[t])
        return pool[s, off : off + self.vocab_sizes[t]]


def sharded_embedding_lookup(
    layout: ShardedEmbeddingLayout,
    pool: jax.Array,  # [N, R_pad, D] sharded P(axis, None, None)
    indices: jax.Array,  # [B, T, H] global per-table indices (batch-sharded)
    mesh: Mesh,
    aggr: AggrMode = AggrMode.AGGR_MODE_SUM,
    axis: str = "data",
    compute_dtype=None,
):
    """Full sharded fused lookup: remap + all-to-all + pool + all-to-all.
    Returns [B, T, D] pooled embeddings, batch-sharded.
    """
    n = layout.num_shards
    t_max = layout.t_max
    num_t = layout.num_tables

    # Static remapping tables (host constants baked into the program).
    slot_table = jnp.asarray(layout.slot_table, jnp.int32)  # [N*t_max]
    slot_offset = jnp.asarray(
        np.where(layout.slot_table >= 0, layout.row_offset[np.maximum(layout.slot_table, 0)], 0),
        jnp.int32,
    )  # [N*t_max]
    out_slot = jnp.asarray(layout.out_slot, jnp.int32)  # [T]

    def local_fn(pool_local, idx_local):
        # pool_local [1, R_pad, D]; idx_local [B_loc, T, H]
        b_loc, _, h = idx_local.shape
        idx_local = idx_local.astype(jnp.int32)
        # Arrange per-destination-slot indices [B_loc, N*t_max, H]:
        safe_slot = jnp.maximum(slot_table, 0)
        gathered = jnp.take(idx_local, safe_slot, axis=1)  # [B_loc, N*t_max, H]
        valid_entry = gathered >= 0
        remapped = gathered + slot_offset[None, :, None]
        is_real = (slot_table >= 0)[None, :, None]
        by_owner = jnp.where(valid_entry & is_real, remapped, -1)
        # (1) index exchange: each shard receives the full batch's indices
        # for its own tables.
        sent = jax.lax.all_to_all(
            by_owner, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [N*B_loc, t_max, H]
        nb = n * b_loc
        flat = sent.reshape(nb * t_max, h)
        table2d = pool_local[0]
        valid = flat >= 0
        rows = jnp.take(table2d, jnp.where(valid, flat, 0), axis=0)
        if compute_dtype is not None:
            rows = rows.astype(compute_dtype)
        rows = jnp.where(valid[..., None], rows, jnp.zeros((), rows.dtype))
        pooled = jnp.sum(rows, axis=1)  # [nb*t_max, D]
        if aggr is AggrMode.AGGR_MODE_AVG:
            cnt = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
            pooled = pooled / cnt.astype(pooled.dtype)
        pooled = pooled.reshape(nb, t_max, layout.dim)
        # (2) pooled exchange back to batch owners.
        back = jax.lax.all_to_all(
            pooled, axis, split_axis=0, concat_axis=1, tiled=True
        )  # [B_loc, N*t_max, D]
        out = jnp.take(back, out_slot, axis=1)  # [B_loc, T, D]
        return out

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(layout.param_spec(axis), P(axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )(pool, indices)


def sharded_embedding_sparse_update(
    layout: ShardedEmbeddingLayout,
    pool: jax.Array,  # [N, R_pad, D]
    sstate,  # [N, R_pad] optimizer row state or None
    indices: jax.Array,  # [B, T, H] batch-sharded
    g_pooled: jax.Array,  # [B, T, D] batch-sharded pooled-output grads
    mesh: Mesh,
    optimizer,
    aggr: AggrMode = AggrMode.AGGR_MODE_SUM,
    axis: str = "data",
    lr=None,
):
    """Backward mirror of sharded_embedding_lookup with the optimizer fused
    in: exchange pooled grads to table owners (one all-to-all; same volume as
    the forward pooled exchange), expand over bag members, scatter-apply the
    row update locally. No dense table gradient is ever materialized.
    """
    n = layout.num_shards
    t_max = layout.t_max

    slot_table = jnp.asarray(layout.slot_table, jnp.int32)
    slot_offset = jnp.asarray(
        np.where(layout.slot_table >= 0, layout.row_offset[np.maximum(layout.slot_table, 0)], 0),
        jnp.int32,
    )
    r_pad = layout.r_pad
    has_state = sstate is not None

    def local_fn(pool_local, sstate_local, idx_local, g_local):
        b_loc, _, h = idx_local.shape
        idx_local = idx_local.astype(jnp.int32)
        safe_slot = jnp.maximum(slot_table, 0)
        is_real = (slot_table >= 0)[None, :, None]
        gathered = jnp.take(idx_local, safe_slot, axis=1)
        valid_entry = gathered >= 0
        remapped = gathered + slot_offset[None, :, None]
        by_owner = jnp.where(valid_entry & is_real, remapped, -1)
        sent_idx = jax.lax.all_to_all(
            by_owner, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [N*B_loc, t_max, H]

        g_by_slot = jnp.take(g_local, safe_slot, axis=1)  # [B_loc, N*t_max, D]
        g_by_slot = jnp.where(is_real, g_by_slot, jnp.zeros((), g_by_slot.dtype))
        sent_g = jax.lax.all_to_all(
            g_by_slot, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [N*B_loc, t_max, D]

        nb = n * b_loc
        valid = sent_idx >= 0  # [nb, t_max, H]
        g = sent_g.astype(jnp.float32)
        if aggr is AggrMode.AGGR_MODE_AVG:
            count = jnp.maximum(jnp.sum(valid, axis=2, keepdims=True), 1)
            g = g / count.astype(g.dtype)
        rows = jnp.where(valid, sent_idx, r_pad).reshape(nb * t_max * h)
        grads = jnp.broadcast_to(
            g[:, :, None, :], (nb, t_max, h, g.shape[-1])
        ).reshape(nb * t_max * h, -1)
        st = sstate_local[0] if has_state else None
        table, st = optimizer.sparse_row_update(pool_local[0], st, rows, grads, lr=lr)
        if has_state:
            return table[None], st[None]
        return table[None]

    if has_state:
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                layout.param_spec(axis),
                P(axis, None),
                P(axis, None, None),
                P(axis, None, None),
            ),
            out_specs=(layout.param_spec(axis), P(axis, None)),
            check_vma=False,
        )(pool, sstate, indices, g_pooled)
    out = jax.shard_map(
        lambda p, i, g: local_fn(p, None, i, g),
        mesh=mesh,
        in_specs=(layout.param_spec(axis), P(axis, None, None), P(axis, None, None)),
        out_specs=layout.param_spec(axis),
        check_vma=False,
    )(pool, indices, g_pooled)
    return out, None


def replicated_embedding_lookup(pool_tables, indices, aggr=AggrMode.AGGR_MODE_SUM):
    """Single-device / replicated fallback used when no mesh is bound:
    pool_tables is a list of [vocab, D]; indices [B, T, H]."""
    from ..ops.embedding import embedding_bag

    outs = [
        embedding_bag(tbl, indices[:, t], aggr) for t, tbl in enumerate(pool_tables)
    ]
    return jnp.stack(outs, axis=1)
