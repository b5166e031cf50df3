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

Row-splitting (the scaling fix, PERF.md): pure table-parallelism leaves the
busiest shard doing the FULL global batch of lookups + scatter updates for
its tables — per-table work does not shrink with the mesh. A table may
therefore be split into `split[t]` row-range sub-tables placed on different
shards: each sub-table occupies its own exchange slot, lookups outside its
row range ride as -1 padding (masked like empty bag entries), and the
per-table output is the sum of its slots' pooled partials (exact for SUM
pooling: every lookup hits exactly one range). This is the per-op
parallelism-degree axis of the reference's search space (ParallelConfig
dims) applied to embedding tables; the autotuner picks per-table degrees.

Storage: each shard owns a row pool [R_pad, D]; all sub-tables of that shard
are concatenated with static row offsets, padded so every shard has equal
R_pad (XLA needs even partitions). The global parameter is [N, R_pad, D]
sharded on axis 0 over the mesh "data" axis.

Hierarchical exchange (chips_per_host set): on a multi-host pod the flat
pooled all-to-all sends every slot's partial row over DCN separately, so a
table split C ways within one host crosses DCN C times. The hierarchical
path factors the exchange into (1) an intra-host all-to-all over ICI
(axis_index_groups = hosts), (2) an on-chip combine of co-hosted slots of
the same table, and (3) an inter-host all-to-all over DCN whose payload is
one partial row per (host, table) instead of per slot — DCN bytes shrink by
the average within-host split degree. Same trick mirrored in backward: a
split table's pooled grad crosses DCN once per host and is re-expanded to
slots over ICI. This is the TPU answer to the reference's modeled
inter-node comm paths (EnhancedMachineModel NIC contention + segmentation,
src/runtime/machine_model.cc / include/simulator.h:153-236): route the big
exchange so the slow link carries the minimum bytes.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

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


def expand_subtables(
    vocab_sizes: Sequence[int], split: Optional[Sequence[int]]
) -> List[Tuple[int, int, int]]:
    """[(table, row_start, row_len)] — one entry per sub-table."""
    subs = []
    for t, v in enumerate(vocab_sizes):
        s = 1 if split is None else max(1, int(split[t]))
        chunk = -(-v // s)
        for k in range(s):
            start = k * chunk
            if start >= v:
                break
            subs.append((t, start, min(chunk, v - start)))
    return subs


@dataclasses.dataclass
class ShardedEmbeddingLayout:
    """Static layout derived from (vocab_sizes, dim, assignment[, split]).

    `owner` is per SUB-table (== per table when split is all ones)."""

    vocab_sizes: List[int]
    dim: int
    num_shards: int
    owner: List[int]
    split: Optional[List[int]] = None
    # hierarchical exchange: shards [h*C, (h+1)*C) form host h (JAX orders
    # TPU devices process-major, so contiguous data-axis ranges ARE hosts).
    # None / not dividing num_shards => flat single-stage exchange.
    chips_per_host: Optional[int] = None
    # "dense" = slot exchange (every slot ships its dense [batch] partial);
    # "routed" = capacity-bucketed source routing (routed_exchange.py) —
    # per-chip work and wire O(B_loc*T*H), independent of split degree
    exchange: str = "dense"
    # sub-bucket capacity factor for routed mode (0 = exact/fat)
    routed_cap_factor: float = 2.0
    # packed pool storage ([R_pad*D/128, 128] per shard): the local row
    # update runs the Pallas packed kernel (ops/pallas/packed_update.py)
    # instead of the XLA scatter; requires D | 128, SUM pooling, and a
    # row-local plain-SGD-style update (set by compile)
    packed_pool: bool = False
    pool_chunk_packs: int = 2048
    # hash-permuted row placement: logical row r of table t lives at
    # affine-permuted position (a_t*r + b_t) mod vocab_t, so Zipf-hot rows
    # spread uniformly over a split table's sub-ranges and routed-mode
    # capacity overflow becomes Binomial-tail-rare (PERF.md round-1
    # design; the drop-rate gate is tests/test_routed_robustness.py)
    hash_rows: bool = False
    # derived
    t_max: int = 0  # max sub-tables per shard (exchange slots per shard)
    r_pad: int = 0  # padded rows per shard
    subs: Optional[List[Tuple[int, int, int]]] = None  # (table, start, len)
    row_offset: Optional[np.ndarray] = None  # [S] row offset within owner pool
    slot_sub: Optional[np.ndarray] = None  # [N*t_max] sub id or -1
    slot_tid: Optional[np.ndarray] = None  # [N*t_max] table id or -1
    slot_start: Optional[np.ndarray] = None  # [N*t_max] row-range start
    slot_len: Optional[np.ndarray] = None  # [N*t_max] row-range length
    slot_offset_arr: Optional[np.ndarray] = None  # [N*t_max] pool offset
    # hierarchical derived (None unless hierarchical)
    th_max: int = 0  # max distinct tables per host
    host_tables: Optional[List[List[int]]] = None  # [H][<=th_max] table ids
    sel_host: Optional[np.ndarray] = None  # [H, C*t_max, th_max] slot->host-table
    sel_global: Optional[np.ndarray] = None  # [H*th_max, T] host-table->table

    def __post_init__(self):
        n = self.num_shards
        self.subs = expand_subtables(self.vocab_sizes, self.split)
        assert len(self.owner) == len(self.subs), (
            f"owner must be per sub-table: {len(self.owner)} vs {len(self.subs)}"
        )
        per_shard: List[List[int]] = [[] for _ in range(n)]
        for i, _ in enumerate(self.subs):
            per_shard[self.owner[i]].append(i)
        self.t_max = max(1, max(len(g) for g in per_shard))
        self.row_offset = np.zeros(len(self.subs), np.int64)
        rows = []
        nslot = n * self.t_max
        self.slot_sub = -np.ones(nslot, np.int64)
        self.slot_tid = np.zeros(nslot, np.int64)
        self.slot_start = np.zeros(nslot, np.int64)
        self.slot_len = np.zeros(nslot, np.int64)
        self.slot_offset_arr = np.zeros(nslot, np.int64)
        for s, group in enumerate(per_shard):
            off = 0
            for k, i in enumerate(group):
                t, start, length = self.subs[i]
                self.row_offset[i] = off
                slot = s * self.t_max + k
                self.slot_sub[slot] = i
                self.slot_tid[slot] = t
                self.slot_start[slot] = start
                self.slot_len[slot] = length
                self.slot_offset_arr[slot] = off
                off += length
            rows.append(off)
        self.r_pad = _round_up(max(max(rows), 1), 8)
        if self.packed_pool and 128 % self.dim != 0:
            self.packed_pool = False  # packed layout needs D | 128
        if self.packed_pool:
            # align so the packed pool tiles into whole kernel chunks
            rows_per_chunk = self.pool_chunk_packs * 128 // self.dim
            self.r_pad = _round_up(self.r_pad, rows_per_chunk)
        # remember the physical host grouping even when the hierarchical
        # exchange is degenerate (used by DCN-byte reporting for flat mode)
        self._phys_chips_per_host = self.chips_per_host
        if self.chips_per_host is not None and (
            self.chips_per_host <= 1
            or n % self.chips_per_host != 0
            or n == self.chips_per_host
        ):
            self.chips_per_host = None  # degenerate: flat exchange
        if self.chips_per_host is not None:
            c = self.chips_per_host
            h_n = n // c
            self.host_tables = []
            for h in range(h_n):
                seen: List[int] = []
                for slot in range(h * c * self.t_max, (h + 1) * c * self.t_max):
                    if self.slot_sub[slot] >= 0:
                        t = int(self.slot_tid[slot])
                        if t not in seen:
                            seen.append(t)
                self.host_tables.append(seen)
            self.th_max = max(1, max(len(g) for g in self.host_tables))
            self.sel_host = np.zeros((h_n, c * self.t_max, self.th_max), np.float32)
            self.sel_global = np.zeros((h_n * self.th_max, self.num_tables), np.float32)
            for h in range(h_n):
                pos = {t: j for j, t in enumerate(self.host_tables[h])}
                for p in range(c * self.t_max):
                    slot = h * c * self.t_max + p
                    if self.slot_sub[slot] >= 0:
                        self.sel_host[h, p, pos[int(self.slot_tid[slot])]] = 1.0
                for t, j in pos.items():
                    self.sel_global[h * self.th_max + j, t] = 1.0

    # ---- hash-permuted row placement ---------------------------------------
    def _hash_consts(self):
        """Per-table affine permutation (a, b) with gcd(a, vocab) = 1 —
        a bijection on [0, vocab): golden-ratio multiplier, fixed salt."""
        import math

        a_l, b_l = [], []
        for v in self.vocab_sizes:
            a = max(1, int(0.6180339887 * v)) | 1
            while math.gcd(a, v) != 1:
                a += 2
            a_l.append(a % max(v, 1))
            b_l.append(0x9E37 % max(v, 1))
        return np.asarray(a_l, np.int64), np.asarray(b_l, np.int64)

    def perm_rows(self, idx, table_axis: int = 1):
        """Apply the row permutation to an index tensor [..., T, ...]
        (jnp). Identity when hash_rows is off; negatives pass through.

        The product r*a (r < v, a ~ 0.618*v) overflows int32 for vocabs
        above ~2^16 and JAX on TPU has no int64, so the modular multiply
        is a double-and-add over a's bits in uint32: every intermediate
        stays < 2v <= 2^32 and the reduction is a conditional subtract
        (no division). 31 static iterations of elementwise VPU ops on the
        index tensor — negligible next to the exchange."""
        if not self.hash_rows:
            return idx
        a, b = self._hash_consts()
        shape = [1] * idx.ndim
        shape[table_axis] = self.num_tables
        av = jnp.asarray(a, jnp.uint32).reshape(shape)
        bv = jnp.asarray(b, jnp.uint32).reshape(shape)
        vv = jnp.asarray(
            np.maximum(np.asarray(self.vocab_sizes, np.int64), 1),
            jnp.uint32,
        ).reshape(shape)
        vi = jnp.asarray(self.vocab_sizes, idx.dtype).reshape(shape)
        # invalid (negative OR out-of-vocab) indices pass through untouched
        # so downstream validity checks drop them exactly as in dense mode
        # (ADVICE r2: routed and dense must share drop semantics)
        invalid = (idx < 0) | (idx >= vi)
        r = jnp.where(invalid, 0, idx).astype(jnp.uint32)

        def _cond_sub(x):
            return jnp.where(x >= vv, x - vv, x)

        acc = jnp.zeros_like(r)
        x = _cond_sub(r)  # r may equal v only via invalid input; clamp anyway
        nbits = max(int(a_t).bit_length() for a_t in a) if len(a) else 0
        for i in range(nbits):
            bit = (av >> jnp.uint32(i)) & jnp.uint32(1)
            acc = jnp.where(bit > 0, _cond_sub(acc + x), acc)
            x = _cond_sub(x + x)
        acc = _cond_sub(acc + bv)
        return jnp.where(invalid, idx, acc.astype(idx.dtype))

    def perm_table_np(self, t: int) -> np.ndarray:
        """positions[r] = permuted row of logical row r (numpy, for IO)."""
        v = self.vocab_sizes[t]
        if not self.hash_rows:
            return np.arange(v, dtype=np.int64)
        a, b = self._hash_consts()
        return (np.arange(v, dtype=np.int64) * a[t] + b[t]) % v

    @property
    def hierarchical(self) -> bool:
        return self.chips_per_host is not None

    @property
    def num_hosts(self) -> int:
        return self.num_shards // self.chips_per_host if self.hierarchical else 1

    def _host_groups(self):
        """[[shards of host 0], ...] — the ICI all-to-all groups."""
        c = self.chips_per_host
        return [list(range(h * c, (h + 1) * c)) for h in range(self.num_hosts)]

    def _cross_host_groups(self):
        """[[chip c of every host], ...] — the DCN all-to-all groups."""
        c = self.chips_per_host
        return [
            [h * c + j for h in range(self.num_hosts)] for j in range(c)
        ]

    @property
    def num_tables(self) -> int:
        return len(self.vocab_sizes)

    @property
    def num_subtables(self) -> int:
        return len(self.subs)

    @property
    def has_splits(self) -> bool:
        return self.split is not None and any(s > 1 for s in self.split)

    def param_shape(self):
        if self.packed_pool:
            return (self.num_shards, self.pool_packs, 128)
        return (self.num_shards, self.r_pad, self.dim)

    @property
    def pool_packs(self) -> int:
        return self.r_pad * self.dim // 128

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

    def dcn_pooled_exchange_bytes(self, global_batch: int, dtype_bytes: int = 4) -> int:
        """Bytes of the pooled exchange that cross HOSTS (the slow link).
        Flat exchange: every slot's partial row travels owner->batch-owner,
        a (N-C)/N fraction of which is cross-host. Hierarchical: one partial
        row per (host, table) crosses, (H-1)/H of the time."""
        n = self.num_shards
        if not self.hierarchical:
            # flat exchange: of the (N-1)/N rows leaving each shard, only
            # those bound for another host cross DCN — an (N-C)/N fraction
            # of the total (C = physical chips per host; 1 when unknown).
            c = self._phys_chips_per_host or 1
            if n % c != 0:
                c = 1
            total = global_batch * n * self.t_max * self.dim * dtype_bytes
            return total * (n - c) // n
        h = self.num_hosts
        total = global_batch * h * self.th_max * self.dim * dtype_bytes
        return total * (h - 1) // h

    def step_exchange_bytes(self, global_batch: int, bag: int = 1,
                            dtype_bytes: int = 4) -> int:
        """Total interconnect bytes of ONE training step's pooled exchange
        under this layout's mode (fwd + bwd; the BASELINE.md all-to-all
        GB/s metric). Dense mode: 2 pooled all-to-alls + the index
        exchange. Routed: compact index + row + grad buckets, independent
        of split degree."""
        n = self.num_shards
        if self.exchange == "routed":
            total = 0
            split = self.split or [1] * self.num_tables
            for t in range(self.num_tables):
                s = max(1, split[t])
                cap = (
                    1.0 if (s == 1 or self.routed_cap_factor <= 0)
                    else self.routed_cap_factor
                )
                entries = global_batch * bag * cap
                # idx there (fwd) + rows back (fwd) + idx + grads (bwd)
                total += int(entries * (2 * 4 + 2 * self.dim * dtype_bytes))
            return total * (n - 1) // n
        idx_bytes = 4 * global_batch * n * self.t_max * bag * (n - 1) // n
        return 3 * self.pooled_exchange_bytes(global_batch, dtype_bytes) + (
            2 * idx_bytes  # fwd + bwd index exchanges
        )

    def _inv_positions(self, t: int, start: int, length: int) -> np.ndarray:
        """Logical rows living at permuted positions [start, start+len)."""
        v = self.vocab_sizes[t]
        pos = np.arange(start, start + length, dtype=np.int64)
        if not self.hash_rows:
            return pos
        a, b = self._hash_consts()
        ainv = pow(int(a[t]), -1, v)
        return ((pos - b[t]) * ainv) % v

    def init_params(self, key: jax.Array, initializer, dtype=jnp.float32) -> jax.Array:
        """Build [N, R_pad, D] with each table initialized as one standalone
        [vocab, D] table (fan shapes match single-table init; sub-tables
        slice it — through the hash permutation when enabled — so split
        degree does not change the init distribution)."""
        tables = {
            t: initializer(jax.random.fold_in(key, t), (v, self.dim), dtype)
            for t, v in enumerate(self.vocab_sizes)
        }
        logical = jnp.zeros((self.num_shards, self.r_pad, self.dim), dtype)
        for i, (t, start, length) in enumerate(self.subs):
            s = self.owner[i]
            off = int(self.row_offset[i])
            src = tables[t]
            if self.hash_rows:
                src = jnp.take(
                    src, jnp.asarray(self._inv_positions(t, start, length)),
                    axis=0,
                )
            else:
                src = src[start : start + length]
            logical = logical.at[s, off : off + length].set(src)
        if self.packed_pool:
            return logical.reshape(self.param_shape())
        return logical

    def extract_table(self, pool, t: int) -> jax.Array:
        """Debug/checkpoint helper: recover table t as [vocab, D] in
        LOGICAL row order (undoing the hash permutation when enabled)."""
        if self.packed_pool:
            pool = pool.reshape(self.num_shards, self.r_pad, self.dim)
        parts = []
        for i, (tt, start, length) in enumerate(self.subs):
            if tt != t:
                continue
            s = self.owner[i]
            off = int(self.row_offset[i])
            parts.append(pool[s, off : off + length])
        full = jnp.concatenate(parts, axis=0)  # permuted-position order
        if self.hash_rows:
            full = jnp.take(full, jnp.asarray(self.perm_table_np(t)), axis=0)
        return full

    # ---- static device arrays used by the exchange --------------------------
    def _slot_consts(self):
        return (
            jnp.asarray(self.slot_sub >= 0, jnp.bool_),  # is_real [S]
            jnp.asarray(self.slot_tid, jnp.int32),
            jnp.asarray(self.slot_start, jnp.int32),
            jnp.asarray(self.slot_len, jnp.int32),
            jnp.asarray(self.slot_offset_arr, jnp.int32),
        )

    def table_select_matrix(self) -> jnp.ndarray:
        """[n_slots, T] 0/1: slot s contributes to table slot_tid[s]."""
        nslot = self.num_shards * self.t_max
        sel = np.zeros((nslot, self.num_tables), np.float32)
        for s in range(nslot):
            if self.slot_sub[s] >= 0:
                sel[s, int(self.slot_tid[s])] = 1.0
        return jnp.asarray(sel)


def _expand_by_slot(layout, idx_local):
    """idx_local [B_loc, T, H] -> by_owner [B_loc, N*t_max, H]: per exchange
    slot, the slot's table's indices remapped into its sub-table's local pool
    rows; entries outside the slot's row range (or padding, or dead slots)
    become -1."""
    is_real, slot_tid, slot_start, slot_len, slot_off = layout._slot_consts()
    gathered = jnp.take(idx_local, slot_tid, axis=1)  # [B_loc, S, H]
    in_range = (gathered >= slot_start[None, :, None]) & (
        gathered < (slot_start + slot_len)[None, :, None]
    )
    remapped = gathered - slot_start[None, :, None] + slot_off[None, :, None]
    keep = in_range & is_real[None, :, None]
    return jnp.where(keep, remapped, -1)



def local_pool_row_update(layout, pool_local2d, sstate2d, rows, grads,
                          optimizer, lr=None):
    """Apply the per-shard row update: the Pallas packed kernel when the
    pool is packed (scatter-free, ops/pallas/packed_update.py), else the
    optimizer's scatter path. rows >= r_pad drop. Packed supports plain
    SGD and row-wise AdaGrad (accumulators stored packed, lane-replicated
    per row, maintained by the same kernel)."""
    if layout.packed_pool:
        import jax as _jax

        from ..ops.pallas.packed_update import (
            gather_rows,
            packed_lazy_adam_batched,
            packed_lazy_momentum_batched,
            packed_row_update,
        )
        from ..training.optimizer import (
            AdamOptimizer as _Adam,
            RowWiseAdagradOptimizer as _RWA,
            SGDOptimizer as _SGD,
        )

        interpret = _jax.default_backend() != "tpu"
        g = grads.astype(jnp.float32)
        kw = dict(
            chunk_packs=layout.pool_chunk_packs, interpret=interpret,
        )
        if isinstance(optimizer, _Adam):
            # lazy Adam on packed m/v side pools (lr = bias-corrected
            # alpha_t from the engine); state is a {'m','v'} dict of
            # SEPARATE pools (round 5 — stacked state cost a slice/stack
            # copy round-trip through the donation boundary per step)
            (new_pools, new_m, new_v) = packed_lazy_adam_batched(
                [pool_local2d], [sstate2d["m"]], [sstate2d["v"]],
                [rows], [g],
                [layout.r_pad], layout.dim,
                alpha_t=(optimizer.alpha if lr is None else lr),
                beta1=optimizer.beta1, beta2=optimizer.beta2,
                epsilon=optimizer.epsilon,
                weight_decay=optimizer.weight_decay, **kw,
            )
            return new_pools[0], {"m": new_m[0], "v": new_v[0]}
        if isinstance(optimizer, _SGD) and optimizer.momentum != 0.0:
            new_pools, new_vel = packed_lazy_momentum_batched(
                [pool_local2d], [sstate2d], [rows], [g],
                [layout.r_pad], layout.dim,
                lr=(optimizer.lr if lr is None else lr),
                momentum=optimizer.momentum, nesterov=optimizer.nesterov,
                weight_decay=optimizer.weight_decay, **kw,
            )
            return new_pools[0], new_vel[0]
        rate = (optimizer.lr if lr is None else lr)
        if isinstance(optimizer, _RWA):
            gsq = jnp.broadcast_to(
                jnp.mean(jnp.square(g), axis=-1, keepdims=True), g.shape
            )
            # accumulator adds stream f32 (bf16 deltas would quantize the
            # running sum to ~8 mantissa bits and drift over long runs)
            acc2 = packed_row_update(
                sstate2d, rows, gsq, layout.r_pad, layout.dim,
                delta_dtype=jnp.float32, **kw
            )
            a_rows = gather_rows(
                acc2, jnp.minimum(rows, layout.r_pad - 1), layout.dim
            )[:, :1]
            deltas = (-rate * jax.lax.rsqrt(a_rows + optimizer.epsilon)) * g
            new_pool = packed_row_update(
                pool_local2d, rows, deltas, layout.r_pad, layout.dim, **kw
            )
            return new_pool, acc2
        assert sstate2d is None, "packed pool: stateless or row-wise AdaGrad"
        assert isinstance(optimizer, _SGD) and optimizer.momentum == 0.0
        if optimizer.weight_decay != 0.0:
            decay = gather_rows(
                pool_local2d, jnp.minimum(rows, layout.r_pad - 1), layout.dim
            )
            g = g + optimizer.weight_decay * decay
        new_pool = packed_row_update(
            pool_local2d, rows, -rate * g, layout.r_pad, layout.dim, **kw
        )
        return new_pool, None
    return optimizer.sparse_row_update(pool_local2d, sstate2d, rows, grads, lr=lr)


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
    indices = layout.perm_rows(indices)
    n = layout.num_shards
    t_max = layout.t_max
    if layout.has_splits:
        assert aggr is AggrMode.AGGR_MODE_SUM, (
            "row-split tables require SUM pooling (per-slot partials sum "
            "exactly; AVG counts would need a second exchange)"
        )
    sel = layout.table_select_matrix()  # [S, T]
    out_slot = None
    if not layout.has_splits:
        # one slot per table: invert slot_tid for the cheap take-combine
        out_np = np.zeros(layout.num_tables, np.int64)
        for slot in range(layout.num_shards * layout.t_max):
            if layout.slot_sub[slot] >= 0:
                out_np[int(layout.slot_tid[slot])] = slot
        out_slot = jnp.asarray(out_np, jnp.int32)

    def local_fn(pool_local, idx_local):
        # pool_local [1, R_pad, D]; idx_local [B_loc, T, H]
        b_loc, _, h = idx_local.shape
        idx_local = idx_local.astype(jnp.int32)
        by_owner = _expand_by_slot(layout, idx_local)  # [B_loc, S, H]
        # (1) index exchange: each shard receives the full batch's indices
        # for its own sub-tables.
        sent = jax.lax.all_to_all(
            by_owner, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [N*B_loc, t_max, H]
        nb = n * b_loc
        flat = sent.reshape(nb * t_max, h)
        valid = flat >= 0
        safe = jnp.where(valid, flat, 0)
        if layout.packed_pool:
            from ..ops.pallas.packed_update import gather_rows

            rows = gather_rows(
                pool_local[0], safe.reshape(-1), layout.dim
            ).reshape(safe.shape + (layout.dim,))
        else:
            rows = jnp.take(pool_local[0], safe, axis=0)
        if compute_dtype is not None:
            rows = rows.astype(compute_dtype)
        rows = jnp.where(valid[..., None], rows, jnp.zeros((), rows.dtype))
        pooled = jnp.sum(rows, axis=1)  # [nb*t_max, D]
        if aggr is AggrMode.AGGR_MODE_AVG:
            cnt = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
            pooled = pooled / cnt.astype(pooled.dtype)
        pooled = pooled.reshape(nb, t_max, layout.dim)
        if layout.hierarchical:
            hosts, c = layout.num_hosts, layout.chips_per_host
            # permute global-batch blocks (new block c*H+h = old block h*C+c)
            # so the chip-split then host-split of the batch axis lands every
            # shard with exactly its own block.
            p = pooled.reshape(hosts, c, b_loc, t_max, layout.dim)
            p = p.transpose(1, 0, 2, 3, 4).reshape(nb, t_max, layout.dim)
            # (2a) intra-host exchange over ICI
            intra = jax.lax.all_to_all(
                p, axis, split_axis=0, concat_axis=1, tiled=True,
                axis_index_groups=layout._host_groups(),
            )  # [B/C, C*t_max, D]
            # (2b) combine co-hosted slots of the same table BEFORE DCN
            # (f32 accumulation, then back to the wire dtype — the later
            # stages are pure 0/1 gathers, no further summation)
            hid = jax.lax.axis_index(axis) // c
            sel1 = jnp.take(jnp.asarray(layout.sel_host), hid, axis=0)
            part = jnp.einsum(
                "bsd,st->btd", intra.astype(jnp.float32), sel1,
                preferred_element_type=jnp.float32,
            ).astype(pooled.dtype)  # [B/C, th_max, D]
            # (2c) inter-host exchange over DCN — one row per (host, table)
            inter = jax.lax.all_to_all(
                part, axis, split_axis=0, concat_axis=1, tiled=True,
                axis_index_groups=layout._cross_host_groups(),
            )  # [b_loc, H*th_max, D]
            out = jnp.einsum(
                "bsd,st->btd", inter.astype(jnp.float32),
                jnp.asarray(layout.sel_global),
                preferred_element_type=jnp.float32,
            )
            return out.astype(pooled.dtype)
        # (2) pooled exchange back to batch owners.
        back = jax.lax.all_to_all(
            pooled, axis, split_axis=0, concat_axis=1, tiled=True
        )  # [B_loc, N*t_max, D]
        if out_slot is not None:
            # unsplit: slot per table — a free gather
            return jnp.take(back, out_slot, axis=1)
        # combine slots per table (sum of row-range partials; exact for SUM)
        out = jnp.einsum(
            "bsd,st->btd", back.astype(jnp.float32), sel,
            preferred_element_type=jnp.float32,
        ).astype(back.dtype)
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
    in: exchange pooled grads to sub-table owners (one all-to-all; same
    volume as the forward pooled exchange), expand over bag members, scatter-
    apply the row update locally. No dense table gradient is materialized.
    """
    indices = layout.perm_rows(indices)
    n = layout.num_shards
    t_max = layout.t_max
    if layout.has_splits:
        assert aggr is AggrMode.AGGR_MODE_SUM
    is_real, slot_tid, _, _, _ = layout._slot_consts()
    r_pad = layout.r_pad
    has_state = sstate is not None

    def local_fn(pool_local, sstate_local, idx_local, g_local):
        b_loc, _, h = idx_local.shape
        idx_local = idx_local.astype(jnp.int32)
        by_owner = _expand_by_slot(layout, idx_local)  # [B_loc, S, H]
        sent_idx = jax.lax.all_to_all(
            by_owner, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [N*B_loc, t_max, H]

        nb = n * b_loc
        if layout.hierarchical:
            hosts, c = layout.num_hosts, layout.chips_per_host
            selg = jnp.asarray(layout.sel_global)  # [H*th_max, T]
            # per (host, table) grad rows; dead host-slots zero via selg.
            # Both einsums are 0/1 gathers (no accumulation), so the wire
            # stays in the incoming grad dtype like the flat path.
            g_ht = jnp.einsum(
                "btd,st->bsd", g_local.astype(jnp.float32), selg,
                preferred_element_type=jnp.float32,
            ).astype(g_local.dtype)  # [B_loc, H*th_max, D]
            # (1) one copy per table crosses DCN to each owning host
            inter = jax.lax.all_to_all(
                g_ht, axis, split_axis=1, concat_axis=0, tiled=True,
                axis_index_groups=layout._cross_host_groups(),
            )  # [B/C, th_max, D]
            # (2) re-expand to this host's slots (ICI-local broadcast)
            hid = jax.lax.axis_index(axis) // c
            sel1 = jnp.take(jnp.asarray(layout.sel_host), hid, axis=0)
            expanded = jnp.einsum(
                "btd,st->bsd", inter.astype(jnp.float32), sel1,
                preferred_element_type=jnp.float32,
            ).astype(g_local.dtype)  # [B/C, C*t_max, D]
            intra = jax.lax.all_to_all(
                expanded, axis, split_axis=1, concat_axis=0, tiled=True,
                axis_index_groups=layout._host_groups(),
            )  # [B, t_max, D] in permuted block order
            sent_g = (
                intra.reshape(c, hosts, b_loc, t_max, intra.shape[-1])
                .transpose(1, 0, 2, 3, 4)
                .reshape(nb, t_max, intra.shape[-1])
            )
        else:
            # each slot receives its TABLE's pooled grad (the slot handled a
            # row-range subset of the lookups; invalid entries drop in scatter)
            g_by_slot = jnp.take(g_local, slot_tid, axis=1)  # [B_loc, S, D]
            g_by_slot = jnp.where(
                is_real[None, :, None], g_by_slot, jnp.zeros((), g_by_slot.dtype)
            )
            sent_g = jax.lax.all_to_all(
                g_by_slot, axis, split_axis=1, concat_axis=0, tiled=True
            )  # [N*B_loc, t_max, D]

        valid = sent_idx >= 0  # [nb, t_max, H]
        g = sent_g.astype(jnp.float32)
        if aggr is AggrMode.AGGR_MODE_AVG:
            count = jnp.maximum(jnp.sum(valid, axis=2, keepdims=True), 1)
            g = g / count.astype(g.dtype)
        rows = jnp.where(valid, sent_idx, r_pad).reshape(nb * t_max * h)
        grads = jnp.broadcast_to(
            g[:, :, None, :], (nb, t_max, h, g.shape[-1])
        ).reshape(nb * t_max * h, -1)
        st = (
            jax.tree_util.tree_map(lambda x: x[0], sstate_local)
            if has_state else None
        )
        table, st = local_pool_row_update(
            layout, pool_local[0], st, rows, grads, optimizer, lr=lr
        )
        if has_state:
            return table[None], jax.tree_util.tree_map(
                lambda x: x[None], st
            )
        return table[None]

    if has_state:
        st_spec = jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), sstate
        )
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                layout.param_spec(axis),
                st_spec,
                P(axis, None, None),
                P(axis, None, None),
            ),
            out_specs=(layout.param_spec(axis), st_spec),
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
