"""Graph op wrapping a sharded embedding collection.

Created by the planner pass (parallel/passes.py) which fuses the graph's
individual Embedding ops into one collection — our analog of the reference
compile pipeline creating per-op partitions + the mapper placing table i on
device i%N (FFModel::compile, model.cc:1629-1646 + dlrm_strategy.py). Without
a mesh it falls back to per-table replicated lookups, so the same graph runs
single-chip.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from ..ffconst import AggrMode, OperatorType
from ..core.graph import Op
from ..core.initializers import GlorotUniform
from ..core.tensor import TensorSpec
from ..parallel.embedding_collection import (
    ShardedEmbeddingLayout,
    sharded_embedding_lookup,
)


class EmbeddingCollection(Op):
    op_type = OperatorType.OP_EMBEDDING

    def __init__(
        self,
        name: str,
        inputs: Sequence[TensorSpec],  # T index tensors [B, H] (or [B])
        layout: ShardedEmbeddingLayout,
        aggr: AggrMode = AggrMode.AGGR_MODE_SUM,
        per_table_initializer=None,
        adopt_outputs: Sequence[TensorSpec] = None,
    ):
        super().__init__(name, inputs)
        self.layout = layout
        self.aggr = aggr
        # training storage dtype of the pool (config.table_dtype; set by
        # compile for packed pools under a real data axis — the packed
        # kernel accumulates f32 into bf16 storage, side pools stay f32)
        self.table_dtype = None
        per_table_init = per_table_initializer or GlorotUniform()
        batch = inputs[0].shape[0]
        if adopt_outputs is not None:
            # take over the fused Embedding ops' output specs so downstream
            # consumers stay wired (fusion-pass path)
            for i, t in enumerate(adopt_outputs):
                t.owner_op = self
                t.owner_idx = i
                self.outputs.append(t)
        else:
            for i in range(layout.num_tables):
                self._out((batch, layout.dim), idx=i)

        def pool_init(key, shape, dtype):
            assert tuple(shape) == layout.param_shape()
            return layout.init_params(key, per_table_init, dtype)

        self._param("pool", layout.param_shape(), pool_init)

    def forward(self, params, inputs, ctx):
        idx = jnp.stack(
            [x if x.ndim == 2 else x[:, None] for x in inputs], axis=1
        )  # [B, T, H]
        if ctx.mesh is not None and ctx.mesh.shape.get("data", 1) > 1:
            assert "pool_q" not in params, (
                "int8-quantized collection serving is single-chip/replica "
                "only (quantize_embeddings refuses sharded collections)"
            )
            pool = params["pool"]
            if self.layout.exchange == "routed":
                from ..parallel.routed_exchange import routed_embedding_lookup

                out = routed_embedding_lookup(
                    self.layout, pool, idx, ctx.mesh, self.aggr,
                    cap_factor=self.layout.routed_cap_factor,
                )
            else:
                out = sharded_embedding_lookup(
                    self.layout,
                    pool,
                    idx,
                    ctx.mesh,
                    self.aggr,
                    compute_dtype=None,
                )  # [B, T, D]
        else:
            # single flat gather over the whole pool: remap per-table indices
            # to pool-global rows, one embedding_bag for all tables
            from ..ops.embedding import embedding_bag, quantized_embedding_bag

            lay = self.layout
            assert not lay.has_splits, "row-split layout requires a mesh"
            n, r, d = lay.num_shards, lay.r_pad, lay.dim
            b, t, h = idx.shape
            idx32 = lay.perm_rows(idx).astype(jnp.int32)
            base = jnp.asarray(
                [lay.owner[i] * r + int(lay.row_offset[i]) for i in range(t)],
                jnp.int32,
            )
            flat_idx = jnp.where(idx32 >= 0, idx32 + base[None, :, None], -1)
            if "pool_q" in params:
                # int8 serving rows + per-row scales over the flat pool
                # (FFModel.quantize_embeddings("int8") on a fused model)
                pooled = quantized_embedding_bag(
                    params["pool_q"], params["pool_scale"],
                    flat_idx.reshape(b * t, h), self.aggr, d, packed=False,
                )
            else:
                pooled = embedding_bag(
                    params["pool"].reshape(n * r, d),
                    flat_idx.reshape(b * t, h), self.aggr,
                )
            out = pooled.reshape(b, t, d)
        return [out[:, t] for t in range(self.layout.num_tables)]

    # ---- sparse-gradient path (see FFModel.compile) -------------------------
    def sparse_state_init(self, optimizer):
        lay = self.layout
        n, r, d = lay.num_shards, lay.r_pad, lay.dim
        st = optimizer.sparse_init((n, r, d))
        if st is None:
            return None
        if st.ndim == 4:  # Adam m/v stacked [2, N, R, D] -> shard-leading
            st = jnp.moveaxis(st, 0, 1)
        if not lay.packed_pool:
            return st
        # packed storage so the packed kernel maintains the state pools:
        # per-row accumulators (AdaGrad [N, R]) lane-replicate over the
        # row's D lanes; per-element pools reshape row-major (r_pad is
        # chunk-aligned so this IS the packed layout)
        if st.ndim == 2:
            st = jnp.broadcast_to(st[:, :, None], (n, r, d))
            return st.astype(jnp.float32).reshape(lay.param_shape())
        if st.ndim == 3:  # velocity [N, R, D]
            return st.astype(jnp.float32).reshape(lay.param_shape())
        # Adam m/v: SEPARATE packed pools (round 5 — a stacked
        # [N, 2, Pp, 128] array forced a slice-copy per pool into the
        # donating update kernel and a stack-copy out on EVERY shard)
        return {
            "m": st[:, 0].astype(jnp.float32).reshape(lay.param_shape()),
            "v": st[:, 1].astype(jnp.float32).reshape(lay.param_shape()),
        }

    def sparse_update(self, params, inputs, g_out_list, optimizer, sstate, ctx, lr=None):
        idx = jnp.stack(
            [x if x.ndim == 2 else x[:, None] for x in inputs], axis=1
        )  # [B, T, H]
        g_pooled = jnp.stack(g_out_list, axis=1)  # [B, T, D]
        pool = params["pool"]
        if ctx.mesh is not None and ctx.mesh.shape.get("data", 1) > 1:
            if self.layout.exchange == "routed":
                from ..parallel.routed_exchange import (
                    routed_embedding_sparse_update,
                )

                pool, sstate = routed_embedding_sparse_update(
                    self.layout, pool, sstate, idx, g_pooled, ctx.mesh,
                    optimizer, self.aggr, lr=lr,
                    cap_factor=self.layout.routed_cap_factor,
                )
                return {"pool": pool}, sstate
            from ..parallel.embedding_collection import (
                sharded_embedding_sparse_update,
            )

            pool, sstate = sharded_embedding_sparse_update(
                self.layout, pool, sstate, idx, g_pooled, ctx.mesh, optimizer,
                self.aggr, lr=lr,
            )
            return {"pool": pool}, sstate
        # unsharded fallback: one scatter over the flattened pool
        lay = self.layout
        assert not lay.has_splits, "row-split layout requires a mesh"
        assert not lay.packed_pool, (
            "packed pools require a sharded mesh (the flat fallback "
            "operates on the [N, R, D] layout)"
        )
        n, r, d = lay.num_shards, lay.r_pad, lay.dim
        b, t, h = idx.shape
        idx32 = lay.perm_rows(idx).astype(jnp.int32)
        valid = idx32 >= 0
        base = jnp.asarray(
            [lay.owner[i] * r + int(lay.row_offset[i]) for i in range(t)], jnp.int32
        )  # [T]
        rows = jnp.where(valid, idx32 + base[None, :, None], n * r).reshape(b * t * h)
        g = g_pooled.astype(jnp.float32)
        if self.aggr.value == "avg":
            count = jnp.maximum(jnp.sum(valid, axis=2, keepdims=True), 1)
            g = g / count.astype(g.dtype)
        grads = jnp.broadcast_to(g[:, :, None, :], (b, t, h, d)).reshape(b * t * h, d)
        flat = pool.reshape(n * r, d)
        # flatten the optimizer state to the row space the scatter expects:
        # AdaGrad [N, R] -> [N*R]; velocity [N, R, D] -> [N*R, D];
        # Adam [N, 2, R, D] -> [2, N*R, D]
        if sstate is None:
            sflat = None
        elif sstate.ndim == 2:
            sflat = sstate.reshape(n * r)
        elif sstate.ndim == 3:
            sflat = sstate.reshape(n * r, d)
        else:
            sflat = jnp.moveaxis(sstate, 1, 0).reshape(2, n * r, d)
        flat, sflat = optimizer.sparse_row_update(flat, sflat, rows, grads, lr=lr)
        pool = flat.reshape(n, r, d)
        if sflat is None:
            sstate = None
        elif sflat.ndim == 1:
            sstate = sflat.reshape(n, r)
        elif sflat.ndim == 2:
            sstate = sflat.reshape(n, r, d)
        else:
            sstate = jnp.moveaxis(sflat.reshape(2, n, r, d), 0, 1)
        return {"pool": pool}, sstate

    def cost_stats(self):
        lookups = sum(t.volume for t in self.inputs)
        d = self.layout.dim
        return {
            "flops": float(lookups * d),
            "bytes": 8.0 * lookups * d,
            "param_bytes": 4.0 * self.layout.num_shards * self.layout.r_pad * d,
        }
