"""EmbeddingBag op (single table).

TPU-native analog of the reference Embedding (reference: src/ops/embedding.cu
fwd gather+pool kernel at 166-190, bwd atomicAdd scatter at 192-217; AVX2 CPU
variant src/ops/embedding.cc:23-319). Here the fused lookup+pool runs either
as XLA gather+reduce (always available) or through the Pallas fused kernel
(ops/pallas/embedding_bag.py) on TPU. Backward is jax.grad of the gather —
XLA emits a sorted scatter-add, replacing the CUDA atomicAdd kernel.

Semantics: input int indices [B] or [B, bag]; entries < 0 are padding
(masked out — extension over the reference, which assumes dense bags,
examples/cpp/DLRM/dlrm.cc:101). aggr in {none, sum, avg}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import AggrMode, DataType, OperatorType
from ..core.graph import Op
from ..core.initializers import GlorotUniform
from ..core.tensor import TensorSpec


class Embedding(Op):
    op_type = OperatorType.OP_EMBEDDING

    def __init__(
        self,
        name: str,
        input: TensorSpec,
        num_entries: int,
        out_dim: int,
        aggr: AggrMode = AggrMode.AGGR_MODE_SUM,
        kernel_initializer=None,
    ):
        super().__init__(name, [input])
        assert input.dtype in (DataType.DT_INT32, DataType.DT_INT64), (
            f"embedding input must be integer indices, got {input.dtype}"
        )
        self.num_entries = int(num_entries)
        self.out_dim = int(out_dim)
        self.aggr = aggr
        batch = input.shape[0]
        if aggr is AggrMode.AGGR_MODE_NONE and input.num_dims == 2 and input.shape[1] > 1:
            # per-token lookup (no pooling): [B, T] ids -> [B, T, D]
            # sequence, the NMT/RNN front end (reference: nmt/embed.cu)
            self._out((batch, input.shape[1], out_dim))
        else:
            self._out((batch, out_dim))
        self._param(
            "weight",
            (self.num_entries, self.out_dim),
            kernel_initializer or GlorotUniform(),
        )
        # packed-layout storage ([V*D/128, 128] canonical) — enabled by
        # FFModel.compile on TPU when the sparse-update path is active so
        # the Pallas packed-update kernel replaces the XLA scatter
        # (ops/pallas/packed_update.py; 19x at kaggle dims)
        self.packed = False
        # mid-band one-hot-over-pack-lines forward for packed tables
        # (config.onehot_packed_threshold; dense [P, 128] grads)
        self.onehot_packed = False
        self.chunk_packs = 1024
        # training storage dtype for the PACKED table (config.table_dtype;
        # set by compile): bf16 halves the forward-gather and update-pass
        # HBM traffic; the update kernel still accumulates f32 and the
        # optimizer side pools stay f32
        self.table_dtype = None
        # host-tail offload (parallel/host_tail.py): when > 0, this is the
        # FULL vocabulary; num_entries holds only the device-resident hot
        # prefix and rows >= num_entries live in the host tail store. The
        # op gains two extra inputs (pos [K_cap] int32, val [K_cap, D])
        # carrying the host's pooled tail partials, scatter-added into the
        # pooled output (exact for SUM pooling). Reference analog: hetero
        # strategies placing embeddings in host memory
        # (dlrm_strategy_hetero.cc, src/ops/embedding.cc:23-319).
        self.host_tail_vocab = 0

    def enable_host_tail(self, full_vocab: int, pos_spec, val_spec) -> None:
        assert self.aggr is AggrMode.AGGR_MODE_SUM, (
            "host-tail offload requires SUM pooling (partials must add)"
        )
        assert 0 < self.num_entries < full_vocab
        self.host_tail_vocab = int(full_vocab)
        self.inputs.extend([pos_spec, val_spec])

    def forward(self, params, inputs, ctx):
        if self.host_tail_vocab:
            idx, pos, val = inputs
            # device handles only the hot prefix; tail lookups mask to
            # padding (their contribution arrives in (pos, val))
            idx = jnp.where(
                idx.astype(jnp.int32) >= self.num_entries, -1, idx
            )
            (pooled,) = self._forward_device([idx], params, ctx)
            return [
                pooled.at[pos].add(
                    val.astype(pooled.dtype), mode="drop"
                )
            ]
        return self._forward_device(inputs, params, ctx)

    def _forward_device(self, inputs, params, ctx):
        (idx,) = inputs
        if "weight_q" in params:
            # int8 serving rows with per-row scales
            # (FFModel.quantize_embeddings("int8")); training refuses this
            # state, so only the lookup path exists
            return [
                quantized_embedding_bag(
                    params["weight_q"], params["weight_scale"], idx,
                    self.aggr, self.out_dim, packed=self.packed,
                )
            ]
        if self.packed:
            if getattr(self, "onehot_packed", False):
                # mid-vocab: one-hot matmul over pack lines (dense grads,
                # no gather / no update stream) — see compile()'s
                # onehot_packed_threshold selection
                return [
                    packed_embedding_bag_onehot(
                        params["weight"], idx, self.aggr, self.out_dim,
                        ctx.compute_dtype,
                    )
                ]
            return [
                packed_embedding_bag(
                    params["weight"], idx, self.aggr, self.out_dim
                )
            ]
        thr = getattr(ctx, "onehot_threshold", 0)
        if 0 < self.num_entries <= thr and self.aggr is not AggrMode.AGGR_MODE_NONE:
            # Pallas variant builds the one-hot on-chip (VMEM). Measured
            # SLOWER than the XLA path end-to-end (XLA fuses the iota-compare
            # generator into the dot, so nothing is materialized in HBM);
            # kept force-only (ops/pallas/onehot_embedding.py).
            if getattr(ctx, "use_pallas", "off") == "on":
                from .pallas.onehot_embedding import onehot_embedding_pallas

                return [
                    onehot_embedding_pallas(
                        params["weight"], idx, self.aggr,
                        compute_dtype=ctx.compute_dtype,
                    )
                ]
            return [
                embedding_bag_onehot(
                    params["weight"], idx, self.aggr, ctx.compute_dtype
                )
            ]
        # The Pallas row-DMA kernel needs lane-aligned rows (D % 128) and
        # only runs when forced: XLA's gather measured at HBM speed-of-light
        # for pooled bags (scripts/microbench_pallas.py).
        if (
            getattr(ctx, "use_pallas", "off") == "on"
            and self.out_dim % 128 == 0
            and self.aggr is not AggrMode.AGGR_MODE_NONE
        ):
            from .pallas.embedding_bag import embedding_bag_pallas

            return [embedding_bag_pallas(params["weight"], idx, self.aggr)]
        return [embedding_bag(params["weight"], idx, self.aggr)]

    # ---- sparse-gradient path (see FFModel.compile) -------------------------
    def sparse_update(self, params, inputs, g_out_list, optimizer, sstate, ctx, lr=None):
        """Apply the pooled-output gradient directly to touched rows: the TPU
        analog of the reference backward scatter (embedding.cu:192-217) fused
        with the optimizer step — no dense [vocab, dim] gradient exists."""
        idx = inputs[0]  # host-tail ops carry extra (pos, val) inputs
        if self.host_tail_vocab:
            # tail rows (>= the device hot prefix) update on the HOST from
            # the same pooled grad (gathered at pos by the train step)
            idx = jnp.where(
                idx.astype(jnp.int32) >= self.num_entries, -1, idx
            )
        rows, grads = bag_row_grads(idx, g_out_list[0], self.aggr, self.num_entries)
        table, sstate = optimizer.sparse_row_update(
            params["weight"], sstate, rows, grads, lr=lr
        )
        return {"weight": table}, sstate

    def sparse_state_init(self, optimizer):
        st = optimizer.sparse_init((self.num_entries, self.out_dim))
        if st is not None and self.packed:
            # optimizer state stored packed so the same packed-update kernel
            # maintains it: per-row scalars (AdaGrad acc) lane-replicate over
            # the row's D lanes; per-element pools (momentum velocity [V, D],
            # Adam m/v stacked [2, V, D]) pack like the weight
            from .pallas.packed_update import pack_table

            shape = (self.num_entries, self.out_dim)
            if st.ndim == 1:  # per-row accumulator
                st = pack_table(
                    jnp.broadcast_to(st[:, None], shape).astype(jnp.float32),
                    self.chunk_packs,
                )
            elif st.ndim == 2:  # per-element pool (velocity)
                st = pack_table(st.astype(jnp.float32), self.chunk_packs)
            else:  # Adam m/v: SEPARATE packed pools (round 5 — a stacked
                # [2, Pp, 128] array forced a slice-copy per pool on the
                # way into the donating update kernel and a stack-copy on
                # the way out, ~8.6 GB/step of pure copies at kaggle scale)
                st = {
                    "m": pack_table(
                        st[0].astype(jnp.float32), self.chunk_packs
                    ),
                    "v": pack_table(
                        st[1].astype(jnp.float32), self.chunk_packs
                    ),
                }
        return st

    def pack_params(self, sub: dict) -> dict:
        from .pallas.packed_update import pack_table

        w = pack_table(sub["weight"], self.chunk_packs)
        if self.table_dtype is not None:
            w = w.astype(self.table_dtype)
        return {**sub, "weight": w}

    def unpack_params(self, sub: dict) -> dict:
        from .pallas.packed_update import unpack_table

        return {
            **sub,
            "weight": unpack_table(
                sub["weight"], self.num_entries, self.out_dim
            ),
        }

    def cost_stats(self):
        idx = self.inputs[0]
        lookups = idx.volume
        row_bytes = 4.0 * self.out_dim
        return {
            "flops": float(lookups * self.out_dim),
            "bytes": row_bytes * lookups * 2.0 + 4.0 * lookups,
            "param_bytes": 4.0 * self.num_entries * self.out_dim,
        }


def quantized_embedding_bag(q, scale, idx, aggr: AggrMode, out_dim: int,
                            packed: bool):
    """Pooled lookup from int8 rows + per-row f32 scales (the production
    serving format; 4x less table HBM than f32). `packed`: q is [Pp, 128]
    int8 and scale a D=1 packed pool; else q is [V, D] int8 and scale [V].
    Packed gathers ride the whole-pack fetch+mask path — the lane-sliced
    lax.gather lowers to a ~1211 ns/row scalar-loop class on this
    toolchain (PERF.md round 3; measured round 5: it put int8 serving at
    82k ex/s vs 11.2M bf16). Packs are fetched in int8 (the table's HBM
    reads stay 4x smaller than f32) and only the gathered [K, 128] batch
    widens to f32 for the mask-sum row select (exact)."""
    idx = idx.astype(jnp.int32)
    squeeze_bag = idx.ndim == 1
    if squeeze_bag:
        idx = idx[:, None]
    b, h = idx.shape
    valid = idx >= 0
    if packed:
        rpp = 128 // out_dim
        safe = jnp.clip(idx, 0, q.shape[0] * rpp - 1).reshape(-1)
        kk = safe.shape[0]

        def _pack_select(tbl, d_sel, rows):
            rp = 128 // d_sel
            gpk = tbl.at[rows // rp].get(
                mode="promise_in_bounds"
            ).astype(jnp.float32)                        # [K, 128]
            g3 = gpk.reshape(kk, rp, d_sel)
            oh = (
                (rows % rp)[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (kk, rp), 1)
            )
            return jnp.sum(g3 * oh[..., None].astype(g3.dtype), axis=1)

        qr = _pack_select(q, out_dim, safe)              # [K, D] f32
        sr = _pack_select(scale, 1, safe)                # [K, 1] f32
    else:
        safe = jnp.clip(idx, 0, q.shape[0] - 1).reshape(-1)
        qr = q.at[safe].get(mode="promise_in_bounds")
        sr = scale.at[safe].get(mode="promise_in_bounds")[:, None]
    rows = (qr.astype(jnp.float32) * sr).reshape(b, h, out_dim)
    rows = jnp.where(valid[..., None], rows, jnp.zeros((), rows.dtype))
    if aggr is AggrMode.AGGR_MODE_NONE:
        return rows[:, 0, :] if squeeze_bag else rows
    pooled = jnp.sum(rows, axis=1)
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        pooled = pooled / count.astype(pooled.dtype)
    return pooled


def quantize_table_int8(w, packed_layout: bool, chunk_packs: int = 1024):
    """[V, D] f32 -> (q int8, per-row scale f32) in the target layout."""
    from .pallas.packed_update import pack_table

    s = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
    if packed_layout:
        return (
            pack_table(q, chunk_packs),
            pack_table(s[:, None].astype(jnp.float32), chunk_packs),
        )
    return q, s.astype(jnp.float32)


def packed_embedding_bag(packed, idx, aggr: AggrMode, out_dim: int):
    """Pooled lookup from a packed [Pp, 128] table (the whole-pack gather
    measured no slower than the narrow [V, D] gather; the pack IS the
    physical HBM tile either way)."""
    from .pallas.packed_update import gather_rows

    idx = idx.astype(jnp.int32)
    squeeze_bag = idx.ndim == 1
    if squeeze_bag:
        idx = idx[:, None]
    b, h = idx.shape
    valid = idx >= 0
    rpp = 128 // out_dim
    safe = jnp.clip(idx, 0, packed.shape[0] * rpp - 1)
    rows = gather_rows(packed, safe.reshape(-1), out_dim).reshape(b, h, out_dim)
    rows = jnp.where(valid[..., None], rows, jnp.zeros((), rows.dtype))
    if aggr is AggrMode.AGGR_MODE_NONE:
        return rows[:, 0, :] if squeeze_bag else rows
    pooled = jnp.sum(rows, axis=1)
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        pooled = pooled / count.astype(pooled.dtype)
    return pooled


def packed_embedding_bag_onehot(
    packed, idx, aggr: AggrMode, out_dim: int, compute_dtype=jnp.bfloat16
):
    """Mid-vocab pooled lookup as a one-hot matmul over PACK LINES.

    The narrow one-hot (embedding_bag_onehot) contracts onehot[B, V] @
    table[V, D] — at D=16 only 16 of the MXU's 128 output lanes do work,
    an 8x waste that caps the profitable vocab at ~8k. Contracting over
    the packed layout instead — onehot[B, V/rpp] @ packed[V/rpp, 128] —
    keeps all 128 lanes live (rpp = 128/D rows ride each line), so the
    same flop budget covers an rpp-times-larger vocab; the row's D-lane
    slice falls out with the packed_gather mask-sum. Exact (one-hot row
    select), dense [P, 128] grads via autodiff — mid-band tables skip the
    HBM gather AND the update-stream machinery entirely.
    reference: src/ops/embedding.cu:166-217 (one lookup+backward pair per
    table regardless of vocab; this is the MXU-native mid-vocab analog)."""
    idx = idx.astype(jnp.int32)
    squeeze_bag = idx.ndim == 1
    if squeeze_bag:
        idx = idx[:, None]
    if aggr is AggrMode.AGGR_MODE_NONE:
        raise ValueError("one-hot path requires pooling")
    b, h = idx.shape
    p_lines = packed.shape[0]
    rpp = 128 // out_dim
    flat = idx.reshape(-1)
    valid = flat >= 0
    # invalid (padding) lookups one-hot to all-zeros: sentinel line id
    # p_lines never matches the iota
    p = jnp.where(valid, flat // rpp, p_lines)
    sub = jnp.where(valid, flat % rpp, 0)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (b * h, p_lines), 1)
    onehot = (p[:, None] == iota_p).astype(compute_dtype)
    lines = jax.lax.dot_general(
        onehot, packed.astype(compute_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B*H, 128]
    l3 = lines.reshape(b * h, rpp, out_dim)
    oh_sub = (
        sub[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (b * h, rpp), 1)
    )
    rows = jnp.sum(l3 * oh_sub[..., None].astype(l3.dtype), axis=1)
    pooled = jnp.sum(rows.reshape(b, h, out_dim), axis=1)
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(
            jnp.sum(valid.reshape(b, h), axis=1, keepdims=True), 1
        )
        pooled = pooled / count.astype(pooled.dtype)
    return pooled.astype(packed.dtype)


def embedding_bag(table, idx, aggr: AggrMode):
    """Pooled lookup with negative-index padding. Pure-XLA path; the Pallas
    fused path (used by the DLRM embedding collection) lives in
    ops/pallas/embedding_bag.py."""
    idx = idx.astype(jnp.int32)
    squeeze_bag = idx.ndim == 1
    if squeeze_bag:
        idx = idx[:, None]
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    rows = jnp.take(table, safe, axis=0)  # [B, bag, D]
    rows = jnp.where(valid[..., None], rows, jnp.zeros((), rows.dtype))
    if aggr is AggrMode.AGGR_MODE_NONE:
        return rows[:, 0, :] if squeeze_bag else rows
    pooled = jnp.sum(rows, axis=1)
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        pooled = pooled / count.astype(pooled.dtype)
    return pooled


def embedding_bag_onehot(table, idx, aggr: AggrMode, compute_dtype=jnp.bfloat16):
    """Small-vocab pooled lookup as a one-hot matmul on the MXU.

    For vocab up to a few thousand rows, streaming the whole table through
    the systolic array beats random 64-byte gathers from HBM (the XLA gather
    is latency-bound). Backward is a dense [V, D] matmul grad — cheap at
    these sizes — so small tables stay on the dense autodiff/optimizer path.
    Padding entries (idx < 0) one-hot to all-zeros for free.
    """
    idx = idx.astype(jnp.int32)
    if idx.ndim == 1:
        idx = idx[:, None]
    b, h = idx.shape
    v, d = table.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, h, v), 2)
    onehot = (idx[:, :, None] == iota).astype(compute_dtype)
    pooled = jnp.einsum(
        "bhv,vd->bd", onehot, table.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(idx >= 0, axis=1, keepdims=True), 1)
        pooled = pooled / count.astype(pooled.dtype)
    if aggr is AggrMode.AGGR_MODE_NONE:
        raise ValueError("one-hot path requires pooling")
    return pooled.astype(table.dtype)


def bag_row_grads(idx, g_pooled, aggr: AggrMode, num_entries: int):
    """Expand a pooled-output gradient [B, D] into per-row scatter operands:
    rows [B*H] (out-of-range marks padding, to be dropped by scatter) and
    row_grads [B*H, D]. For AVG pooling each member gets g/count."""
    idx = idx.astype(jnp.int32)
    if idx.ndim == 1:
        idx = idx[:, None]
    b, h = idx.shape
    valid = idx >= 0
    g = g_pooled.astype(jnp.float32)
    rows = jnp.where(valid, idx, num_entries).reshape(b * h)
    if aggr is AggrMode.AGGR_MODE_NONE:
        # per-token (sequence) lookup: each (b, t) slot has its own grad
        return rows, g.reshape(b * h, -1)
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        g = g / count.astype(g.dtype)
    grads = jnp.broadcast_to(g[:, None, :], (b, h, g.shape[-1])).reshape(b * h, -1)
    return rows, grads


def bag_row_src(idx, g_pooled, aggr: AggrMode, num_entries: int):
    """Like bag_row_grads but UNEXPANDED: returns (rows [B*H], src [B, D]
    f32, h) with delta row k = src[k // h]. The packed update path gathers
    payloads into sorted order anyway, so the bag broadcast composes into
    that gather (gather_payload) and the [B*H, D] expansion is never
    materialized (reference reads the pooled grad directly in its fused
    backward, src/ops/embedding.cu:192-217)."""
    idx = idx.astype(jnp.int32)
    if idx.ndim == 1:
        idx = idx[:, None]
    b, h = idx.shape
    valid = idx >= 0
    g = g_pooled.astype(jnp.float32)
    rows = jnp.where(valid, idx, num_entries).reshape(b * h)
    if aggr is AggrMode.AGGR_MODE_NONE:
        # per-token grads: no bag broadcast — delta row k = src[k]
        return rows, g.reshape(b * h, -1), 1
    if aggr is AggrMode.AGGR_MODE_AVG:
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        g = g / count.astype(g.dtype)
    return rows, g, h
