"""Sparse embedding-update engine.

Routes the pooled-output gradients of sparse embedding ops into row
updates. Ops with packed-layout tables (ops/pallas/packed_update.py) are
grouped by operand shape so the pack-id sort batches into ONE lax.sort
across tables (measured 2.3 ms for 10x65536 keys vs 2.9 ms each) and the
kernels replace the XLA scatters (19x at kaggle dims). Everything else
falls back to the per-op sparse_update path (XLA scatter).

Reference analog: the per-parameter optimizer update task dispatch
(reference: src/runtime/optimizer.cc:94 update() per parameter; the
embedding backward scatter at src/ops/embedding.cu:192-217 feeding the
update kernels at optimizer_kernel.cu:44-113).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.embedding import bag_row_src
from ..ops.pallas.packed_update import (
    gather_rows,
    packed_lazy_adam_batched,
    packed_lazy_momentum_batched,
    packed_row_update_batched,
)
from .optimizer import AdamOptimizer, RowWiseAdagradOptimizer, SGDOptimizer


def _kernels_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _expand(src, h: int):
    """[B, D] pooled source -> [B*h, D] per-member payload rows (only the
    weight-decay path needs the materialized expansion)."""
    b, dd = src.shape
    if h == 1:
        return src
    return jnp.broadcast_to(src[:, None, :], (b, h, dd)).reshape(b * h, dd)


def apply_sparse_updates(
    sparse_ops,
    params,
    sparse_xs: Dict[str, list],
    g_over: Dict[str, list],
    opt,
    sstates: Dict[str, object],
    ctx,
    lr=None,
    routes=None,
):
    """Returns (new_params_subset, new_sstates). `g_over[op]` is the list of
    pooled-output gradients for op; `sparse_xs[op]` its index inputs."""
    new_params: Dict[str, dict] = {}
    new_sstates = dict(sstates)
    packed_ops = [op for op in sparse_ops if getattr(op, "packed", False)]
    plain_ops = [op for op in sparse_ops if not getattr(op, "packed", False)]

    for op in plain_ops:
        upd, new_sstates[op.name] = op.sparse_update(
            params[op.name], sparse_xs[op.name], g_over[op.name], opt,
            sstates[op.name], ctx, lr=lr,
        )
        new_params[op.name] = upd

    if not packed_ops:
        return new_params, new_sstates

    # group by (row count, dim, chunk) so sorts batch into one lax.sort
    groups: Dict[tuple, List] = {}
    for op in packed_ops:
        # host-tail ops carry (idx, pos, val); the device update only sees
        # idx — tail rows (>= the hot-prefix vocab) drop in the stream
        # prep and the host applies their grads (FFModel g_host path)
        idx = sparse_xs[op.name][0]
        # UNEXPANDED payload source: the [B*H, D] bag broadcast composes
        # into the sorted-order payload gather (gather_payload), so it is
        # never materialized
        rows, src, h = bag_row_src(
            idx, g_over[op.name][0], op.aggr, op.num_entries
        )
        key = (int(rows.shape[0]), op.out_dim)
        groups.setdefault(key, []).append((op, rows, src, h))

    interpret = _kernels_interpret()
    for (_, d), items in groups.items():
        ops_g = [it[0] for it in items]
        chunk_packs = [op.chunk_packs for op in ops_g]
        rows_l = [it[1] for it in items]
        grads_l = [(it[2], it[3]) for it in items]
        tables = [params[op.name]["weight"] for op in ops_g]
        vocabs = [op.num_entries for op in ops_g]
        # host-precomputed routes only apply when the whole group has them
        # (the stream prep is batched across the group)
        grp_routes = None
        if routes:
            rts = [routes.get(op.name) for op in ops_g]
            if all(r is not None for r in rts):
                grp_routes = rts

        if isinstance(opt, AdamOptimizer):
            # lazy Adam on packed m/v side pools, same one-hot MXU kernel
            # (lr here is the bias-corrected alpha_t from the engine caller)
            alpha_t = opt.alpha if lr is None else lr
            sts = [sstates[op.name] for op in ops_g]
            m_pools = [s["m"] for s in sts]
            v_pools = [s["v"] for s in sts]
            new_tables, new_m, new_v = packed_lazy_adam_batched(
                tables, m_pools, v_pools, rows_l, grads_l, vocabs, d,
                alpha_t=alpha_t, beta1=opt.beta1, beta2=opt.beta2,
                epsilon=opt.epsilon, weight_decay=opt.weight_decay,
                chunk_packs=chunk_packs, interpret=interpret,
                routes=grp_routes,
            )
            for op, nt, m2, v2 in zip(ops_g, new_tables, new_m, new_v):
                new_params[op.name] = {**params[op.name], "weight": nt}
                new_sstates[op.name] = {"m": m2, "v": v2}
        elif isinstance(opt, SGDOptimizer) and opt.momentum != 0.0:
            rate = opt.lr if lr is None else lr
            vels = [sstates[op.name] for op in ops_g]
            new_tables, new_vel = packed_lazy_momentum_batched(
                tables, vels, rows_l, grads_l, vocabs, d,
                lr=rate, momentum=opt.momentum, nesterov=opt.nesterov,
                weight_decay=opt.weight_decay, chunk_packs=chunk_packs,
                interpret=interpret, routes=grp_routes,
            )
            for op, nt, v2 in zip(ops_g, new_tables, new_vel):
                new_params[op.name] = {**params[op.name], "weight": nt}
                new_sstates[op.name] = v2
        elif isinstance(opt, SGDOptimizer):
            rate = opt.lr if lr is None else lr
            if opt.weight_decay != 0.0:
                # lazy decoupled decay on touched rows (duplicates decay
                # once per occurrence, matching the scatter path). The
                # per-row table term forces the expanded [K, D] payload.
                deltas = [
                    -rate * (
                        _expand(src, h) + opt.weight_decay * gather_rows(
                            t, jnp.minimum(r, v - 1), d
                        )
                    )
                    for (src, h), t, r, v in zip(
                        grads_l, tables, rows_l, vocabs
                    )
                ]
            else:
                deltas = [(-rate * src, h) for src, h in grads_l]
            new_tables = packed_row_update_batched(
                tables, rows_l, deltas, vocabs, d,
                chunk_packs=chunk_packs, interpret=interpret,
                routes=grp_routes,
            )
            for op, nt in zip(ops_g, new_tables):
                new_params[op.name] = {**params[op.name], "weight": nt}
                new_sstates[op.name] = sstates[op.name]
        elif isinstance(opt, RowWiseAdagradOptimizer):
            rate = opt.lr if lr is None else lr
            # phase 1: accumulators (stored packed, replicated over the
            # row's D lanes) += mean-square of the row gradient (computed
            # on the 1/h-size source, broadcast composed into the gather)
            gsq = [
                (
                    jnp.broadcast_to(
                        jnp.mean(jnp.square(src), axis=-1, keepdims=True),
                        src.shape,
                    ),
                    h,
                )
                for src, h in grads_l
            ]
            accs = [sstates[op.name] for op in ops_g]
            # accumulator increments stream f32: a bf16 delta quantizes each
            # accumulator add to ~8 mantissa bits and drifts from the
            # reference's f32 accumulation over long runs
            new_accs = packed_row_update_batched(
                accs, rows_l, gsq, vocabs, d,
                chunk_packs=chunk_packs, interpret=interpret,
                routes=grp_routes, delta_dtype=jnp.float32,
            )
            # phase 2: rows scaled by the POST-update accumulator (matches
            # RowWiseAdagradOptimizer.sparse_row_update); the per-row
            # rsqrt factor rides the 3-tuple payload's [K, 1] scale
            deltas = []
            for a, r, (src, h), v in zip(new_accs, rows_l, grads_l, vocabs):
                a_rows = gather_rows(a, jnp.minimum(r, v - 1), d)[:, :1]
                scale = -rate * jax.lax.rsqrt(a_rows + opt.epsilon)
                deltas.append((src, h, scale))
            new_tables = packed_row_update_batched(
                tables, rows_l, deltas, vocabs, d,
                chunk_packs=chunk_packs, interpret=interpret,
                routes=grp_routes,
            )
            for op, nt, na in zip(ops_g, new_tables, new_accs):
                new_params[op.name] = {**params[op.name], "weight": nt}
                new_sstates[op.name] = na
        else:  # pragma: no cover - compile() gates packing on these types
            # op.sparse_update would scatter UNPACKED row ids into the
            # packed [V*D/128, 128] storage — corruption, not a fallback
            raise TypeError(
                "packed tables support SGD (incl. momentum), Adam, and "
                f"row-wise AdaGrad row updates; got {type(opt).__name__} "
                "(compile() should have kept these ops unpacked)"
            )
    return new_params, new_sstates
