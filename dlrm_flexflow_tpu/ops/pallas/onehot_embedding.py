"""Small-vocab embedding as on-chip one-hot MXU matmul (Pallas TPU kernel).

This kernel builds the pooled one-hot tile [BT, V] in VMEM with an
iota-compare (VPU), feeds the MXU directly, and never touches HBM with it;
the table block stays VMEM-resident across the whole batch sweep (constant
index_map).

Measured verdict (kaggle DLRM, bs 8k/64k, v5e): end-to-end SLOWER than the
XLA one-hot path (963k -> 888k ex/s at bs=8k) — XLA already fuses the
iota-compare generator into the dot, so the [B, H, V] one-hot is never
materialized in HBM (HLO cost analysis reports pre-fusion bytes, which
misleads). Kept as the explicitly-scheduled variant, routed only under
--use-pallas on; the measured-routing story lives in ops/embedding.py.

Backward is the transpose matmul dT = onehot^T @ g accumulated in a VMEM
scratch across batch tiles — the dense-gradient analog of the reference's
scatter-add (reference: src/ops/embedding.cu:192-217), shaped for the MXU
instead of atomics. Both directions are exact (duplicate indices inside a
bag pool correctly through the summed one-hot).

Used for tables with vocab <= FFConfig.onehot_embedding_threshold; larger
tables keep the XLA gather + sparse-row-update path (ops/embedding.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ffconst import AggrMode


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pooled_onehot(idx_tile, v, compute_dtype, avg):
    """idx_tile [BT, H] int32 -> summed one-hot [BT, V]; padding (<0) rows
    contribute nothing. AVG divides by the valid count."""
    bt, h = idx_tile.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (bt, v), 1)
    oh = jnp.zeros((bt, v), jnp.float32)
    for hh in range(h):  # H is small and static
        col = idx_tile[:, hh : hh + 1]
        oh = oh + (col == iota).astype(jnp.float32)
    if avg:
        cnt = jnp.sum((idx_tile >= 0).astype(jnp.float32), axis=1, keepdims=True)
        oh = oh / jnp.maximum(cnt, 1.0)
    return oh.astype(compute_dtype)


def _fwd_kernel(idx_ref, table_ref, out_ref, *, v, avg, compute_dtype):
    oh = _pooled_onehot(idx_ref[:], v, compute_dtype, avg)
    out_ref[:] = jnp.dot(
        oh, table_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, dt_ref, acc, *, v, avg, compute_dtype, n_tiles):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    oh = _pooled_onehot(idx_ref[:], v, compute_dtype, avg)
    # dT += oh^T @ g : contract over the batch-tile dim on the MXU
    acc[:] += jax.lax.dot_general(
        oh, g_ref[:].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_tiles - 1)
    def _():
        dt_ref[:] = acc[:].astype(dt_ref.dtype)


def _prep_idx(idx, block_b):
    squeeze = idx.ndim == 1
    if squeeze:
        idx = idx[:, None]
    b, h = idx.shape
    idx = idx.astype(jnp.int32)
    pad = (-b) % block_b
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad, h), -1, jnp.int32)], 0)
    return idx, b, h, b + pad


@functools.partial(
    jax.jit, static_argnames=("aggr", "block_b", "interpret", "compute_dtype")
)
def _onehot_fwd(table, idx, aggr, block_b, interpret, compute_dtype):
    v, d = table.shape
    avg = aggr is AggrMode.AGGR_MODE_AVG
    idx, b, h, bp = _prep_idx(idx, block_b)
    kernel = functools.partial(
        _fwd_kernel, v=v, avg=avg, compute_dtype=jnp.dtype(compute_dtype)
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # constant index_map: the table block stays VMEM-resident
            pl.BlockSpec((v, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, d), table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bp * v * d),
            bytes_accessed=int(4 * (bp * h + v * d + bp * d)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, table)
    return out[:b] if bp != b else out


@functools.partial(
    jax.jit, static_argnames=("v", "aggr", "block_b", "interpret", "compute_dtype")
)
def _onehot_bwd(g, idx, v, aggr, block_b, interpret, compute_dtype):
    d = g.shape[-1]
    avg = aggr is AggrMode.AGGR_MODE_AVG
    idx, b, h, bp = _prep_idx(idx, block_b)
    if bp != b:
        g = jnp.concatenate([g, jnp.zeros((bp - b, d), g.dtype)], 0)
    n_tiles = bp // block_b
    kernel = functools.partial(
        _bwd_kernel, v=v, avg=avg,
        compute_dtype=jnp.dtype(compute_dtype), n_tiles=n_tiles,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((block_b, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((v, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bp * v * d),
            bytes_accessed=int(4 * (bp * h + bp * d + v * d)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def onehot_embedding_pallas(
    table,
    idx,
    aggr=AggrMode.AGGR_MODE_SUM,
    block_b=512,
    interpret=False,
    compute_dtype=jnp.bfloat16,
):
    """Pooled small-vocab lookup: table [V, D], idx [B] or [B, H] -> [B, D].
    Differentiable w.r.t. table (dense [V, D] gradient, VMEM-accumulated)."""
    assert aggr is not AggrMode.AGGR_MODE_NONE, "pooled kernel"
    return _onehot_fwd(table, idx, aggr, block_b, interpret, compute_dtype)


def _vjp_fwd(table, idx, aggr, block_b, interpret, compute_dtype):
    out = _onehot_fwd(table, idx, aggr, block_b, interpret, compute_dtype)
    return out, (table.shape[0], idx)


def _vjp_bwd(aggr, block_b, interpret, compute_dtype, res, g):
    v, idx = res
    dt = _onehot_bwd(g, idx, v, aggr, block_b, interpret, compute_dtype)
    return dt, None


onehot_embedding_pallas.defvjp(_vjp_fwd, _vjp_bwd)
