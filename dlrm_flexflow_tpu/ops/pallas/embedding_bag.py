"""Fused EmbeddingBag lookup+pool (Pallas TPU kernel).

TPU-native analog of the reference's fused gather+pool CUDA kernel
(reference: src/ops/embedding.cu:166-190; AVX2 CPU variant with software
prefetch src/ops/embedding.cc:23-319). The table stays HBM-resident; the
kernel streams bag-member rows into VMEM with explicit async row DMAs,
double-buffered across output rows so the DMA latency of bag m+1 hides
behind the pooling arithmetic of bag m — the same latency-hiding idea as the
reference's software prefetch (embedding.cc:100+ _mm_prefetch).

Index plumbing: indices ride in SMEM blocks (they drive DMA addresses, so
they must live where scalars are readable); entries < 0 are padding and
pool as zero, matching ops/embedding.py semantics.

When this wins: XLA lowers jnp.take to a gather HLO whose row fetches are
issued by generic scatter/gather machinery; for pooled bags (H > 1) it also
materializes [M, H, D] rows before the reduce when fusion fails. This kernel
never materializes the rows and overlaps fetch with pooling. For H == 1 and
tiny D the XLA gather is already latency-optimal — the op layer only routes
pooled lookups here.

Backward (custom VJP) reuses bag_row_grads + XLA scatter-add; the production
DLRM path doesn't take it (the sparse-update path applies row gradients
directly in the optimizer — see ops/embedding.py sparse_update).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ffconst import AggrMode


def _bag_kernel(idx_ref, table_ref, out_ref, rows, sems, *, m_tile, h, d, avg):
    """idx_ref: [MT, H] SMEM; table_ref: [R, D] ANY(HBM); out_ref: [MT, D]
    VMEM; rows: [2, H, D] VMEM scratch; sems: [2, H] DMA semaphores."""

    def start_row(slot, m):
        # Issue H row DMAs for bag m into buffer `slot`. Padding entries
        # fetch row 0 (cheap; masked out of the pool).
        for hh in range(h):
            i = idx_ref[m, hh]
            safe = jnp.maximum(i, 0)
            pltpu.make_async_copy(
                table_ref.at[safe], rows.at[slot, hh], sems.at[slot, hh]
            ).start()

    start_row(0, 0)
    for m in range(m_tile):  # static unroll: m_tile is small (8-16)
        slot = m % 2
        if m + 1 < m_tile:
            start_row((m + 1) % 2, m + 1)
        acc = jnp.zeros((1, d), jnp.float32)
        cnt = jnp.zeros((), jnp.float32)
        for hh in range(h):
            pltpu.make_async_copy(
                table_ref.at[0], rows.at[slot, hh], sems.at[slot, hh]
            ).wait()
            valid = idx_ref[m, hh] >= 0
            r = rows[slot, hh : hh + 1, :].astype(jnp.float32)
            acc = acc + jnp.where(valid, r, jnp.zeros_like(r))
            cnt = cnt + jnp.where(valid, 1.0, 0.0)
        if avg:
            acc = acc / jnp.maximum(cnt, 1.0)
        out_ref[m : m + 1, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("aggr", "m_tile", "interpret", "out_dtype")
)
def _bag_fwd(table, idx, aggr, m_tile=8, interpret=False, out_dtype=None):
    r, d = table.shape
    squeeze = idx.ndim == 1
    if squeeze:
        idx = idx[:, None]
    m, h = idx.shape
    idx = idx.astype(jnp.int32)
    pad_m = (-m) % m_tile
    if pad_m:
        idx = jnp.concatenate([idx, jnp.full((pad_m, h), -1, jnp.int32)], 0)
    mp = m + pad_m
    kernel = functools.partial(
        _bag_kernel, m_tile=m_tile, h=h, d=d,
        avg=aggr is AggrMode.AGGR_MODE_AVG,
    )
    out = pl.pallas_call(
        kernel,
        grid=(mp // m_tile,),
        in_specs=[
            pl.BlockSpec((m_tile, h), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((m_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype or table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, h, d), table.dtype),
            pltpu.SemaphoreType.DMA((2, h)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(mp * h * d),
            bytes_accessed=int(4 * (mp * h * d + mp * d)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, table)
    if pad_m:
        out = out[:m]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def embedding_bag_pallas(table, idx, aggr=AggrMode.AGGR_MODE_SUM, m_tile=8,
                         interpret=False):
    """Pooled lookup: table [R, D], idx [M, H] (or [M]) -> [M, D].
    aggr in {SUM, AVG}; idx < 0 is padding."""
    assert aggr in (AggrMode.AGGR_MODE_SUM, AggrMode.AGGR_MODE_AVG), (
        "pallas embedding-bag is a pooled kernel; use XLA take for AGGR_NONE"
    )
    return _bag_fwd(table, idx, aggr, m_tile, interpret)


def _fwd(table, idx, aggr, m_tile, interpret):
    return _bag_fwd(table, idx, aggr, m_tile, interpret), (table.shape, idx)


def _bwd(aggr, m_tile, interpret, res, g):
    from ..embedding import bag_row_grads

    (r, d), idx = res
    rows, grads = bag_row_grads(idx, g, aggr, r)
    dtable = jnp.zeros((r, d), jnp.float32).at[rows].add(
        grads, mode="drop", indices_are_sorted=False, unique_indices=False
    )
    return dtable, None


embedding_bag_pallas.defvjp(_fwd, _bwd)
