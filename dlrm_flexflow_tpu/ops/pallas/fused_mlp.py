"""Tiled dense layer: bf16 MXU matmul + f32 VMEM accumulator + fused
bias/activation epilogue (Pallas TPU kernel).

TPU-native analog of the reference Linear forward kernel — cuBLAS SGEMM with
the activation fused into the epilogue (reference: src/ops/linear.cu:425-531).
XLA already performs this fusion for jnp.dot + bias + act, so this kernel
exists for two reasons: (a) it is the explicitly-scheduled variant the
framework can fall back on when XLA's choices regress (the op layer picks by
measurement), and (b) it anchors the MLP-epilogue slot of the kernel
inventory (SURVEY.md §2.11 item 3).

Schedule: grid (M/BM, N/BN, K/BK) with K innermost; one [BM, BN] f32
accumulator lives in VMEM scratch across the K sweep; inputs stream as
bf16 tiles feeding the 128x128 MXU; the epilogue (bias add + activation +
downcast) runs once on the last K step while the next (M, N) tile's first
operands are already being prefetched by the pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ffconst import ActiMode
from ..common import apply_activation


def _dense_kernel(x_ref, w_ref, b_ref, out_ref, acc, *, activation, n_k, use_bias):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        y = acc[:]
        if use_bias:
            y = y + b_ref[:].astype(jnp.float32)
        y = apply_activation(y, activation)
        out_ref[:] = y.astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "block_k", "interpret"),
)
def dense_pallas(
    x,
    w,  # [K, N] (input-major; callers transpose the [out, in] parameter)
    b=None,  # [N] or None
    activation: ActiMode = ActiMode.AC_MODE_NONE,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """y = act(x @ w + b). x: [M, K]; returns [M, N] in x.dtype."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    bm, bn, bk = min(block_m, _round_up(m, 8)), min(block_n, _round_up(n, 128)), min(
        block_k, _round_up(k, 128)
    )
    pm, pn, pk = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    if pm != m or pk != k:
        x = jnp.pad(x, ((0, pm - m), (0, pk - k)))
    if pk != k or pn != n:
        w = jnp.pad(w, ((0, pk - k), (0, pn - n)))
    use_bias = b is not None
    if use_bias:
        bb = jnp.pad(b, (0, pn - n)) if pn != n else b
        bb = bb.reshape(1, pn)
    n_k = pk // bk
    kernel = functools.partial(
        _dense_kernel, activation=activation, n_k=n_k, use_bias=use_bias
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, w]
    if use_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bb)
    else:
        # keep kernel arity fixed: pass a dummy zero bias tile
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(jnp.zeros((1, pn), x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(pm // bm, pn // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pm, pn), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * pm * pn * pk),
            bytes_accessed=int((pm * pk + pk * pn + pm * pn) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if pm != m or pn != n:
        out = out[:m, :n]
    return out
