"""BatchMatmul op.

TPU-native analog of the reference BatchMatmul (reference:
src/ops/batch_matmul.cu:1-675; cuBLAS SgemmStridedBatched at 194-260).
Computes C[b] = A[b] @ B[b] over leading batch dims. The reference's
runtime-adjustable seq_length (a/b_seq_length_dim, batch_matmul.cu:21-43,
fed from FFIterationConfig) maps to static slicing at trace time: a new
seq_length triggers one re-trace, after which XLA runs fully-static shapes
(the XLA-idiomatic equivalent of adjusting GEMM extents per launch).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


class BatchMatmul(Op):
    op_type = OperatorType.OP_BATCHMATMUL

    def __init__(
        self,
        name: str,
        a: TensorSpec,
        b: TensorSpec,
        a_seq_length_dim: int = -1,
        b_seq_length_dim: int = -1,
    ):
        super().__init__(name, [a, b])
        assert a.num_dims == b.num_dims >= 3
        assert a.shape[:-2] == b.shape[:-2], "batch dims must match"
        assert a.shape[-1] == b.shape[-2], (a.shape, b.shape)
        # reference asserts seq dims can only be the two innermost (0/1 in
        # its reversed convention, batch_matmul.cu:40-43)
        assert a_seq_length_dim in (-1, 0, 1) and b_seq_length_dim in (-1, 0, 1)
        self.a_seq_length_dim = a_seq_length_dim
        self.b_seq_length_dim = b_seq_length_dim
        self._out(tuple(a.shape[:-1]) + (b.shape[-1],), a.dtype)

    def forward(self, params, inputs, ctx):
        a, b = inputs
        seq = ctx.seq_length
        if seq is not None and seq > 0:
            # adim(0)=innermost: dim 0 => last axis, dim 1 => second-to-last
            if self.a_seq_length_dim == 0:
                a = a[..., :seq]
            elif self.a_seq_length_dim == 1:
                a = a[..., :seq, :]
            if self.b_seq_length_dim == 0:
                b = b[..., :seq]
            elif self.b_seq_length_dim == 1:
                b = b[..., :seq, :]
        cdt = ctx.compute_dtype
        y = jnp.matmul(
            a.astype(cdt), b.astype(cdt), preferred_element_type=jnp.float32
        ).astype(inputs[0].dtype)
        full = self.outputs[0].shape
        if y.shape != tuple(full):
            pad = [(0, f - s) for f, s in zip(full, y.shape)]
            y = jnp.pad(y, pad)
        return [y]

    def cost_stats(self):
        a, b = self.inputs
        batch = 1
        for d in a.shape[:-2]:
            batch *= d
        m, k = a.shape[-2], a.shape[-1]
        n = b.shape[-1]
        return {
            "flops": 2.0 * batch * m * k * n,
            "bytes": 4.0 * batch * (m * k + k * n + m * n),
            "param_bytes": 0.0,
        }
