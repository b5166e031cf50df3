"""Linear/Dense op.

TPU-native analog of the reference Linear (reference: src/ops/linear.cu:1-1123,
fwd kernel 425-466). The cuBLAS SGEMM + fused-activation kernel becomes one
jnp.dot in the compute dtype (bf16 on MXU, f32 accumulation) — XLA fuses bias
+ activation into the matmul epilogue. The reference's parameter-parallel
machinery (replica tensors + LINEAR_BWD2 reduction tree, linear.cu:769-960)
is subsumed by sharding the weight's output-channel dim over a mesh axis in
the ShardingPlan; XLA inserts the reductions.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ffconst import ActiMode, OperatorType, as_acti_mode
from .common import apply_activation
from ..core.graph import Op
from ..core.initializers import DefaultBiasInit, DefaultWeightInit
from ..core.tensor import TensorSpec


class Dense(Op):
    op_type = OperatorType.OP_LINEAR

    def __init__(
        self,
        name: str,
        input: TensorSpec,
        out_dim: int,
        activation=ActiMode.AC_MODE_NONE,
        use_bias: bool = True,
        kernel_initializer=None,
        bias_initializer=None,
    ):
        super().__init__(name, [input])
        self.out_dim = int(out_dim)
        self.in_dim = int(input.shape[-1])
        self.activation = as_acti_mode(activation)
        self.use_bias = use_bias
        self._out(tuple(input.shape[:-1]) + (self.out_dim,), input.dtype)
        # weight layout [out, in] (matches reference logical layout,
        # src/ops/linear.cu create_weights)
        self._param(
            "kernel",
            (self.out_dim, self.in_dim),
            kernel_initializer or DefaultWeightInit(),
        )
        if use_bias:
            self._param("bias", (self.out_dim,), bias_initializer or DefaultBiasInit())

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        w = params["kernel"]
        cdt = ctx.compute_dtype
        # "on" forces the Pallas tiled-matmul kernel (ops/pallas/fused_mlp.py);
        # in "auto" XLA keeps this op — its matmul+epilogue fusion measured at
        # parity (scripts/microbench_pallas.py) and handles every rank.
        if getattr(ctx, "use_pallas", "off") == "on" and x.ndim == 2:
            from .pallas.fused_mlp import dense_pallas

            y = dense_pallas(
                x.astype(cdt),
                w.T.astype(cdt),
                params["bias"].astype(cdt) if self.use_bias else None,
                self.activation,
            )
            return [y.astype(x.dtype)]
        y = jnp.dot(x.astype(cdt), w.T.astype(cdt), preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + params["bias"]
        y = apply_activation(y, self.activation)
        return [y.astype(x.dtype)]

    def cost_stats(self):
        batch_elems = 1
        for d in self.inputs[0].shape[:-1]:
            batch_elems *= d
        flops = 2.0 * batch_elems * self.in_dim * self.out_dim
        bytes_ = 4.0 * (
            batch_elems * self.in_dim
            + batch_elems * self.out_dim
            + self.in_dim * self.out_dim
        )
        return {
            "flops": flops,
            "bytes": bytes_,
            "param_bytes": 4.0 * (self.in_dim + 1) * self.out_dim,
        }
