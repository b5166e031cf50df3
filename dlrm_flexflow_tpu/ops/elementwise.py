"""Elementwise binary/unary/scalar ops.

TPU-native analog of the reference's ElementBinary / ElementUnary
(reference: src/ops/element_binary.cu:1-875, src/ops/element_unary.cu:1-755).
cudnnOpTensor / cudnnActivation calls become plain jnp expressions; XLA fuses
chains of these into single VPU loops, which is the entire point of the
reference's FusedOp machinery (src/ops/fused.cu) — fusion is free here.
Broadcasting follows numpy rules (a superset of the reference's
equal-shape requirement).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec

import numpy as np

_BINARY_FNS = {
    OperatorType.OP_EW_ADD: jnp.add,
    OperatorType.OP_EW_SUB: jnp.subtract,
    OperatorType.OP_EW_MUL: jnp.multiply,
    OperatorType.OP_EW_DIV: jnp.divide,
}

_UNARY_FNS = {
    OperatorType.OP_RELU: jax.nn.relu,
    OperatorType.OP_SIGMOID: jax.nn.sigmoid,
    OperatorType.OP_TANH: jnp.tanh,
    OperatorType.OP_GELU: jax.nn.gelu,
    OperatorType.OP_EXP: jnp.exp,
    OperatorType.OP_IDENTITY: lambda x: x,
}


class ElementBinary(Op):
    def __init__(self, name: str, op_type: OperatorType, x: TensorSpec, y: TensorSpec):
        super().__init__(name, [x, y])
        self.op_type = op_type
        out_shape = np.broadcast_shapes(tuple(x.shape), tuple(y.shape))
        self._out(out_shape, x.dtype)

    def forward(self, params, inputs, ctx):
        x, y = inputs
        return [_BINARY_FNS[self.op_type](x, y)]


class ElementUnary(Op):
    def __init__(
        self,
        name: str,
        op_type: OperatorType,
        x: TensorSpec,
        scalar: float = 0.0,
    ):
        super().__init__(name, [x])
        self.op_type = op_type
        self.scalar = scalar
        self._out(x.shape, x.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        t = self.op_type
        if t is OperatorType.OP_ELU:
            return [jax.nn.elu(x)]
        if t is OperatorType.OP_SCALAR_MULTIPLY:
            return [x * self.scalar]
        if t is OperatorType.OP_SCALAR_ADD:
            return [x + self.scalar]
        if t is OperatorType.OP_SCALAR_SUB:
            return [x - self.scalar]
        if t is OperatorType.OP_SCALAR_TRUE_DIV:
            return [x / self.scalar]
        return [_UNARY_FNS[t](x)]
