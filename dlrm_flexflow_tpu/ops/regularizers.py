"""Softmax and Dropout ops.

Softmax: reference src/ops/softmax.cu:172-186 (cudnnSoftmaxForward) — here a
numerically-stable jax.nn.softmax that XLA lowers to a fused VPU sequence.
Dropout: reference src/ops/dropout.cu:174-186 (cudnnDropout with reserve
space) — here a pure function of the per-step PRNG key; no reserve-space
state because backward re-derives the mask from the same fold-in key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


class Softmax(Op):
    op_type = OperatorType.OP_SOFTMAX

    def __init__(self, name: str, input: TensorSpec, axis: int = -1):
        super().__init__(name, [input])
        self.axis = axis
        self._out(input.shape, input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        return [jax.nn.softmax(x, axis=self.axis)]


class Dropout(Op):
    op_type = OperatorType.OP_DROPOUT

    def __init__(self, name: str, input: TensorSpec, rate: float, seed: int = 0):
        super().__init__(name, [input])
        self.rate = float(rate)
        self.seed = seed
        self._out(input.shape, input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        if not ctx.training or self.rate <= 0.0:
            return [x]
        key = ctx.op_rng(self)
        if key is None:
            key = jax.random.PRNGKey(self.seed)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return [jnp.where(mask, x / keep, jnp.zeros((), x.dtype)).astype(x.dtype)]
