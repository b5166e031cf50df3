"""Shape-manipulation ops: concat/split/flat/reshape/transpose/reverse.

TPU-native analog of the reference's copy-kernel ops (reference:
src/ops/concat.cu:211, split.cu:154, flat.cu:117, reshape.cu:203,
transpose.cu:216, reverse.cu:140). All of these were hand-written CUDA copy
kernels; on TPU they are pure layout ops that XLA folds into neighboring
fusions — usually zero-cost. Concat is semantically load-bearing for DLRM:
under a sharded plan it is where the pooled-embedding all-to-all
materializes (reference analog: Legion region copies at the
embedding→concat boundary, SURVEY §2.6).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


class Concat(Op):
    op_type = OperatorType.OP_CONCAT

    def __init__(self, name: str, inputs: Sequence[TensorSpec], axis: int):
        super().__init__(name, inputs)
        self.axis = axis if axis >= 0 else axis + inputs[0].num_dims
        shape = list(inputs[0].shape)
        shape[self.axis] = sum(t.shape[self.axis] for t in inputs)
        self._out(tuple(shape), inputs[0].dtype)

    def forward(self, params, inputs, ctx):
        return [jnp.concatenate(inputs, axis=self.axis)]


class Split(Op):
    op_type = OperatorType.OP_SPLIT

    def __init__(self, name: str, input: TensorSpec, sizes: Sequence[int], axis: int):
        super().__init__(name, [input])
        self.axis = axis if axis >= 0 else axis + input.num_dims
        self.sizes = [int(s) for s in sizes]
        assert sum(self.sizes) == input.shape[self.axis]
        for i, s in enumerate(self.sizes):
            shape = list(input.shape)
            shape[self.axis] = s
            self._out(tuple(shape), input.dtype, idx=i)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        offsets = np.cumsum(self.sizes)[:-1].tolist()
        return list(jnp.split(x, offsets, axis=self.axis))


class Flat(Op):
    """Collapse all non-batch dims (reference: src/ops/flat.cu)."""

    op_type = OperatorType.OP_FLAT

    def __init__(self, name: str, input: TensorSpec):
        super().__init__(name, [input])
        rest = 1
        for d in input.shape[1:]:
            rest *= d
        self._out((input.shape[0], rest), input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        return [jnp.reshape(x, self.outputs[0].shape)]


class Reshape(Op):
    op_type = OperatorType.OP_RESHAPE

    def __init__(self, name: str, input: TensorSpec, shape: Sequence[int]):
        super().__init__(name, [input])
        shape = tuple(int(d) for d in shape)
        assert int(np.prod(shape)) == input.volume, (shape, input.shape)
        self._out(shape, input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        return [jnp.reshape(x, self.outputs[0].shape)]


class Transpose(Op):
    op_type = OperatorType.OP_TRANSPOSE

    def __init__(self, name: str, input: TensorSpec, perm: Sequence[int]):
        super().__init__(name, [input])
        self.perm = tuple(int(p) for p in perm)
        assert sorted(self.perm) == list(range(input.num_dims))
        self._out(tuple(input.shape[p] for p in self.perm), input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        return [jnp.transpose(x, self.perm)]


class Reverse(Op):
    op_type = OperatorType.OP_REVERSE

    def __init__(self, name: str, input: TensorSpec, axis: int):
        super().__init__(name, [input])
        self.axis = axis if axis >= 0 else axis + input.num_dims
        self._out(input.shape, input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        return [jnp.flip(x, axis=self.axis)]
