"""Logical tensor handles for the graph-builder API.

TPU-native analog of the reference's `Tensor`/`Parameter` (reference:
include/tensor.h:27-73). There are no Legion regions here: a TensorSpec is
pure metadata (shape/dtype/producer); actual storage is jax.Arrays living in
the compiled program's parameter/activation pytrees. Shapes are numpy C-order
with batch first (the reference stores dims Fortran-reversed internally,
src/runtime/model.cc:1742 — an implementation detail we do not copy).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..ffconst import DataType


@dataclasses.dataclass(eq=False)
class TensorSpec:
    shape: Tuple[int, ...]
    dtype: DataType = DataType.DT_FLOAT
    name: str = ""
    guid: int = -1
    owner_op: Optional[object] = None  # Op producing this tensor
    owner_idx: int = 0  # which output of the owner

    @property
    def num_dims(self) -> int:
        return len(self.shape)

    @property
    def volume(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def adim(self, i: int) -> int:
        """Reference-style accessor: adim(0) is the innermost dim."""
        return self.shape[len(self.shape) - 1 - i]

    def with_batch(self, batch_size: int) -> Tuple[int, ...]:
        return (batch_size,) + tuple(self.shape[1:])

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TensorSpec({self.name or self.guid}, {self.shape}, {self.dtype.value})"


@dataclasses.dataclass(eq=False)
class ParameterSpec:
    """A trainable weight owned by an op (reference: include/tensor.h:65-73).

    `key` is the op-local name inside the params pytree
    (params[op.name][key]). `initializer` is a core.initializers.Initializer.
    """

    key: str
    shape: Tuple[int, ...]
    dtype: DataType = DataType.DT_FLOAT
    initializer: Optional[object] = None
    owner_op: Optional[object] = None
    # Gradient sync flavor; on TPU this is informational (XLA psum does the
    # work) but the cost model distinguishes PS/allreduce like the reference.
    sync_type: str = "allreduce"

    @property
    def volume(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1
