"""Shared op helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import ActiMode


def apply_activation(x, mode: ActiMode):
    """Fused activation epilogue (reference: cuDNN activation fused into
    linear/conv kernels, src/ops/linear.cu:425-466). XLA fuses these into the
    producing matmul, so a plain jnp call is the TPU-idiomatic spelling."""
    if mode is ActiMode.AC_MODE_NONE:
        return x
    if mode is ActiMode.AC_MODE_RELU:
        return jax.nn.relu(x)
    if mode is ActiMode.AC_MODE_SIGMOID:
        return jax.nn.sigmoid(x)
    if mode is ActiMode.AC_MODE_TANH:
        return jnp.tanh(x)
    if mode is ActiMode.AC_MODE_GELU:
        return jax.nn.gelu(x)
    raise ValueError(f"unknown activation {mode}")
