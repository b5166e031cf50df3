"""Weight initializers.

TPU-native analog of the reference's initializer set (reference:
include/initializer.h, src/runtime/initializer.cc:1-330,
src/runtime/initializer_kernel.cu). Each initializer is a pure function of a
jax PRNG key — no curand state, no per-GPU init tasks.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


class Initializer:
    def __call__(self, key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32):
        raise NotImplementedError


class GlorotUniform(Initializer):
    """Xavier/Glorot uniform (reference: initializer_kernel.cu glorot task).

    Matches the reference's fan computation for 2D linear weights
    ([out, in] -> fan_in=in, fan_out=out) and conv filters.
    """

    def __init__(self, seed: int = 0, scale: float = 1.0):
        self.seed = seed
        self.scale = scale

    def __call__(self, key, shape, dtype=jnp.float32):
        if len(shape) >= 2:
            receptive = 1
            for d in shape[2:]:
                receptive *= d
            fan_in = shape[1] * receptive
            fan_out = shape[0] * receptive
        else:
            fan_in = fan_out = shape[0] if shape else 1
        limit = self.scale * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


class ZeroInitializer(Initializer):
    def __call__(self, key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)


class UniformInitializer(Initializer):
    def __init__(self, seed: int = 0, min_val: float = 0.0, max_val: float = 1.0):
        self.seed = seed
        self.min_val = min_val
        self.max_val = max_val

    def __call__(self, key, shape, dtype=jnp.float32):
        if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
            return jax.random.randint(
                key, shape, int(self.min_val), int(self.max_val) + 1, dtype
            )
        return jax.random.uniform(key, shape, dtype, self.min_val, self.max_val)


class NormInitializer(Initializer):
    def __init__(self, seed: int = 0, mean: float = 0.0, stddev: float = 1.0):
        self.seed = seed
        self.mean = mean
        self.stddev = stddev

    def __call__(self, key, shape, dtype=jnp.float32):
        return self.mean + self.stddev * jax.random.normal(key, shape, dtype)


class ConstantInitializer(Initializer):
    def __init__(self, value: float = 0.0):
        self.value = value

    def __call__(self, key, shape, dtype=jnp.float32):
        return jnp.full(shape, self.value, dtype)


DefaultWeightInit = GlorotUniform
DefaultBiasInit = ZeroInitializer
