"""Conv2D / Pool2D / BatchNorm ops (NCHW, reference layout).

TPU-native analogs of the reference CNN ops:
- Conv2D (reference: src/ops/conv_2d.cu:1-1059, cudnnConvolutionForward at
  390, fused relu) -> lax.conv_general_dilated; XLA maps it onto the MXU and
  fuses bias+activation.
- Pool2D (reference: src/ops/pool_2d.cu:214-230, cudnnPooling) ->
  lax.reduce_window.
- BatchNorm (reference: src/ops/batch_norm.cu:311,428, cuDNN BN training
  fwd/bwd) -> explicit batch statistics; like the reference this is the
  training-mode computation (the reference framework only trains).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ffconst import ActiMode, OperatorType, PoolType, as_acti_mode
from .common import apply_activation
from ..core.graph import Op
from ..core.initializers import DefaultBiasInit, DefaultWeightInit
from ..core.tensor import TensorSpec


class Conv2D(Op):
    op_type = OperatorType.OP_CONV2D

    def __init__(
        self,
        name: str,
        input: TensorSpec,  # [N, C, H, W]
        out_channels: int,
        kernel_h: int,
        kernel_w: int,
        stride_h: int = 1,
        stride_w: int = 1,
        padding_h: int = 0,
        padding_w: int = 0,
        activation=ActiMode.AC_MODE_NONE,
        groups: int = 1,
        use_bias: bool = True,
        kernel_initializer=None,
        bias_initializer=None,
    ):
        super().__init__(name, [input])
        assert input.num_dims == 4, "conv2d expects NCHW"
        n, c, h, w = input.shape
        self.out_channels = out_channels
        self.kernel = (kernel_h, kernel_w)
        self.stride = (stride_h, stride_w)
        self.padding = (padding_h, padding_w)
        self.groups = groups
        self.activation = as_acti_mode(activation)
        self.use_bias = use_bias
        out_h = (h + 2 * padding_h - kernel_h) // stride_h + 1
        out_w = (w + 2 * padding_w - kernel_w) // stride_w + 1
        self._out((n, out_channels, out_h, out_w), input.dtype)
        self._param(
            "kernel",
            (out_channels, c // groups, kernel_h, kernel_w),
            kernel_initializer or DefaultWeightInit(),
        )
        if use_bias:
            self._param("bias", (out_channels,), bias_initializer or DefaultBiasInit())

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        cdt = ctx.compute_dtype
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            params["kernel"].astype(cdt),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
        ).astype(jnp.float32)
        if self.use_bias:
            y = y + params["bias"][None, :, None, None]
        y = apply_activation(y, self.activation)
        return [y.astype(x.dtype)]

    def cost_stats(self):
        n, co, oh, ow = self.outputs[0].shape
        ci = self.inputs[0].shape[1] // self.groups
        kh, kw = self.kernel
        flops = 2.0 * n * co * oh * ow * ci * kh * kw
        return {
            "flops": flops,
            "bytes": 4.0 * (self.inputs[0].volume + self.outputs[0].volume),
            "param_bytes": 4.0 * (co * ci * kh * kw + co),
        }


class Pool2D(Op):
    op_type = OperatorType.OP_POOL2D

    def __init__(
        self,
        name: str,
        input: TensorSpec,
        kernel_h: int,
        kernel_w: int,
        stride_h: int = 1,
        stride_w: int = 1,
        padding_h: int = 0,
        padding_w: int = 0,
        pool_type: PoolType = PoolType.POOL_MAX,
        activation=ActiMode.AC_MODE_NONE,
    ):
        super().__init__(name, [input])
        n, c, h, w = input.shape
        self.kernel = (kernel_h, kernel_w)
        self.stride = (stride_h, stride_w)
        self.padding = (padding_h, padding_w)
        self.pool_type = pool_type
        self.activation = as_acti_mode(activation)
        out_h = (h + 2 * padding_h - kernel_h) // stride_h + 1
        out_w = (w + 2 * padding_w - kernel_w) // stride_w + 1
        self._out((n, c, out_h, out_w), input.dtype)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        pads = [(0, 0), (0, 0), (self.padding[0],) * 2, (self.padding[1],) * 2]
        window = (1, 1) + self.kernel
        strides = (1, 1) + self.stride
        if self.pool_type is PoolType.POOL_MAX:
            init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
            y = jax.lax.reduce_window(x, init, jax.lax.max, window, strides, pads)
        else:
            s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
            y = s / float(self.kernel[0] * self.kernel[1])
        y = apply_activation(y, self.activation)
        return [y.astype(x.dtype)]


class BatchNorm(Op):
    op_type = OperatorType.OP_BATCHNORM

    def __init__(self, name: str, input: TensorSpec, relu: bool = True, eps: float = 1e-5):
        super().__init__(name, [input])
        assert input.num_dims == 4
        c = input.shape[1]
        self.relu = relu
        self.eps = eps
        self._out(input.shape, input.dtype)
        from ..core.initializers import ConstantInitializer

        self._param("scale", (c,), ConstantInitializer(1.0))
        self._param("bias", (c,), ConstantInitializer(0.0))

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 2, 3), keepdims=True)
        var = jnp.var(x32, axis=(0, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * params["scale"][None, :, None, None] + params["bias"][None, :, None, None]
        if self.relu:
            y = jax.nn.relu(y)
        return [y.astype(x.dtype)]
