"""MultiHeadAttention op.

TPU-native analog of the reference MultiHeadAttention (reference:
src/ops/attention.cu:1-755 — cuDNN MultiHeadAttn fwd at 237-310, bwd-data
365, bwd-weights 380; weights stored as one packed parameter, attnDesc at
568). Here attention is expressed as jnp einsums so XLA maps QK^T and PV
onto the MXU and fuses the softmax; backward is autodiff. Weights are kept
as separate q/k/v/out projections (the packed-blob layout was a cuDNN
requirement, not API surface).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.initializers import DefaultWeightInit
from ..core.tensor import TensorSpec


class MultiHeadAttention(Op):
    op_type = OperatorType.OP_MULTIHEAD_ATTENTION

    def __init__(
        self,
        name: str,
        query: TensorSpec,  # [B, Sq, Dq]
        key: TensorSpec,  # [B, Sk, Dk]
        value: TensorSpec,  # [B, Sk, Dv]
        embed_dim: int,
        num_heads: int,
        kdim: int = 0,
        vdim: int = 0,
        dropout: float = 0.0,
        bias: bool = True,
        add_bias_kv: bool = False,
        add_zero_attn: bool = False,
        kernel_initializer=None,
    ):
        super().__init__(name, [query, key, value])
        assert embed_dim % num_heads == 0
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.kdim = kdim or embed_dim
        self.vdim = vdim or embed_dim
        self.dropout = dropout
        b, sq, dq = query.shape
        _, sk, dk = key.shape
        self._out((b, sq, embed_dim))
        init = kernel_initializer or DefaultWeightInit()
        self._param("wq", (embed_dim, dq), init)
        self._param("wk", (embed_dim, dk), init)
        self._param("wv", (embed_dim, value.shape[2]), init)
        self._param("wo", (embed_dim, embed_dim), init)
        if bias:
            from ..core.initializers import ZeroInitializer

            self._param("bq", (embed_dim,), ZeroInitializer())
            self._param("bk", (embed_dim,), ZeroInitializer())
            self._param("bv", (embed_dim,), ZeroInitializer())
            self._param("bo", (embed_dim,), ZeroInitializer())
        self.bias = bias

    def forward(self, params, inputs, ctx):
        q_in, k_in, v_in = inputs
        cdt = ctx.compute_dtype
        h, hd = self.num_heads, self.head_dim

        def proj(x, w, bkey):
            y = jnp.einsum(
                "bsd,ed->bse", x.astype(cdt), params[w].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            if self.bias:
                y = y + params[bkey]
            return y

        q = proj(q_in, "wq", "bq")
        k = proj(k_in, "wk", "bk")
        v = proj(v_in, "wv", "bv")
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, sk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, sk, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(cdt), k.astype(cdt),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        if ctx.training and self.dropout > 0.0 and ctx.rng is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(ctx.op_rng(self), keep, probs.shape)
            probs = jnp.where(mask, probs / keep, 0.0)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(cdt), v.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.embed_dim)
        y = jnp.einsum(
            "bse,fe->bsf", out.astype(cdt), params["wo"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        if self.bias:
            y = y + params["bo"]
        return [y.astype(q_in.dtype)]

    def cost_stats(self):
        b, sq, dq = self.inputs[0].shape
        sk = self.inputs[1].shape[1]
        e = self.embed_dim
        proj = 2.0 * b * (sq * dq * e + sk * self.inputs[1].shape[2] * e + sk * self.inputs[2].shape[2] * e + sq * e * e)
        attn = 2.0 * b * self.num_heads * sq * sk * self.head_dim * 2
        return {
            "flops": proj + attn,
            "bytes": 4.0 * (self.inputs[0].volume + self.outputs[0].volume),
            "param_bytes": 4.0 * sum(p.volume for p in self.params),
        }
