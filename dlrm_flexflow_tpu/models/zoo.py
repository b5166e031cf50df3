"""Model zoo: the reference's example-model capability surface.

Builders mirroring the reference examples (reference: examples/python/native
mnist_mlp.py / mnist_cnn.py / cifar10_cnn.py / alexnet.py,
examples/cpp/mixture_of_experts/moe.cc, examples/cpp/Transformer/
transformer.cc). Each returns an uncompiled FFModel; callers pick
optimizer/loss/metrics.
"""
from __future__ import annotations

from typing import Optional

from ..config import FFConfig
from ..core.ffmodel import FFModel
from ..ffconst import ActiMode, DataType, PoolType


def mnist_mlp(batch_size: int = 64, config: Optional[FFConfig] = None) -> FFModel:
    """reference: examples/python/native/mnist_mlp.py — 784-512-512-10."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, 784], name="image")
    t = model.dense(x, 512, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 512, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 10)
    model.softmax(t)
    return model


def mnist_cnn(batch_size: int = 64, config: Optional[FFConfig] = None) -> FFModel:
    """reference: examples/python/native/mnist_cnn.py — 2xconv32, pool,
    2xconv64, pool, dense 128, dense 10."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, 1, 28, 28], name="image")
    t = model.conv2d(x, 32, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 32, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 2, 2, 2, 2)
    t = model.conv2d(t, 64, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 64, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 2, 2, 2, 2)
    t = model.flat(t)
    t = model.dense(t, 128, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 10)
    model.softmax(t)
    return model


def cifar10_cnn(batch_size: int = 64, config: Optional[FFConfig] = None) -> FFModel:
    """reference: examples/python/native/cifar10_cnn.py."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, 3, 32, 32], name="image")
    t = model.conv2d(x, 32, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 32, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 2, 2, 2, 2)
    t = model.conv2d(t, 64, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 64, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 2, 2, 2, 2)
    t = model.flat(t)
    t = model.dense(t, 512, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 10)
    model.softmax(t)
    return model


def alexnet(batch_size: int = 64, config: Optional[FFConfig] = None) -> FFModel:
    """reference: examples/cpp/AlexNet/alexnet.cc (229x229 input variant)."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, 3, 229, 229], name="image")
    t = model.conv2d(x, 64, 11, 11, 4, 4, 2, 2, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 3, 3, 2, 2)
    t = model.conv2d(t, 192, 5, 5, 1, 1, 2, 2, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 3, 3, 2, 2)
    t = model.conv2d(t, 384, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 256, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.conv2d(t, 256, 3, 3, 1, 1, 1, 1, activation=ActiMode.AC_MODE_RELU)
    t = model.pool2d(t, 3, 3, 2, 2)
    t = model.flat(t)
    t = model.dense(t, 4096, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 4096, activation=ActiMode.AC_MODE_RELU)
    t = model.dense(t, 10)
    model.softmax(t)
    return model


def moe_mlp(
    batch_size: int = 64,
    num_experts: int = 4,
    k: int = 2,
    alpha: float = 2.0,
    lambda_bal: float = 0.0,
    in_dim: int = 784,
    num_classes: int = 10,
    config: Optional[FFConfig] = None,
) -> FFModel:
    """reference: examples/cpp/mixture_of_experts/moe.cc:101+ — gate
    (dense+softmax+topk), group_by, per-expert MLPs, aggregate."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, in_dim], name="input")
    # gate
    gate = model.dense(x, 64, activation=ActiMode.AC_MODE_RELU, name="gate_h")
    gate = model.dense(gate, num_experts, name="gate_out")
    gate = model.softmax(gate, name="gate_probs")
    topk_vals, topk_idx = model.top_k(gate, k)
    # dispatch
    buckets = model.group_by(x, topk_idx, num_experts, alpha)
    # experts
    exp_preds = []
    for e in range(num_experts):
        t = model.dense(buckets[e], 64, activation=ActiMode.AC_MODE_RELU, name=f"expert{e}_h")
        t = model.dense(t, num_classes, name=f"expert{e}_out")
        t = model.softmax(t, name=f"expert{e}_probs")
        exp_preds.append(t)
    # combine (reference aggregate signature: preds, assign, true assign,
    # full gate grads, then expert outputs)
    out = model.aggregate(
        [topk_vals, topk_idx, topk_idx, gate] + exp_preds, num_experts, lambda_bal
    )
    return model


def transformer(
    batch_size: int = 8,
    seq_len: int = 64,
    hidden: int = 128,
    num_heads: int = 8,
    num_layers: int = 2,
    config: Optional[FFConfig] = None,
) -> FFModel:
    """reference: examples/cpp/Transformer/transformer.cc — stacked
    self-attention + 2-layer FFN blocks with residual adds."""
    model = FFModel(config or FFConfig(batch_size=batch_size))
    x = model.create_tensor([batch_size, seq_len, hidden], name="tokens")
    t = x
    for i in range(num_layers):
        a = model.multihead_attention(
            t, t, t, hidden, num_heads, name=f"attn_{i}"
        )
        t = model.add(a, t, name=f"res_attn_{i}")
        f = model.dense(t, hidden * 4, activation=ActiMode.AC_MODE_RELU, name=f"ffn1_{i}")
        f = model.dense(f, hidden, name=f"ffn2_{i}")
        t = model.add(f, t, name=f"res_ffn_{i}")
    return model
