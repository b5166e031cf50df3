"""Mixture-of-Experts ops: TopK, GroupBy, Aggregate, AggregateSpec.

TPU-native analogs of the reference MoE operator set:
- TopK (reference: src/ops/topk.cu:464-630 per-row heap kernels + scatter
  bwd) -> jax.lax.top_k; gradient flows to selected entries via autodiff.
- Group_by (reference: src/ops/group_by.cu:184-264 — CUDA kernels build
  per-expert row lists with capacity alpha*k/n*B) -> dense dispatch masks
  (Mesh-TensorFlow style einsum dispatch), the XLA-idiomatic formulation:
  no data-dependent shapes, rows over capacity dropped exactly like the
  reference.
- Aggregate / AggregateSpec (reference: src/ops/aggregate.cu:185-350,
  aggregate_spec.cu) -> combine einsum. The reference hand-codes a
  load-balancing gradient (lambda_bal) into its backward; here that term is
  the gradient of an explicit auxiliary loss (moe_load_balance_loss), the
  standard functional formulation.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ffconst import DataType, OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


def moe_capacity(k: int, n: int, batch: int, alpha: float) -> int:
    """reference: group_by.cu:64-67 — capacity factor alpha*k/n*batch."""
    return max(1, int(alpha * k / n * batch))


def dispatch_mask(assign, n: int, capacity: int):
    """assign [B, K] int -> bool mask [B, K, n, capacity]: token (b,j) goes
    to slot pos in expert e if it was assigned and fit under capacity.
    Position = arrival order over the flattened (b, j) sequence, matching
    the reference's atomic expert counters."""
    b, k = assign.shape
    onehot = jax.nn.one_hot(assign.reshape(b * k), n, dtype=jnp.int32)  # [BK, n]
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # arrival rank within expert
    keep = (pos >= 0) & (pos < capacity)
    pos = jnp.clip(pos, 0, capacity - 1)
    slot = jax.nn.one_hot(pos * onehot, capacity, dtype=jnp.int32)  # [BK, n, cap]
    mask = slot * onehot[:, :, None] * keep[:, :, None].astype(jnp.int32)
    return mask.reshape(b, k, n, capacity)


class TopK(Op):
    op_type = OperatorType.OP_TOPK

    def __init__(self, name: str, input: TensorSpec, k: int, sorted: bool = True):
        super().__init__(name, [input])
        self.k = k
        self.sorted = sorted
        b = input.shape[0]
        self._out((b, k), input.dtype, idx=0)
        self._out((b, k), DataType.DT_INT32, idx=1)

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        values, indices = jax.lax.top_k(x, self.k)
        return [values, indices.astype(jnp.int32)]


class GroupBy(Op):
    op_type = OperatorType.OP_GROUP_BY

    def __init__(
        self,
        name: str,
        data: TensorSpec,  # [B, D]
        assign: TensorSpec,  # [B, K] int expert ids
        n: int,
        alpha: float,
    ):
        super().__init__(name, [data, assign])
        b, d = data.shape
        k = assign.shape[1]
        self.n = n
        self.alpha = alpha
        self.capacity = moe_capacity(k, n, b, alpha)
        for e in range(n):
            self._out((self.capacity, d), data.dtype, idx=e)

    def forward(self, params, inputs, ctx):
        data, assign = inputs
        mask = dispatch_mask(assign.astype(jnp.int32), self.n, self.capacity)
        # [B,K,n,c] x [B,D] -> [n, c, D]
        grouped = jnp.einsum(
            "bknc,bd->ncd", mask.astype(data.dtype), data,
            preferred_element_type=jnp.float32,
        ).astype(data.dtype)
        return [grouped[e] for e in range(self.n)]


class Aggregate(Op):
    """inputs: gate_preds [B,K], gate_assign [B,K], true_gate_assign [B,K],
    full_gate_gradients [B,n], exp_preds n x [cap, D] (reference signature,
    include/model.h:384; the two grad-plumbing tensors exist for the
    reference's hand-written backward and are accepted-but-unused here —
    load balancing is an explicit aux loss instead, see
    moe_load_balance_loss)."""

    op_type = OperatorType.OP_AGGREGATE

    def __init__(self, name: str, inputs: Sequence[TensorSpec], n: int, lambda_bal: float = 0.0):
        super().__init__(name, inputs)
        self.n = n
        self.lambda_bal = lambda_bal
        gate_preds = inputs[0]
        exp0 = inputs[4]
        b, k = gate_preds.shape
        cap, d = exp0.shape
        self.capacity = cap
        self._out((b, d), exp0.dtype)

    def forward(self, params, inputs, ctx):
        gate_preds, gate_assign = inputs[0], inputs[1]
        exp_preds = jnp.stack(inputs[4 : 4 + self.n], axis=0)  # [n, cap, D]
        mask = dispatch_mask(gate_assign.astype(jnp.int32), self.n, self.capacity)
        combine = mask.astype(gate_preds.dtype) * gate_preds[:, :, None, None]
        out = jnp.einsum(
            "bknc,ncd->bd", combine, exp_preds, preferred_element_type=jnp.float32
        )
        return [out.astype(exp_preds.dtype)]


class AggregateSpec(Aggregate):
    """reference: src/ops/aggregate_spec.cu — variant used with replicated
    labels (Loss.repl_labels, model.cc:1589). Combination math matches
    Aggregate; the label-replication contract lives in the loss wiring."""

    op_type = OperatorType.OP_AGG_SPEC


def moe_load_balance_loss(gate_probs, assign, n: int):
    """Switch-style load-balancing auxiliary loss: n * sum_e f_e * P_e where
    f_e = fraction of tokens routed to e, P_e = mean gate prob for e.
    Functional replacement for the reference's lambda_bal backward term
    (aggregate.cu:185-350)."""
    b = gate_probs.shape[0]
    frac = jnp.mean(
        jax.nn.one_hot(assign[:, 0].astype(jnp.int32), n, dtype=jnp.float32), axis=0
    )
    mean_prob = jnp.mean(gate_probs, axis=0)
    return n * jnp.sum(frac * mean_prob)
