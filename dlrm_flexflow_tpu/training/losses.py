"""Loss functions.

TPU-native analog of the reference Loss (reference:
include/loss_functions.h:27-49, src/loss_functions/loss_functions.cu:1-237).
The reference implements loss only as a hand-written *backward* task writing
logit gradients scaled by 1/batch; here each loss is a scalar-valued pure
function and jax.grad produces exactly those gradients (same 1/batch
scale_factor semantics, loss_functions.h:47-49).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import LossType


def compute_loss(loss_type: LossType, logits, labels):
    """Returns scalar mean (or sum) loss. `logits` semantics per type:
    - CCE: post-softmax probabilities [B, C]; labels one-hot/prob [B, C]
    - sparse CCE: post-softmax probabilities [B, C]; labels int [B] or [B,1]
    - MSE: predictions matching labels' shape
    - BCE: post-sigmoid probabilities in (0,1); labels in {0,1}
    """
    logits = logits.astype(jnp.float32)
    eps = 1e-7
    if loss_type is LossType.LOSS_CATEGORICAL_CROSSENTROPY:
        labels = labels.astype(jnp.float32)
        p = jnp.clip(logits, eps, 1.0)
        return -jnp.mean(jnp.sum(labels * jnp.log(p), axis=-1))
    if loss_type is LossType.LOSS_SPARSE_CATEGORICAL_CROSSENTROPY:
        if logits.ndim == 3:
            # per-token sequence CE ([B, T, C] vs [B, T]) — the NMT
            # softmaxDP loss (reference: nmt/softmax_data_parallel.cu)
            logits = logits.reshape(-1, logits.shape[-1])
        idx = labels.reshape(logits.shape[0]).astype(jnp.int32)
        p = jnp.clip(logits, eps, 1.0)
        picked = jnp.take_along_axis(jnp.log(p), idx[:, None], axis=-1)
        return -jnp.mean(picked)
    if loss_type is LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE:
        labels = labels.astype(jnp.float32).reshape(logits.shape)
        return jnp.mean(jnp.sum((logits - labels) ** 2, axis=tuple(range(1, logits.ndim))))
    if loss_type is LossType.LOSS_MEAN_SQUARED_ERROR_SUM_REDUCE:
        labels = labels.astype(jnp.float32).reshape(logits.shape)
        return jnp.sum((logits - labels) ** 2)
    if loss_type is LossType.LOSS_BINARY_CROSSENTROPY:
        labels = labels.astype(jnp.float32).reshape(logits.shape)
        p = jnp.clip(logits, eps, 1.0 - eps)
        return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    raise ValueError(f"unknown loss {loss_type}")
