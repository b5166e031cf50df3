"""Expert-parallel MoE execution (EP) via shard_map all-to-all.

The reference expresses expert parallelism as per-op placement: each
expert's sub-network is an ordinary op subtree that the strategy file pins
to its own devices, and Legion materializes the token movement implicitly
(reference: examples/cpp/mixture_of_experts/moe.cc + dlrm_strategy-style
placement; ops group_by/aggregate, src/ops/group_by.cu, aggregate.cu).
TPU-native formulation: experts are sharded over the mesh axis, tokens are
dispatched to static-capacity expert buffers (ops/moe.py dispatch_mask) and
exchanged with one all-to-all each way — the same two-collective pattern as
the embedding collection (parallel/embedding_collection.py).

Autodiff layout: the GATE runs outside the shard_map (its weights are
replicated, so XLA/GSPMD inserts the gradient psum); inside the shard_map
every tensor is either batch-sharded or expert-sharded, making all
transposes local — expert-weight gradients stay shard-local by
construction, exactly like the reference's per-expert weight updates.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ffconst import ActiMode
from ..ops.common import apply_activation
from ..ops.moe import dispatch_mask, moe_capacity


def moe_gate(x, gate_w, k: int):
    """Softmax gate + top-k (reference: moe.cc gate = dense+softmax+topk).
    Returns (gate_vals [B,k] renormalized, assign [B,k] int32)."""
    probs = jax.nn.softmax(
        jnp.dot(x, gate_w, preferred_element_type=jnp.float32), axis=-1
    )
    vals, assign = jax.lax.top_k(probs, k)
    vals = vals / jnp.maximum(jnp.sum(vals, axis=-1, keepdims=True), 1e-9)
    return vals.astype(x.dtype), assign.astype(jnp.int32)


def expert_parallel_ffn(
    x,  # [B, D] batch-sharded over `axis`
    gate_vals,  # [B, k] (from moe_gate; batch-sharded)
    assign,  # [B, k] int32 expert ids (batch-sharded)
    w1,  # [E, D, H] expert-sharded on dim 0
    b1,  # [E, H]
    w2,  # [E, H, D]
    b2,  # [E, D]
    mesh: Mesh,
    alpha: float = 2.0,
    axis: str = "data",
    activation: ActiMode = ActiMode.AC_MODE_RELU,
):
    """Two-layer expert FFNs with EP dispatch. Returns [B, D] combined.

    E must divide by the mesh axis size; capacity = alpha*k/E*B_loc per
    (shard, expert) — tokens over capacity drop, like the reference
    (group_by.cu:64-67).
    """
    e = w1.shape[0]
    n = mesh.shape[axis]
    assert e % n == 0, f"experts {e} must divide mesh axis {n}"
    k = assign.shape[1]

    def local_fn(x_loc, gv_loc, as_loc, w1_loc, b1_loc, w2_loc, b2_loc):
        b_loc = x_loc.shape[0]
        cap = moe_capacity(k, e, b_loc, alpha)
        mask = dispatch_mask(as_loc, e, cap)  # [B_loc, k, E, C]
        md = mask.astype(x_loc.dtype)
        # dispatch: local tokens for every global expert
        disp = jnp.einsum(
            "bkec,bd->ecd", md, x_loc, preferred_element_type=jnp.float32
        ).astype(x_loc.dtype)  # [E, C, D]
        # EP exchange: shard receives its experts' tokens from all shards
        tokens = jax.lax.all_to_all(
            disp, axis, split_axis=0, concat_axis=1, tiled=True
        )  # [E_loc, N*C, D]
        h = jnp.einsum(
            "ecd,edh->ech", tokens.astype(jnp.float32),
            w1_loc.astype(jnp.float32), preferred_element_type=jnp.float32,
        ) + b1_loc[:, None, :]
        h = apply_activation(h, activation)
        y = jnp.einsum(
            "ech,ehd->ecd", h, w2_loc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + b2_loc[:, None, :]
        y = y.astype(x_loc.dtype)
        # return exchange + weighted combine
        back = jax.lax.all_to_all(
            y, axis, split_axis=1, concat_axis=0, tiled=True
        )  # [E, C, D]
        out = jnp.einsum(
            "bkec,ecd,bk->bd", md, back.astype(jnp.float32),
            gv_loc.astype(jnp.float32), preferred_element_type=jnp.float32,
        )
        return out.astype(x_loc.dtype)

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis, None), P(axis, None),
            P(axis, None, None), P(axis, None),
            P(axis, None, None), P(axis, None),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )(x, gate_vals, assign, w1, b1, w2, b2)


def reference_moe_ffn(x, gate_vals, assign, w1, b1, w2, b2, alpha=2.0,
                      activation: ActiMode = ActiMode.AC_MODE_RELU,
                      shards: int = 1):
    """Unsharded oracle with the SAME token-drop semantics as the EP path
    (per-shard capacity over per-shard batch slices) for parity tests."""
    e = w1.shape[0]
    b, k = assign.shape
    b_loc = b // shards
    outs = []
    for s in range(shards):
        sl = slice(s * b_loc, (s + 1) * b_loc)
        cap = moe_capacity(k, e, b_loc, alpha)
        mask = dispatch_mask(assign[sl], e, cap).astype(x.dtype)
        disp = jnp.einsum("bkec,bd->ecd", mask, x[sl])
        h = apply_activation(
            jnp.einsum("ecd,edh->ech", disp.astype(jnp.float32),
                       w1.astype(jnp.float32)) + b1[:, None, :],
            activation,
        )
        y = jnp.einsum("ech,ehd->ecd", h, w2.astype(jnp.float32)) + b2[:, None, :]
        out = jnp.einsum(
            "bkec,ecd,bk->bd", mask.astype(jnp.float32), y,
            gate_vals[sl].astype(jnp.float32),
        )
        outs.append(out.astype(x.dtype))
    return jnp.concatenate(outs, axis=0)
