"""SGD / Adam optimizers.

TPU-native analog of the reference optimizers (reference:
include/optimizer.h:37-85, src/runtime/optimizer.cc:1-358,
src/runtime/optimizer_kernel.cu: PS kernels 44-113, NCCL kernels 115-183 /
295-350). The PS-vs-NCCL split disappears: gradients of sharded/replicated
params are reduced by XLA (psum over the mesh) as part of jax.grad under
pjit, so update kernels are pure elementwise math. Semantics match the
reference kernels:
  SGD:  V = mu*V + (1-?)... reference: V = lr*(grad + wd*W) folded with
        momentum + optional nesterov (optimizer_kernel.cu:62-97)
  Adam: bias-corrected alpha_t precomputed on host per step
        (optimizer.cc next_epoch semantics), update with eps inside sqrt add.
Implemented optax-style (init/update pytree transforms) but self-contained.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


def _dedup_row_grads(rows, g32, num_rows: int):
    """Static-shape dedup for lazy sparse updates: (uniq [K] with
    out-of-range fill for empty/dropped slots, per-unique-row summed grads
    G [K, D], summed SQUARES Sq [K, D]). Unique slots never collide, so
    the callers' state writes are conflict-free scatter-sets and every
    temporary is O(K*D) — never the dense [V, D] table shape."""
    rows = jnp.where(rows < 0, num_rows, rows)  # negatives drop like OOB
    uniq, inv = jnp.unique(
        rows, size=rows.shape[0], fill_value=num_rows, return_inverse=True
    )
    k = rows.shape[0]
    G = jax.ops.segment_sum(g32, inv, num_segments=k)
    Sq = jax.ops.segment_sum(jnp.square(g32), inv, num_segments=k)
    return uniq, G, Sq


class Optimizer:
    # Sparse-row support: embedding tables get their gradients applied as
    # scatter updates over only the touched rows, never materializing a
    # dense [vocab, dim] gradient (the TPU analog of the reference's
    # atomicAdd scatter + in-place SGD on the table region). Optimizers
    # that can express their update row-locally set supports_sparse=True.
    supports_sparse: bool = False

    def init(self, params) -> Any:
        raise NotImplementedError

    def update(self, grads, state, params):
        """returns (new_params, new_state)"""
        raise NotImplementedError

    def sparse_init(self, pool_shape, dtype=jnp.float32):
        """Per-embedding-pool slot state for the sparse path (None if none)."""
        return None

    def sparse_row_update(self, table, state, rows, row_grads, lr=None):
        """Apply row-wise update: `rows` [K] int32 (out-of-range = dropped),
        `row_grads` [K, D]. `lr` overrides the static learning rate (used by
        set_learning_rate / LR schedules). Returns (new_table, new_state)."""
        raise NotImplementedError


@dataclasses.dataclass
class SGDOptimizer(Optimizer):
    """reference: include/optimizer.h:37-60."""

    lr: float = 0.01
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0

    supports_sparse = True

    def sparse_init(self, pool_shape, dtype=jnp.float32):
        # momentum keeps a per-element velocity pool, updated LAZILY (only
        # touched rows decay — the sparse-momentum convention; the reference
        # keeps dense V regions and decays everything, optimizer_kernel.cu:62)
        if self.momentum != 0.0:
            return jnp.zeros(pool_shape, jnp.float32)
        return None

    def sparse_row_update(self, table, state, rows, row_grads, lr=None):
        lr = self.lr if lr is None else lr
        if self.weight_decay != 0.0:
            # lazy decoupled decay on touched rows only (duplicates decay
            # once per occurrence; matches common sparse-SGD practice)
            decay = jnp.take(table, jnp.minimum(rows, table.shape[0] - 1), axis=0)
            row_grads = row_grads + self.weight_decay * decay
        if self.momentum == 0.0:
            new_table = table.at[rows].add(
                (-lr * row_grads).astype(table.dtype), mode="drop"
            )
            return new_table, state
        # lazy momentum: v[r] = mu*v[r] + G_r (G_r = summed duplicate grads,
        # decay applied once per touched occurrence), w[r] -= lr * step_r.
        # O(K*D): dedup to static-size unique rows + segment sums + row
        # scatters — NOT dense [V, D] temporaries (a 1Mx128 pool would move
        # ~GBs per step to touch a few thousand rows).
        g32 = row_grads.astype(jnp.float32)
        uniq, G, _ = _dedup_row_grads(rows, g32, table.shape[0])
        v_rows = jnp.take(state, jnp.minimum(uniq, state.shape[0] - 1), axis=0)
        v2_rows = self.momentum * v_rows + G
        step = G + self.momentum * v2_rows if self.nesterov else v2_rows
        new_state = state.at[uniq].set(v2_rows, mode="drop")
        new_table = table.at[uniq].add(
            (-lr * step).astype(table.dtype), mode="drop"
        )
        return new_table, new_state

    def init(self, params):
        base = {"step": jnp.zeros((), jnp.int32), "lr": jnp.float32(self.lr)}
        if self.momentum != 0.0:
            base["v"] = jax.tree_util.tree_map(jnp.zeros_like, params)
        return base

    def update(self, grads, state, params):
        lr = state.get("lr", self.lr)
        wd = self.weight_decay

        if self.momentum == 0.0:
            new_params = jax.tree_util.tree_map(
                lambda w, g: w - lr * (g + wd * w), params, grads
            )
            return new_params, {**state, "step": state["step"] + 1}

        def upd(w, g, v):
            g = g + wd * w
            v = self.momentum * v + g
            if self.nesterov:
                g = g + self.momentum * v
            else:
                g = v
            return w - lr * g, v

        flat = jax.tree_util.tree_map(upd, params, grads, state["v"])
        new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return new_params, {**state, "step": state["step"] + 1, "v": new_v}


@dataclasses.dataclass
class AdamOptimizer(Optimizer):
    """reference: include/optimizer.h:62-85; m/v state per parameter, alpha_t
    bias correction recomputed each step (optimizer.cc)."""

    alpha: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    epsilon: float = 1e-8

    # Sparse (lazy) Adam for embedding tables: only rows touched by the
    # batch update their m/v/w — the sparse-Adam convention (the reference
    # instead keeps dense m/v replica regions and updates every row each
    # step, src/runtime/optimizer_kernel.cu:295-350; lazy is the standard
    # DLRM treatment and what the packed kernel path implements).
    # Duplicate-row semantics: per touched row, m gets the SUMMED duplicate
    # gradient, v the summed SQUARES of each occurrence, decay once.
    supports_sparse = True

    def sparse_init(self, pool_shape, dtype=jnp.float32):
        # m and v stacked on a new leading axis: [2, *pool_shape]
        return jnp.zeros((2,) + tuple(pool_shape), jnp.float32)

    def sparse_row_update(self, table, state, rows, row_grads, lr=None):
        """`lr` must be the bias-corrected alpha_t (the engine computes it
        from the shared step counter); falls back to raw alpha."""
        alpha_t = self.alpha if lr is None else lr
        g32 = row_grads.astype(jnp.float32)
        if self.weight_decay != 0.0:
            decay = jnp.take(table, jnp.minimum(rows, table.shape[0] - 1), axis=0)
            g32 = g32 + self.weight_decay * decay.astype(jnp.float32)
        # O(K*D) lazy update on the touched rows only (see the momentum
        # path): dense [V, D] G/Sq/where temporaries made this O(V*D)
        m, v = state[0], state[1]
        uniq, G, Sq = _dedup_row_grads(rows, g32, table.shape[0])
        safe = jnp.minimum(uniq, table.shape[0] - 1)
        m_rows = jnp.take(m, safe, axis=0)
        v_rows = jnp.take(v, safe, axis=0)
        m2_rows = self.beta1 * m_rows + (1.0 - self.beta1) * G
        v2_rows = self.beta2 * v_rows + (1.0 - self.beta2) * Sq
        upd = alpha_t * m2_rows / (jnp.sqrt(v2_rows) + self.epsilon)
        new_m = m.at[uniq].set(m2_rows, mode="drop")
        new_v = v.at[uniq].set(v2_rows, mode="drop")
        new_table = table.at[uniq].add(-upd.astype(table.dtype), mode="drop")
        return new_table, jnp.stack([new_m, new_v])

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "lr": jnp.float32(self.alpha),
            "m": jax.tree_util.tree_map(jnp.zeros_like, params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(self, grads, state, params):
        step = state["step"] + 1
        t = step.astype(jnp.float32)
        alpha_t = (
            state.get("lr", self.alpha)
            * jnp.sqrt(1.0 - jnp.power(self.beta2, t))
            / (1.0 - jnp.power(self.beta1, t))
        )

        def upd(w, g, m, v):
            g = g + self.weight_decay * w
            m = self.beta1 * m + (1.0 - self.beta1) * g
            v = self.beta2 * v + (1.0 - self.beta2) * g * g
            w = w - alpha_t * m / (jnp.sqrt(v) + self.epsilon)
            return w, m, v

        flat = jax.tree_util.tree_map(upd, params, grads, state["m"], state["v"])
        is_triple = lambda x: isinstance(x, tuple)
        new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is_triple)
        new_m = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is_triple)
        new_v = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=is_triple)
        return new_params, {**state, "step": step, "m": new_m, "v": new_v}


@dataclasses.dataclass
class RowWiseAdagradOptimizer(Optimizer):
    """Row-wise AdaGrad — the industry-standard DLRM embedding optimizer
    (one accumulator scalar per table row; not in the reference, which only
    has SGD/Adam). Dense parameters get ordinary AdaGrad semantics with a
    per-row (first-dim) accumulator.
    """

    lr: float = 0.01
    epsilon: float = 1e-10
    initial_accumulator: float = 0.0

    supports_sparse = True

    def init(self, params):
        def acc_like(w):
            return jnp.full((w.shape[0],) if w.ndim > 0 else (), self.initial_accumulator, jnp.float32)

        return {
            "step": jnp.zeros((), jnp.int32),
            "lr": jnp.float32(self.lr),
            "acc": jax.tree_util.tree_map(acc_like, params),
        }

    def update(self, grads, state, params):
        lr = state.get("lr", self.lr)

        def upd(w, g, a):
            gsq = jnp.mean(
                jnp.square(g.astype(jnp.float32)), axis=tuple(range(1, g.ndim))
            ) if g.ndim > 1 else jnp.square(g.astype(jnp.float32))
            a = a + gsq
            scale = jax.lax.rsqrt(a + self.epsilon)
            shaped = scale.reshape((-1,) + (1,) * (g.ndim - 1)) if g.ndim > 1 else scale
            return w - lr * shaped * g, a

        flat = jax.tree_util.tree_map(upd, params, grads, state["acc"])
        is_pair = lambda x: isinstance(x, tuple)
        new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is_pair)
        new_acc = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is_pair)
        return new_params, {**state, "step": state["step"] + 1, "acc": new_acc}

    def sparse_init(self, pool_shape, dtype=jnp.float32):
        # one accumulator per row: [..., R] matching pool_shape[:-1]
        return jnp.full(pool_shape[:-1], self.initial_accumulator, jnp.float32)

    def sparse_row_update(self, table, acc, rows, row_grads, lr=None):
        lr = self.lr if lr is None else lr
        g32 = row_grads.astype(jnp.float32)
        gsq = jnp.mean(jnp.square(g32), axis=-1)  # [K]
        acc = acc.at[rows].add(gsq, mode="drop")
        a_rows = jnp.take(acc, jnp.minimum(rows, acc.shape[0] - 1), axis=0)
        scaled = (-lr * jax.lax.rsqrt(a_rows + self.epsilon))[:, None] * g32
        table = table.at[rows].add(scaled.astype(table.dtype), mode="drop")
        return table, acc
