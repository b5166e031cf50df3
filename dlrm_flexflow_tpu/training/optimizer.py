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


class Optimizer:
    def init(self, params) -> Any:
        raise NotImplementedError

    def update(self, grads, state, params):
        """returns (new_params, new_state)"""
        raise NotImplementedError


@dataclasses.dataclass
class SGDOptimizer(Optimizer):
    """reference: include/optimizer.h:37-60."""

    lr: float = 0.01
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0

    def init(self, params):
        if self.momentum == 0.0:
            return {"step": jnp.zeros((), jnp.int32)}
        return {
            "step": jnp.zeros((), jnp.int32),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(self, grads, state, params):
        lr = self.lr
        wd = self.weight_decay

        if self.momentum == 0.0:
            new_params = jax.tree_util.tree_map(
                lambda w, g: w - lr * (g + wd * w), params, grads
            )
            return new_params, {"step": state["step"] + 1}

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
        return new_params, {"step": state["step"] + 1, "v": new_v}


@dataclasses.dataclass
class AdamOptimizer(Optimizer):
    """reference: include/optimizer.h:62-85; m/v state per parameter, alpha_t
    bias correction recomputed each step (optimizer.cc)."""

    alpha: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    epsilon: float = 1e-8

    def init(self, params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": jax.tree_util.tree_map(jnp.zeros_like, params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(self, grads, state, params):
        step = state["step"] + 1
        t = step.astype(jnp.float32)
        alpha_t = (
            self.alpha
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
        return new_params, {"step": step, "m": new_m, "v": new_v}
