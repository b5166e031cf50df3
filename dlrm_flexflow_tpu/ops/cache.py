"""Cache op + recompile-on-condition support.

TPU-native analog of the reference Cache op (reference: src/ops/cache.cu —
score function at 19-38, fwd switch cached/input at 237-276,
CACHE_UPDATE_TASK moving average at 306) and RecompileState
(include/recompile.h:27, src/recompile/recompile_state.cc:31-38; used by MoE
to freeze expert assignments, examples/cpp/mixture_of_experts/moe.cc:75-130).

On TPU the "switch to cached tensor" is a STATIC branch: flipping
`use_cached` invalidates the compiled step and the next train_batch
re-traces — exactly the reference's recompile-on-condition semantics
(model.cc:1424-1428), with XLA recompilation playing Legion's re-partition.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..ffconst import OperatorType
from ..core.graph import Op
from ..core.tensor import TensorSpec


class Cache(Op):
    op_type = OperatorType.OP_CACHE

    def __init__(
        self,
        name: str,
        input: TensorSpec,
        num_batches: int,
        score_func: Optional[Callable] = None,
    ):
        super().__init__(name, [input])
        self.num_batches = num_batches
        self.score_func = score_func or default_cache_score
        self._out(input.shape, input.dtype)
        # host-side state (reference: cached batches in zero-copy memory)
        self.cached_value: Optional[np.ndarray] = None
        self.score: float = 0.0
        self.batch_ctr: int = 0
        self.use_cached: bool = False  # static; flip + recompile to enable

    def forward(self, params, inputs, ctx):
        (x,) = inputs
        if self.use_cached and self.cached_value is not None:
            return [jnp.asarray(self.cached_value, x.dtype)]
        return [x]

    def update_cache(self, batch_value: np.ndarray) -> float:
        """Host-side CACHE_UPDATE_TASK: stash the batch, fold the moving
        average score comparing new vs cached (reference: cache.cu:306+)."""
        batch_value = np.asarray(batch_value)
        if self.cached_value is None:
            self.cached_value = batch_value.copy()
            self.score = 0.0
        else:
            s = float(self.score_func(self.cached_value, batch_value))
            self.batch_ctr += 1
            self.score = self.score + (s - self.score) / self.batch_ctr
            self.cached_value = batch_value.copy()
        return self.score


def default_cache_score(cached: np.ndarray, current: np.ndarray) -> float:
    """Fraction of entries unchanged (reference MoE: fraction of identical
    expert assignments, moe.cc score function)."""
    if cached.shape != current.shape:
        return 0.0
    return float(np.mean(cached == current))


class RecompileState:
    """reference: include/recompile.h:27 — user trigger_func + alter_func;
    FFModel.recompile_on_condition calls trigger each iteration and applies
    alter once, then rebuilds the compiled step."""

    def __init__(self, trigger_func: Callable[["RecompileState"], bool], alter_func: Callable, model=None):
        self.trigger_func = trigger_func
        self.alter_func = alter_func
        self.model = model
        self.recompilations = 0

    def trigger(self) -> bool:
        return bool(self.trigger_func(self))

    def alter(self) -> None:
        self.alter_func(self)
        self.recompilations += 1
