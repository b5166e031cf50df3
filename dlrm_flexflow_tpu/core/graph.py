"""Op base class and graph container.

TPU-native analog of the reference's `Op` hierarchy + FFModel layer list
(reference: include/model.h:205-271, src/runtime/model.cc:253-707). The big
design departure: reference ops carry Legion task launchers and raw CUDA
kernels (init/forward/backward/measure_operator_cost); here an Op is pure
metadata + a pure `forward` tracing function. Backward is jax.grad (no
hand-written backward graphs), device placement is a ShardingPlan applied at
trace time, and "measure_operator_cost" becomes analytic `cost_stats()` used
by the autotuner's cost model (with optional on-device calibration).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ffconst import DataType, OperatorType
from .tensor import ParameterSpec, TensorSpec


@dataclasses.dataclass
class OpContext:
    """Per-trace execution context threaded through every Op.forward.

    Replaces the reference's OpMeta/FFHandler plumbing (include/config.h:75):
    on TPU there are no per-device library handles; the context carries only
    trace-level knobs.
    """

    training: bool = True
    rng: Optional[jax.Array] = None  # per-step PRNG key (dropout etc.)
    compute_dtype: Any = jnp.float32
    seq_length: int = -1  # reference FFIterationConfig.seq_length
    mesh: Optional[Any] = None  # jax.sharding.Mesh when compiled distributed
    plan: Optional[Any] = None  # parallel.plan.ShardingPlan
    profiling: bool = False
    # activations captured for inspection when profiling / debugging
    taps: Optional[Dict[str, jax.Array]] = None
    # op name -> precomputed output list; execute() uses these instead of
    # calling op.forward (the sparse-embedding-grad path recomputes lookups
    # outside the differentiated region and injects them here)
    overrides: Optional[Dict[str, List[jax.Array]]] = None
    # vocab size at or below which embedding ops use the one-hot MXU matmul
    # path instead of gather (0 disables)
    onehot_threshold: int = 0
    # Pallas kernel routing, resolved from FFConfig.use_pallas at compile:
    # "auto" (measured winners only), "on" (force), "off" (pure XLA)
    use_pallas: str = "off"

    def op_rng(self, op: "Op") -> Optional[jax.Array]:
        if self.rng is None:
            return None
        return jax.random.fold_in(self.rng, op.guid)


class Op:
    """A graph node. Subclasses implement shape inference in __init__
    (creating self.outputs) and `forward`.

    Contract (analog of the reference's pure-virtual set, model.h:219-236):
      - outputs/params declared at construction (static shapes only)
      - forward(params, inputs, ctx) -> list of output arrays; must be pure
        and jit-traceable (lax control flow only)
      - cost_stats() -> analytic flops/bytes for the autotuner cost model
        (plays the role of measure_operator_cost, model.h:207)
    """

    op_type: OperatorType = OperatorType.OP_INPUT

    def __init__(self, name: str, inputs: Sequence[TensorSpec]):
        self.name = name
        self.guid = -1  # assigned by Graph.add_op
        self.inputs: List[TensorSpec] = list(inputs)
        self.outputs: List[TensorSpec] = []
        self.params: List[ParameterSpec] = []

    # -- construction helpers -------------------------------------------------
    def _out(
        self,
        shape: Tuple[int, ...],
        dtype: DataType = DataType.DT_FLOAT,
        idx: int = 0,
    ) -> TensorSpec:
        t = TensorSpec(tuple(int(d) for d in shape), dtype, f"{self.name}:{idx}")
        t.owner_op = self
        t.owner_idx = idx
        self.outputs.append(t)
        return t

    def _param(
        self,
        key: str,
        shape: Tuple[int, ...],
        initializer,
        dtype: DataType = DataType.DT_FLOAT,
    ) -> ParameterSpec:
        p = ParameterSpec(key, tuple(int(d) for d in shape), dtype, initializer, self)
        self.params.append(p)
        return p

    # -- execution -------------------------------------------------------------
    def forward(
        self,
        params: Dict[str, jax.Array],
        inputs: List[jax.Array],
        ctx: OpContext,
    ) -> List[jax.Array]:
        raise NotImplementedError

    def init_params(self, key: jax.Array) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        for i, p in enumerate(self.params):
            sub = jax.random.fold_in(key, i)
            out[p.key] = p.initializer(sub, p.shape, p.dtype.to_jnp())
        return out

    # -- autotuner hooks ---------------------------------------------------------
    def cost_stats(self) -> Dict[str, float]:
        """Analytic per-sample-batch cost: fwd flops, bytes moved, param bytes.

        Default: pure elementwise pass over outputs. Subclasses with matmuls
        override. Used by autotune.costmodel (reference analog:
        Op::measure_operator_cost per op, e.g. src/ops/linear.cu:960+).
        """
        out_elems = sum(t.volume for t in self.outputs)
        in_elems = sum(t.volume for t in self.inputs)
        return {
            "flops": float(out_elems),
            "bytes": 4.0 * float(in_elems + out_elems),
            "param_bytes": 4.0 * sum(p.volume for p in self.params),
        }

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{type(self).__name__}({self.name})"


class InputOp(Op):
    """Graph source node (reference: FFModel::create_tensor, model.cc:831)."""

    op_type = OperatorType.OP_INPUT

    def __init__(self, name: str, shape: Tuple[int, ...], dtype: DataType):
        super().__init__(name, [])
        self._out(shape, dtype)

    def forward(self, params, inputs, ctx):  # pragma: no cover - never invoked
        raise RuntimeError("InputOp is fed externally")


class Graph:
    """Ordered op list; creation order is topological (builder API property,
    same as the reference's FFModel::layers vector)."""

    def __init__(self) -> None:
        self.ops: List[Op] = []
        self.inputs: List[InputOp] = []
        self._names: Dict[str, int] = {}
        self._next_guid = 1000  # reference starts op guids at a magic base too

    def unique_name(self, base: str) -> str:
        n = self._names.get(base, 0)
        self._names[base] = n + 1
        return base if n == 0 else f"{base}_{n}"

    def add_op(self, op: Op) -> Op:
        op.guid = self._next_guid
        self._next_guid += 1
        self.ops.append(op)
        if isinstance(op, InputOp):
            self.inputs.append(op)
        return op

    @property
    def compute_ops(self) -> List[Op]:
        return [op for op in self.ops if not isinstance(op, InputOp)]

    def init_params(self, key: jax.Array) -> Dict[str, Dict[str, jax.Array]]:
        params: Dict[str, Dict[str, jax.Array]] = {}
        for op in self.compute_ops:
            if op.params:
                params[op.name] = op.init_params(jax.random.fold_in(key, op.guid))
        return params

    def execute(
        self,
        params: Dict[str, Dict[str, jax.Array]],
        feeds: Dict[str, jax.Array],
        ctx: OpContext,
        fetch: Optional[Sequence[TensorSpec]] = None,
    ) -> List[jax.Array]:
        """Topological interpretation of the graph under jit tracing.

        `feeds` maps input-op name -> array. Returns values of `fetch`
        tensors (default: outputs of the final op). Applies per-op sharding
        constraints from ctx.plan (the reference mapper's job,
        src/mapper/mapper.cc:346-438, done declaratively here).
        """
        env: Dict[Tuple[int, int], jax.Array] = {}
        for iop in self.inputs:
            env[(iop.guid, 0)] = feeds[iop.name]

        for op in self.compute_ops:
            if ctx.overrides is not None and op.name in ctx.overrides:
                ys = list(ctx.overrides[op.name])
            else:
                xs = [env[(t.owner_op.guid, t.owner_idx)] for t in op.inputs]
                op_params = params.get(op.name, {})
                ys = op.forward(op_params, xs, ctx)
            if ctx.plan is not None and ctx.mesh is not None:
                ys = ctx.plan.constrain_outputs(op, ys, ctx.mesh)
            if ctx.taps is not None:
                for i, y in enumerate(ys):
                    ctx.taps[f"{op.name}:{i}"] = y
            for i, y in enumerate(ys):
                env[(op.guid, i)] = y

        if fetch is None:
            last = self.compute_ops[-1]
            fetch = last.outputs
        return [env[(t.owner_op.guid, t.owner_idx)] for t in fetch]

    # -- introspection for autotuner / fusion reporting -------------------------
    def edges(self) -> List[Tuple[Op, Op, int]]:
        """(producer, consumer, volume_elems) edge list (reference analog:
        the simulator's inter-op comm edges, src/runtime/simulator.cc:357)."""
        out = []
        for op in self.compute_ops:
            for t in op.inputs:
                if t.owner_op is not None and not isinstance(t.owner_op, InputOp):
                    out.append((t.owner_op, op, t.volume))
        return out
