"""FFModel: graph-builder facade + compile-to-jit pipeline.

TPU-native analog of the reference FFModel (reference: include/model.h:283-588,
src/runtime/model.cc). The builder methods mirror the reference API name-for-
name (dense/embedding/concat/..., model.h:293-455). `compile` plays the role
of FFModel::compile (model.cc:1567): instead of creating Legion partitions,
fusing ops, and building NCCL communicators, it
  1. optionally runs the sharding autotuner (reference: strategy search,
     model.cc:1578-1584),
  2. binds a ShardingPlan + Mesh,
  3. builds pure jitted train/eval step functions where XLA performs fusion
     (reference: apply_fusion, model.cc:1488) and inserts collectives
     (reference: NCCL allreduce / Legion region copies).
The train-loop verbs (forward/backward/update/zero_gradients) exist for API
parity but delegate to the fused step — on TPU splitting them would defeat
XLA; `fit`/`eval` are the Keras-style loops (reference:
python/flexflow/keras/models/base_model.py:127-424).
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FFConfig, FFIterationConfig
from ..ffconst import (
    ActiMode,
    AggrMode,
    DataType,
    LossType,
    MetricsType,
    OperatorType,
    PoolType,
)
from ..training import losses as losses_lib
from ..training import metrics as metrics_lib
from ..training.optimizer import AdamOptimizer, Optimizer, SGDOptimizer
from .graph import Graph, InputOp, Op, OpContext
from .tensor import TensorSpec


class FFModel:
    def __init__(self, config: Optional[FFConfig] = None):
        self.config = config or FFConfig()
        self.graph = Graph()
        self.iter_config = FFIterationConfig()
        self.label_tensor: Optional[TensorSpec] = None
        # populated by compile()
        self.optimizer: Optional[Optimizer] = None
        self.sparse_optimizer: Optional[Optimizer] = None
        self.loss_type: Optional[LossType] = None
        self.metrics_mask: MetricsType = MetricsType.METRICS_NONE
        self.mesh = None
        self.plan = None
        self._params = None
        self._opt_state = None
        self._metrics_total = None
        self._train_step = None
        self._eval_step = None
        self._forward_fn = None
        self._constant_feeds = {}
        self._constant_arrays = {}
        self._step_count = 0
        self._compiled = False

    # ------------------------------------------------------------------ build
    def create_tensor(
        self,
        dims: Sequence[int],
        dtype: DataType = DataType.DT_FLOAT,
        name: Optional[str] = None,
    ) -> TensorSpec:
        """reference: FFModel::create_tensor (model.cc:831). dims are C-order,
        batch first (reference C++ API convention, e.g. dlrm.cc:90)."""
        name = self.graph.unique_name(name or "input")
        op = InputOp(name, tuple(int(d) for d in dims), dtype)
        self.graph.add_op(op)
        return op.outputs[0]

    def _add(self, op: Op) -> Op:
        return self.graph.add_op(op)

    def create_constant(self, dims, value: float, dtype=DataType.DT_FLOAT,
                        name: Optional[str] = None) -> TensorSpec:
        """reference: FFModel.create_constant (flexflow_cffi.py) — a
        constant-filled input tensor (materialized once at compile,
        replicated under a mesh)."""
        t = self.create_tensor(dims, dtype=dtype, name=name or "constant")
        self._constant_feeds[t.owner_op.name] = (
            tuple(int(d) for d in dims), float(value), dtype
        )
        return t

    # --- introspection (reference: get_layers/print_layers, flexflow_cffi.py)
    def get_layers(self):
        return list(self.graph.compute_ops)

    def get_layer_by_name(self, name: str):
        for op in self.graph.compute_ops:
            if op.name == name:
                return op
        raise KeyError(name)

    def get_layer_by_id(self, guid: int):
        for op in self.graph.ops:
            if op.guid == guid:
                return op
        raise KeyError(guid)

    def print_layers(self) -> None:
        """reference: FFModel.print_layers."""
        for op in self.graph.compute_ops:
            ins = ", ".join(t.owner_op.name for t in op.inputs)
            outs = ", ".join(str(tuple(t.shape)) for t in op.outputs)
            print(f"[{op.guid}] {type(op).__name__} '{op.name}' ({ins}) -> {outs}")

    # --- dense / embedding / interaction --------------------------------------
    def dense(
        self,
        input: TensorSpec,
        out_dim: int,
        activation=ActiMode.AC_MODE_NONE,
        use_bias: bool = True,
        kernel_initializer=None,
        bias_initializer=None,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.dense import Dense

        op = Dense(
            self.graph.unique_name(name or "dense"),
            input,
            out_dim,
            activation,
            use_bias,
            kernel_initializer,
            bias_initializer,
        )
        return self._add(op).outputs[0]

    def embedding(
        self,
        input: TensorSpec,
        num_entries: int,
        out_dim: int,
        aggr: AggrMode = AggrMode.AGGR_MODE_SUM,
        kernel_initializer=None,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.embedding import Embedding

        op = Embedding(
            self.graph.unique_name(name or "embedding"),
            input,
            num_entries,
            out_dim,
            aggr,
            kernel_initializer,
        )
        return self._add(op).outputs[0]

    def lstm(
        self,
        input: TensorSpec,
        hidden_size: int,
        initial_state=None,
        kernel_initializer=None,
        recurrent_initializer=None,
        bias_initializer=None,
        name: Optional[str] = None,
    ):
        """LSTM over [B, T, E] -> (sequence [B, T, H], h_T [B, H],
        c_T [B, H]). initial_state: optional (h0, c0) TensorSpec pair for
        encoder->decoder chaining (reference: nmt/rnn.cu:305-318 threads
        hx/cx through per-10-step LSTM nodes; here the whole time axis is
        one lax.scan and the chain is a graph edge)."""
        from ..ops.rnn import LSTM

        h0, c0 = initial_state if initial_state is not None else (None, None)
        op = LSTM(
            self.graph.unique_name(name or "lstm"),
            input,
            hidden_size,
            h0=h0,
            c0=c0,
            kernel_initializer=kernel_initializer,
            recurrent_initializer=recurrent_initializer,
            bias_initializer=bias_initializer,
        )
        self._add(op)
        return op.outputs[0], op.outputs[1], op.outputs[2]

    def dot_interaction(
        self,
        inputs: Sequence[TensorSpec],
        self_interaction: bool = False,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.interaction import DotInteraction

        op = DotInteraction(
            self.graph.unique_name(name or "dot_interaction"), inputs, self_interaction
        )
        return self._add(op).outputs[0]

    # --- shape ops -------------------------------------------------------------
    def concat(
        self, tensors: Sequence[TensorSpec], axis: int, name: Optional[str] = None
    ) -> TensorSpec:
        from ..ops.shape_ops import Concat

        op = Concat(self.graph.unique_name(name or "concat"), tensors, axis)
        return self._add(op).outputs[0]

    def split(
        self,
        input: TensorSpec,
        sizes,
        axis: int,
        name: Optional[str] = None,
    ) -> List[TensorSpec]:
        from ..ops.shape_ops import Split

        if isinstance(sizes, int):
            assert input.shape[axis] % sizes == 0
            sizes = [input.shape[axis] // sizes] * sizes
        op = Split(self.graph.unique_name(name or "split"), input, sizes, axis)
        return list(self._add(op).outputs)

    def flat(self, input: TensorSpec, name: Optional[str] = None) -> TensorSpec:
        from ..ops.shape_ops import Flat

        return self._add(Flat(self.graph.unique_name(name or "flat"), input)).outputs[0]

    def reshape(
        self, input: TensorSpec, shape: Sequence[int], name: Optional[str] = None
    ) -> TensorSpec:
        from ..ops.shape_ops import Reshape

        op = Reshape(self.graph.unique_name(name or "reshape"), input, shape)
        return self._add(op).outputs[0]

    def transpose(
        self, input: TensorSpec, perm: Sequence[int], name: Optional[str] = None
    ) -> TensorSpec:
        from ..ops.shape_ops import Transpose

        op = Transpose(self.graph.unique_name(name or "transpose"), input, perm)
        return self._add(op).outputs[0]

    def reverse(
        self, input: TensorSpec, axis: int, name: Optional[str] = None
    ) -> TensorSpec:
        from ..ops.shape_ops import Reverse

        op = Reverse(self.graph.unique_name(name or "reverse"), input, axis)
        return self._add(op).outputs[0]

    # --- elementwise -------------------------------------------------------------
    def _binary(self, t: OperatorType, x, y, name=None) -> TensorSpec:
        from ..ops.elementwise import ElementBinary

        base = t.name.lower().replace("op_ew_", "")
        op = ElementBinary(self.graph.unique_name(name or base), t, x, y)
        return self._add(op).outputs[0]

    def _unary(self, t: OperatorType, x, scalar=0.0, name=None) -> TensorSpec:
        from ..ops.elementwise import ElementUnary

        base = t.name.lower().replace("op_", "")
        op = ElementUnary(self.graph.unique_name(name or base), t, x, scalar)
        return self._add(op).outputs[0]

    def add(self, x, y, name=None):
        return self._binary(OperatorType.OP_EW_ADD, x, y, name)

    def subtract(self, x, y, name=None):
        return self._binary(OperatorType.OP_EW_SUB, x, y, name)

    def multiply(self, x, y, name=None):
        return self._binary(OperatorType.OP_EW_MUL, x, y, name)

    def divide(self, x, y, name=None):
        return self._binary(OperatorType.OP_EW_DIV, x, y, name)

    def exp(self, x, name=None):
        return self._unary(OperatorType.OP_EXP, x, name=name)

    def relu(self, x, name=None):
        return self._unary(OperatorType.OP_RELU, x, name=name)

    def sigmoid(self, x, name=None):
        return self._unary(OperatorType.OP_SIGMOID, x, name=name)

    def tanh(self, x, name=None):
        return self._unary(OperatorType.OP_TANH, x, name=name)

    def elu(self, x, name=None):
        return self._unary(OperatorType.OP_ELU, x, name=name)

    def gelu(self, x, name=None):
        return self._unary(OperatorType.OP_GELU, x, name=name)

    def identity(self, x, name=None):
        return self._unary(OperatorType.OP_IDENTITY, x, name=name)

    def scalar_multiply(self, x, scalar, name=None):
        return self._unary(OperatorType.OP_SCALAR_MULTIPLY, x, scalar, name)

    def scalar_add(self, x, scalar, name=None):
        return self._unary(OperatorType.OP_SCALAR_ADD, x, scalar, name)

    def scalar_sub(self, x, scalar, name=None):
        return self._unary(OperatorType.OP_SCALAR_SUB, x, scalar, name)

    def scalar_truediv(self, x, scalar, name=None):
        return self._unary(OperatorType.OP_SCALAR_TRUE_DIV, x, scalar, name)

    # --- regularizers ---------------------------------------------------------
    def softmax(self, input: TensorSpec, name: Optional[str] = None) -> TensorSpec:
        from ..ops.regularizers import Softmax

        return self._add(
            Softmax(self.graph.unique_name(name or "softmax"), input)
        ).outputs[0]

    def dropout(
        self, input: TensorSpec, rate: float, seed: int = 0, name=None
    ) -> TensorSpec:
        from ..ops.regularizers import Dropout

        op = Dropout(self.graph.unique_name(name or "dropout"), input, rate, seed)
        return self._add(op).outputs[0]

    # --- linear algebra / CNN / attention --------------------------------------
    def batch_matmul(
        self,
        A: TensorSpec,
        B: TensorSpec,
        a_seq_length_dim: int = -1,
        b_seq_length_dim: int = -1,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.batch_matmul import BatchMatmul

        op = BatchMatmul(
            self.graph.unique_name(name or "batch_matmul"),
            A, B, a_seq_length_dim, b_seq_length_dim,
        )
        return self._add(op).outputs[0]

    def conv2d(
        self,
        input: TensorSpec,
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
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.conv import Conv2D

        op = Conv2D(
            self.graph.unique_name(name or "conv2d"),
            input, out_channels, kernel_h, kernel_w, stride_h, stride_w,
            padding_h, padding_w, activation, groups, use_bias,
            kernel_initializer, bias_initializer,
        )
        return self._add(op).outputs[0]

    def pool2d(
        self,
        input: TensorSpec,
        kernel_h: int,
        kernel_w: int,
        stride_h: int = 1,
        stride_w: int = 1,
        padding_h: int = 0,
        padding_w: int = 0,
        pool_type: PoolType = PoolType.POOL_MAX,
        activation=ActiMode.AC_MODE_NONE,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.conv import Pool2D

        op = Pool2D(
            self.graph.unique_name(name or "pool2d"),
            input, kernel_h, kernel_w, stride_h, stride_w,
            padding_h, padding_w, pool_type, activation,
        )
        return self._add(op).outputs[0]

    def batch_norm(
        self, input: TensorSpec, relu: bool = True, name: Optional[str] = None
    ) -> TensorSpec:
        from ..ops.conv import BatchNorm

        op = BatchNorm(self.graph.unique_name(name or "batch_norm"), input, relu)
        return self._add(op).outputs[0]

    def multihead_attention(
        self,
        query: TensorSpec,
        key: TensorSpec,
        value: TensorSpec,
        embed_dim: int,
        num_heads: int,
        kdim: int = 0,
        vdim: int = 0,
        dropout: float = 0.0,
        bias: bool = True,
        add_bias_kv: bool = False,
        add_zero_attn: bool = False,
        kernel_initializer=None,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.attention import MultiHeadAttention

        op = MultiHeadAttention(
            self.graph.unique_name(name or "attention"),
            query, key, value, embed_dim, num_heads, kdim, vdim,
            dropout, bias, add_bias_kv, add_zero_attn, kernel_initializer,
        )
        return self._add(op).outputs[0]

    # --- MoE --------------------------------------------------------------------
    def top_k(
        self, input: TensorSpec, k: int, sorted: bool = True, name: Optional[str] = None
    ):
        from ..ops.moe import TopK

        op = TopK(self.graph.unique_name(name or "topk"), input, k, sorted)
        self._add(op)
        return op.outputs[0], op.outputs[1]

    def group_by(
        self,
        data: TensorSpec,
        assign: TensorSpec,
        n: int,
        alpha: float,
        name: Optional[str] = None,
    ):
        from ..ops.moe import GroupBy

        op = GroupBy(self.graph.unique_name(name or "group_by"), data, assign, n, alpha)
        return list(self._add(op).outputs)

    def aggregate(
        self, inputs: Sequence[TensorSpec], n: int, lambda_bal: float = 0.0,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.moe import Aggregate

        op = Aggregate(self.graph.unique_name(name or "aggregate"), inputs, n, lambda_bal)
        return self._add(op).outputs[0]

    def aggregate_spec(
        self, inputs: Sequence[TensorSpec], n: int, lambda_bal: float = 0.0,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.moe import AggregateSpec

        op = AggregateSpec(
            self.graph.unique_name(name or "aggregate_spec"), inputs, n, lambda_bal
        )
        return self._add(op).outputs[0]

    def cache(
        self,
        input: TensorSpec,
        num_batches: int,
        score_func=None,
        name: Optional[str] = None,
    ) -> TensorSpec:
        from ..ops.cache import Cache

        op = Cache(self.graph.unique_name(name or "cache"), input, num_batches, score_func)
        return self._add(op).outputs[0]

    def recompile_on_condition(self, recompile_state) -> bool:
        """reference: FFModel::recompile_on_condition (model.cc:1424-1428):
        call the user trigger; if it fires, apply alter_func and rebuild the
        compiled step (XLA re-trace = Legion re-partition)."""
        if recompile_state.trigger():
            recompile_state.alter()
            self.recompile()
            return True
        return False

    def _onehot_packed_eligible(self, op, mesh) -> bool:
        """Mid-band packed one-hot selection (config.onehot_packed_threshold):
        vocab in (onehot_embedding_threshold, onehot_packed_threshold],
        lane-divisible dim, pooling aggregation, single-chip, not a
        host-tail op. These tables take dense [P, 128] grads through the
        packed one-hot matmul instead of the sparse gather+update path."""
        from ..ffconst import AggrMode
        from ..ops.embedding import Embedding as _Embedding

        thr = self.config.onehot_packed_threshold
        if thr <= 0 or mesh is not None or type(op) is not _Embedding:
            return False
        v = getattr(op, "num_entries", 0)
        return (
            self.config.onehot_embedding_threshold < v <= thr
            and 128 % op.out_dim == 0
            and op.aggr is not AggrMode.AGGR_MODE_NONE
            and not getattr(op, "host_tail_vocab", 0)
        )

    def recompile(self) -> None:
        """Rebuild jitted steps after a graph mutation, preserving state."""
        assert self._compiled
        params, opt_state, step_count = self._params, self._opt_state, self._step_count
        totals = self._metrics_total
        self.compile(**self._compile_args)
        self._params, self._opt_state, self._step_count = params, opt_state, step_count
        self._metrics_total = totals

    # ------------------------------------------------------------------ compile
    def compile(
        self,
        optimizer: Optional[Optimizer] = None,
        loss_type: LossType = LossType.LOSS_MEAN_SQUARED_ERROR_AVG_REDUCE,
        metrics: Sequence[MetricsType] = (),
        comp_mode=None,
        mesh=None,
        plan=None,
        seed: Optional[int] = None,
        donate: bool = True,
        sparse_optimizer: Optional[Optimizer] = None,
    ) -> None:
        """reference: FFModel::compile(optimizer, loss, metrics)
        (src/runtime/model.cc:1567). See module docstring for the mapping.

        sparse_optimizer: optional SEPARATE optimizer for the sparse
        embedding-row updates (the production DLRM pattern — e.g. row-wise
        AdaGrad on tables + Adam on the dense towers; beyond the
        reference's single-optimizer compile). Defaults to `optimizer`.
        Sparse Adam requires dense Adam (the bias-correction step count
        lives in the dense state)."""
        self._compile_args = dict(
            optimizer=optimizer, loss_type=loss_type, metrics=tuple(metrics),
            comp_mode=comp_mode, mesh=mesh, plan=plan, seed=seed, donate=donate,
            sparse_optimizer=sparse_optimizer,
        )
        self.optimizer = optimizer or SGDOptimizer(
            lr=self.config.learning_rate, weight_decay=self.config.weight_decay
        )
        self.sparse_optimizer = sparse_optimizer or self.optimizer
        assert not (
            isinstance(self.sparse_optimizer, AdamOptimizer)
            and not isinstance(self.optimizer, AdamOptimizer)
        ), "sparse Adam requires dense Adam (shared step count)"
        self.loss_type = loss_type
        mask = MetricsType.METRICS_NONE
        for m in metrics:
            mask |= m
        self.metrics_mask = mask
        self.mesh = mesh
        self.plan = plan
        # packed row-gather + update-stream implementations: explicit
        # config wins; "auto" uses the calibrated machine winner when a
        # calibration cache exists (first TPU compile re-applies it right
        # after calibration in _run_strategy_search). Must be set BEFORE
        # any step tracing.
        from ..ops.pallas.packed_update import (
            set_gather_mode, set_selective, set_stream_mode,
        )
        set_selective(self.config.packed_selective != "off")
        gmode = self.config.packed_gather_mode
        smode = self.config.packed_stream_mode
        if gmode == "auto" or smode == "auto":
            import json as _json
            import os as _os
            doc = {}
            cache = self.config.machine_cache_path()
            if _os.path.exists(cache):
                try:
                    with open(cache) as f:
                        doc = _json.load(f)
                except (OSError, ValueError):
                    pass
            if gmode == "auto":
                set_gather_mode(doc.get("gather_mode", "pack"))
                for dk, dv in (doc.get("gather_mode_by_dim") or {}).items():
                    set_gather_mode(dv, int(dk))
                gmode = None
            if smode == "auto":
                set_stream_mode(doc.get("stream_mode", "expanded"))
                for dk, dv in (doc.get("stream_mode_by_dim") or {}).items():
                    set_stream_mode(dv, int(dk))
                smode = None
        if gmode is not None:
            set_gather_mode(gmode)
        if smode is not None:
            set_stream_mode(smode)
        # planner pass: fuse per-table embeddings into one collection
        # (reference analog: compile-time partitioning + table placement,
        # model.cc:1629-1646 + dlrm_strategy.py). Also a single-chip win:
        # one pooled gather/scatter instead of T separate ones.
        if mesh is not None and plan is not None:
            # strategy import (reference: --import consumed at compile,
            # model.cc:1575)
            if self.config.import_strategy_file:
                from ..parallel.plan import ShardingPlan

                plan = ShardingPlan.load(self.config.import_strategy_file)
                self.plan = plan
            # hierarchical pooled exchange (ICI combine before DCN): default
            # the host grouping from the config / the actual process layout
            if plan.exchange == "dense" and self.config.exchange != "dense":
                plan.exchange = self.config.exchange
            if plan.chips_per_host is None and self.config.chips_per_host:
                cph = self.config.chips_per_host
                # With a 2D data-x-model mesh, each DATA-axis index spans
                # model-axis devices, so physical chips/host must be divided
                # by the model-axis size to get chips-per-host ALONG the data
                # axis (else ICI groups silently straddle hosts and the
                # hierarchical exchange's DCN savings invert).
                if "model" in mesh.axis_names:
                    cph = max(1, cph // mesh.shape["model"])
                plan.chips_per_host = cph
            # strategy search (reference: STRATEGY_SEARCH_TASK when
            # --budget > 0, model.cc:1578-1584 + simulator.cu:71)
            if self.config.search_budget > 0 and plan.table_assignment is None:
                self._run_strategy_search(mesh, plan)
            # TP/parameter-parallel (reference: --enable-parameter-parallel,
            # config.h:141): column-shard wide Dense kernels over the mesh's
            # "model" axis when one exists.
            if self.config.enable_parameter_parallel and "model" in mesh.axis_names:
                from ..parallel.plan import enable_parameter_parallel

                enable_parameter_parallel(plan, self.graph)
            if plan.packed_pool is None:
                # packed pool storage: scatter-free local updates via the
                # Pallas packed kernel (SGD incl. momentum, row-wise
                # AdaGrad, and lazy Adam — m/v live in packed side pools)
                from ..ops.pallas import pallas_supported as _psup

                # gate on the SPARSE optimizer: it is what the packed row
                # update dispatches on (a distinct dense optimizer never
                # touches the tables)
                _row_opt = self.sparse_optimizer
                plan.packed_pool = bool(
                    (
                        self.config.packed_tables == "on"
                        or (
                            self.config.packed_tables == "auto"
                            and self.config.use_pallas != "off"
                            and _psup()
                        )
                    )
                    and (
                        isinstance(_row_opt, (SGDOptimizer, AdamOptimizer))
                        or type(_row_opt).__name__ == "RowWiseAdagradOptimizer"
                    )
                )
            # host-tail offload BEFORE fusion/init: huge tables keep a hot
            # prefix on device, cold rows in the demand-allocated host
            # store (parallel/host_tail.py; plan axis host_tail_rows)
            self._setup_host_tail(plan)
            if plan.embedding_mode == "table_parallel":
                from ..parallel.passes import fuse_embedding_tables

                coll = fuse_embedding_tables(
                    self.graph, plan, mesh.shape[plan.batch_axis],
                    min_vocab=self.config.onehot_embedding_threshold,
                )
                # exposed for the all-to-all GB/s report (bench.py; the
                # BASELINE.md pooled-exchange metric)
                self._embedding_layout = coll.layout if coll is not None else None
            # strategy export (reference: --export, strategy.cc:150)
            if self.config.export_strategy_file:
                plan.save(self.config.export_strategy_file)
            self._input_shardings = plan.input_shardings(self.graph, mesh)
            self._label_sharding = plan.label_sharding(mesh)
        else:
            self._embedding_layout = None
            self._setup_host_tail(plan)
            if self.config.fuse_embeddings:
                from ..parallel.passes import fuse_embedding_tables
                from ..parallel.plan import dlrm_hybrid_plan

                coll = fuse_embedding_tables(self.graph, dlrm_hybrid_plan(), 1)
                self._embedding_layout = coll.layout if coll is not None else None
            self._input_shardings = None
            self._label_sharding = None

        # task-graph export (reference: --export-strategy-task-graph-file,
        # simulator.cc:509-558 Graphviz dump)
        if self.config.export_strategy_task_graph_file:
            from ..utils.profiling import export_task_graph

            export_task_graph(self, self.config.export_strategy_task_graph_file)

        # materialize constants once (replicated under a mesh; reference:
        # create_constant fills at model build)
        self._constant_arrays = {}
        for cname, (dims, value, cdtype) in self._constant_feeds.items():
            arr = jnp.full(dims, value, cdtype.to_jnp())
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                arr = jax.device_put(arr, NamedSharding(mesh, P()))
                if self._input_shardings is not None:
                    self._input_shardings[cname] = NamedSharding(mesh, P())
            self._constant_arrays[cname] = arr

        final = self.graph.compute_ops[-1]
        out_spec = final.outputs[0]
        self.label_tensor = TensorSpec(
            self._label_shape(out_spec), DataType.DT_FLOAT, "label"
        )
        binary_acc = out_spec.shape[-1] == 1  # DLRM-style 0.5-threshold accuracy

        key = jax.random.PRNGKey(self.config.seed if seed is None else seed)
        params = self.graph.init_params(key)

        compute_dtype = jnp.dtype(self.config.compute_dtype)
        graph = self.graph
        loss_t = self.loss_type
        opt = self.optimizer
        sopt = self.sparse_optimizer
        metrics_mask = self.metrics_mask
        profiling = self.config.profiling
        onehot_thr = self.config.onehot_embedding_threshold
        from ..ops.pallas import resolve_use_pallas

        # "auto" downgrades to "off" on non-TPU backends (interpret-mode
        # kernels are test-only)
        use_pallas = self.config.use_pallas
        if not resolve_use_pallas(use_pallas):
            use_pallas = "off"

        # Sparse-embedding-gradient path: embedding ops whose indices come
        # straight from graph inputs get their pooled-output gradient applied
        # as a row scatter fused with the optimizer — no dense [vocab, dim]
        # gradient (TPU analog of the reference's scatter-into-the-region
        # backward, src/ops/embedding.cu:192-217). Requires a row-local
        # optimizer rule (plain SGD / row-wise AdaGrad).
        sparse_ops = []
        if sopt.supports_sparse:
            for op in graph.compute_ops:
                if hasattr(op, "sparse_update") and op.inputs and all(
                    isinstance(t.owner_op, InputOp) for t in op.inputs
                ):
                    # small tables go through the one-hot matmul (dense
                    # grads) — EXCEPT host-tail ops, whose hot prefix may
                    # shrink num_entries under the threshold but whose
                    # backward only exists on the sparse path
                    if (
                        0 < getattr(op, "num_entries", 0) <= onehot_thr
                        and not getattr(op, "host_tail_vocab", 0)
                    ):
                        continue
                    # mid-band tables take the PACKED one-hot matmul
                    # (dense [P, 128] grads; selected below) — they skip
                    # the sparse path entirely
                    if self._onehot_packed_eligible(op, mesh):
                        continue
                    sparse_ops.append(op)
        sparse_names = {op.name for op in sparse_ops}
        self._sparse_names = sparse_names
        # host-tail ops must ride the sparse path: their backward is the
        # pooled-output grad (gathered at pos for the host side), which
        # only the split train step materializes
        host_tail_feeds = []
        if getattr(self, "_host_tail", None) is not None:
            for opn in self._host_tail.entries:
                assert opn in sparse_names, (
                    f"host-tail table {opn} requires the sparse-update path "
                    "(optimizer.supports_sparse and indices fed from inputs)"
                )
                host_tail_feeds.append(
                    (opn, self._host_tail.feed_names(opn)[0])
                )

        # Packed-layout tables: big single-table embeddings on the sparse
        # path store their weight as [V*D/128, 128] so the Pallas
        # packed-update kernel (ops/pallas/packed_update.py) replaces the
        # XLA scatter (measured 19x on the kaggle update phase). Off-mesh
        # only for now (the sharded collection keeps its pooled scatter).
        from ..ops.embedding import Embedding as _Embedding
        from ..ops.pallas import pallas_supported

        packed_enable = self.config.packed_tables == "on" or (
            self.config.packed_tables == "auto"
            and self.config.use_pallas != "off"
            and pallas_supported()
        )
        # the engine's packed dispatch handles exactly these row-update
        # optimizers; anything else (custom Optimizer subclass) must keep
        # the unpacked scatter path
        packed_enable = packed_enable and (
            isinstance(sopt, (SGDOptimizer, AdamOptimizer))
            or type(sopt).__name__ == "RowWiseAdagradOptimizer"
        )
        for op in sparse_ops:
            if (
                packed_enable
                and mesh is None
                and type(op) is _Embedding
                and 128 % op.out_dim == 0
                and (
                    self.config.packed_tables == "on"
                    or op.inputs[0].volume >= self.config.packed_min_rows
                )
            ):
                from ..ops.pallas.packed_update import pick_chunk_packs

                op.packed = True
                op.chunk_packs = pick_chunk_packs(
                    op.num_entries, op.out_dim, op.inputs[0].volume
                )
                # training storage dtype (config.table_dtype): bf16 halves
                # the two biggest HBM pools of the step (forward gathers +
                # the update kernel's table pass). Sparse-row updates only:
                # the kernel accumulates f32 into the bf16 storage; the
                # dense-optimizer paths (mid-band one-hot, small tables)
                # keep f32 params.
                op.table_dtype = (
                    self.config.table_dtype
                    if self.config.table_dtype != "float32" else None
                )
                params[op.name] = op.pack_params(params[op.name])
            else:
                op.packed = False
                op.table_dtype = None
        self._route_ops = [op for op in sparse_ops if getattr(op, "packed", False)]

        # Mid-band tables (onehot_thr < vocab <= onehot_packed_threshold):
        # packed storage + one-hot matmul over pack lines, dense grads —
        # no gather, no update stream (ops/embedding.py
        # packed_embedding_bag_onehot). Pure XLA (no Pallas gate).
        for op in graph.compute_ops:
            if type(op) is not _Embedding:
                continue
            op.onehot_packed = False  # reset stale recompile state
            if op.name in sparse_names:
                continue
            if self._onehot_packed_eligible(op, mesh):
                from ..ops.pallas.packed_update import pick_chunk_packs

                op.packed = True
                op.onehot_packed = True
                op.table_dtype = None  # dense-grad path keeps f32 params
                op.chunk_packs = pick_chunk_packs(
                    op.num_entries, op.out_dim, op.inputs[0].volume
                )
                params[op.name] = op.pack_params(params[op.name])

        # bf16 table storage for SHARDED collections (round 5): packed
        # pools under a real data axis only — there the local row update is
        # the Pallas packed kernel (f32 accumulation into bf16 storage, one
        # rounding per step; optimizer side pools stay f32, sparse_state_init
        # is dtype-independent). The single-chip flat-collection fallback
        # and non-packed pools keep f32: their scatter-add would round every
        # duplicate add in bf16.
        from ..ops.embedding_collection_op import EmbeddingCollection as _ECol

        for op in sparse_ops:
            if type(op) is not _ECol:
                continue
            if (
                self.config.table_dtype == "bfloat16"
                and mesh is not None
                and plan is not None
                and mesh.shape.get(plan.batch_axis, 1) > 1
                and getattr(op.layout, "packed_pool", False)
            ):
                op.table_dtype = jnp.bfloat16
                params[op.name] = {
                    **params[op.name],
                    "pool": params[op.name]["pool"].astype(jnp.bfloat16),
                }
            else:
                op.table_dtype = None

        def forward_only(params, feeds, training, rng):
            ctx = OpContext(
                training=training,
                rng=rng,
                compute_dtype=compute_dtype,
                seq_length=self.iter_config.seq_length,
                mesh=mesh,
                plan=plan,
                profiling=profiling,
                onehot_threshold=onehot_thr,
                use_pallas=use_pallas,
            )
            (out,) = graph.execute(params, feeds, ctx, fetch=[out_spec])
            return out

        def loss_and_metrics(params, feeds, labels, rng, overrides=None):
            ctx = OpContext(
                training=True,
                rng=rng,
                compute_dtype=compute_dtype,
                seq_length=self.iter_config.seq_length,
                mesh=mesh,
                plan=plan,
                profiling=profiling,
                overrides=overrides,
                onehot_threshold=onehot_thr,
                use_pallas=use_pallas,
            )
            (logits,) = graph.execute(params, feeds, ctx, fetch=[out_spec])
            loss = losses_lib.compute_loss(loss_t, logits, labels)
            step_metrics = metrics_lib.compute_perf_metrics(
                metrics_mask, logits, labels, binary_acc
            )
            return loss, step_metrics

        def train_step(params, opt_state, metrics_total, feeds, labels, rng):
            if not sparse_ops:
                (loss, step_metrics), grads = jax.value_and_grad(
                    loss_and_metrics, has_aux=True
                )(params, feeds, labels, rng)
                params, opt_state = opt.update(grads, opt_state, params)
                metrics_total = metrics_lib.accumulate(metrics_total, step_metrics)
                return params, opt_state, metrics_total, loss

            # split path: lookups outside the diff region, pooled outputs
            # differentiated, rows updated by scatter
            ctx0 = OpContext(
                training=True,
                rng=rng,
                compute_dtype=compute_dtype,
                mesh=mesh,
                plan=plan,
                onehot_threshold=onehot_thr,
                use_pallas=use_pallas,
            )
            overrides = {}
            sparse_xs = {}
            for op in sparse_ops:
                xs = [feeds[t.owner_op.name] for t in op.inputs]
                sparse_xs[op.name] = xs
                overrides[op.name] = op.forward(params[op.name], xs, ctx0)
            dense_params = {k: v for k, v in params.items() if k not in sparse_names}

            def split_loss(dense_params, overrides):
                return loss_and_metrics(dense_params, feeds, labels, rng, overrides)

            (loss, step_metrics), (g_dense, g_over) = jax.value_and_grad(
                split_loss, argnums=(0, 1), has_aux=True
            )(dense_params, overrides)
            lr = opt_state["dense"].get("lr") if isinstance(opt_state["dense"], dict) else None
            new_dense, dstate = opt.update(g_dense, opt_state["dense"], dense_params)
            if sopt is not opt:
                # a distinct sparse optimizer carries its own rate; the
                # dense LR schedule does not leak onto the tables
                lr = None
            if isinstance(sopt, AdamOptimizer):
                # sparse path gets the bias-corrected alpha_t for this step
                # (reference: alpha_t precomputed per step, optimizer.cc);
                # the step count lives in the dense Adam state (compile
                # asserts dense is Adam too)
                t_f = dstate["step"].astype(jnp.float32)
                base = lr if lr is not None else sopt.alpha
                lr = (
                    base
                    * jnp.sqrt(1.0 - jnp.power(sopt.beta2, t_f))
                    / (1.0 - jnp.power(sopt.beta1, t_f))
                )
            new_params = dict(new_dense)
            from ..training.sparse_engine import apply_sparse_updates

            # host-precomputed routing metadata rides in reserved feed keys
            # ("_route:<op>:<field>"; see compute_routes) — index-derived,
            # so the input pipeline supplies it and the step skips the
            # on-device stream sort
            route_fields: Dict[str, Dict[str, Any]] = {}
            for key in feeds:
                if key.startswith("_route:"):
                    _, opn, field = key.split(":", 2)
                    route_fields.setdefault(opn, {})[field] = feeds[key]
            routes = {
                k: (v["order"], v["enc"], v["starts"])
                for k, v in route_fields.items()
                if len(v) == 3
            }
            upd_params, sstates = apply_sparse_updates(
                sparse_ops, params, sparse_xs, g_over, sopt,
                opt_state["sparse"], ctx0, lr=lr, routes=routes,
            )
            new_params.update(upd_params)
            metrics_total = metrics_lib.accumulate(metrics_total, step_metrics)
            new_state = {"dense": dstate, "sparse": sstates}
            if host_tail_feeds:
                # d(loss)/d(host tail partial val[k]) = pooled-output grad
                # at pos[k] (the scatter-add is linear) — the host applies
                # these to its tail store after the step. pos sentinel B is
                # clip-gathered; the host slices to its real count.
                g_host = {
                    opn: jnp.take(
                        g_over[opn][0], feeds[pname].astype(jnp.int32),
                        axis=0, mode="clip",
                    )
                    for opn, pname in host_tail_feeds
                }
                return new_params, new_state, metrics_total, loss, g_host
            return new_params, new_state, metrics_total, loss

        def eval_step(params, metrics_total, feeds, labels):
            logits = forward_only(params, feeds, False, None)
            loss = losses_lib.compute_loss(loss_t, logits, labels)
            step_metrics = metrics_lib.compute_perf_metrics(
                metrics_mask, logits, labels, binary_acc
            )
            return metrics_lib.accumulate(metrics_total, step_metrics), loss

        donate_args = (0, 1, 2) if donate else ()
        if mesh is not None and plan is not None:
            params = plan.shard_params(params, self.graph, mesh)
        # optimizer state mirrors parameter shardings (reference analog:
        # Adam m/v replica regions partitioned like the weight)
        if sparse_ops:
            dense_init = {k: v for k, v in params.items() if k not in sparse_names}
            sstates = {}
            for op in sparse_ops:
                st = op.sparse_state_init(sopt)
                if st is not None and mesh is not None and hasattr(op, "layout"):
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    # st is a pytree (Adam carries {'m','v'} pool dicts);
                    # every leaf shards on its leading (shard) axis
                    st = jax.tree_util.tree_map(
                        lambda x: jax.device_put(
                            x,
                            NamedSharding(
                                mesh,
                                P(plan.batch_axis,
                                  *([None] * (x.ndim - 1))),
                            ),
                        ),
                        st,
                    )
                sstates[op.name] = st
            opt_state = {"dense": opt.init(dense_init), "sparse": sstates}
        else:
            opt_state = opt.init(params)
        self._params = params
        self._opt_state = opt_state
        self._metrics_total = metrics_lib.zero_perf_metrics(
            with_auc=bool(metrics_mask & MetricsType.METRICS_AUC_ROC)
        )
        self._train_step_raw = train_step  # unjitted, for scanned multi-step
        self._train_step = jax.jit(train_step, donate_argnums=donate_args)

        def multi_step(params, opt_state, metrics_total, sfeeds, slabels, rng0):
            # K train steps in one dispatch (reference analog: Legion trace
            # replay around steady-state iterations, dlrm.cc:174-181)
            k = slabels.shape[0]

            def body(carry, xs):
                p, o, t = carry
                f, l, i = xs
                p, o, t, loss = train_step(p, o, t, f, l, jax.random.fold_in(rng0, i))
                return (p, o, t), loss

            (params, opt_state, metrics_total), losses = jax.lax.scan(
                body, (params, opt_state, metrics_total),
                (sfeeds, slabels, jnp.arange(k)),
            )
            return params, opt_state, metrics_total, losses[-1]

        # host-tail models step per batch (the host must intervene between
        # steps to serve/update tail rows), so the scanned multi-step path
        # is unavailable
        self._multi_step = (
            None if host_tail_feeds
            else jax.jit(multi_step, donate_argnums=donate_args)
        )
        self._eval_step = jax.jit(eval_step, donate_argnums=(1,))
        self._forward_fn_raw = forward_only  # unjitted, for embedding/export
        self._forward_fn = jax.jit(forward_only, static_argnums=(2,))
        self._step_count = 0
        # modes are read at TRACE time (first call), and another model's
        # compile may change them in between — snapshot THIS model's
        # winners so step entry points re-apply them before tracing
        from ..ops.pallas.packed_update import snapshot_modes

        self._packed_modes = snapshot_modes()
        self._compiled = True

    def _apply_packed_modes(self) -> None:
        if getattr(self, "_packed_modes", None) is not None:
            from ..ops.pallas.packed_update import restore_modes

            restore_modes(self._packed_modes)

    @staticmethod
    def _label_shape(out_spec: TensorSpec) -> Tuple[int, ...]:
        return (out_spec.shape[0], out_spec.shape[-1] if len(out_spec.shape) > 1 else 1)

    def _run_strategy_search(self, mesh, plan) -> None:
        """Cost-model-guided MCMC over table placement (native core)."""
        import jax as _jax

        from ..autotune.machine import MachineSpec, preset

        n = mesh.shape[plan.batch_axis]
        if self.config.machine_model_file:
            # the machine file's knobs win (it round-trips segmentation and
            # overlap fields); CLI flags configure the preset path
            machine = MachineSpec.from_file(self.config.machine_model_file)
            machine.num_chips = n
        else:
            name = "tpu_v5e" if _jax.devices()[0].platform != "cpu" else "cpu_sim"
            machine = preset(name, num_chips=n,
                             chips_per_host=min(n, _jax.local_device_count()))
            # reference simulator knobs (config.h:133-139) feed the cost model
            machine.segment_bytes = float(self.config.simulator_segment_size)
            machine.max_segments = float(self.config.simulator_max_num_segments)
        if self.config.search_overlap_backward_update:
            machine.overlap_backward_update = 1.0
        sopt_ = getattr(self, "sparse_optimizer", None) or self.optimizer
        osf = 1.0 if getattr(sopt_, "sparse_init", None) and             sopt_.sparse_init((2, 2)) is not None else 0.0
        # row-splitting is exact only for SUM pooling (embedding_collection
        # partial sums); AVG collections keep whole-table placement
        from ..ffconst import AggrMode

        sum_only = all(
            getattr(op, "aggr", AggrMode.AGGR_MODE_SUM) is AggrMode.AGGR_MODE_SUM
            for op in self.graph.compute_ops
            if op.op_type is OperatorType.OP_EMBEDDING
        )
        # fill the slice torus geometry when the machine file didn't
        # (a v5e slice is one all-ICI 2D torus; DCN only across slices)
        if machine.ici_axis_x <= 0 and machine.ici_domain <= 0:
            machine = machine.torus_for(n)  # one all-ICI slice by default
        # the mesh's model axis is the TP degree available to the search
        if "model" in mesh.axis_names and machine.model_axis <= 1:
            machine.model_axis = int(mesh.shape["model"])
        # auto-calibration at first compile on a real TPU: measure the
        # gather/scatter/packed-update constants once, cache the machine
        # file next to the strategy file, load on re-runs (reference:
        # measured per-(op,config) costs, model.cu:20-64)
        if (
            not self.config.machine_model_file
            and _jax.default_backend() == "tpu"
        ):
            from ..autotune.machine import calibrate_or_cached

            cache = self.config.machine_cache_path()
            machine = calibrate_or_cached(machine, cache)
            # per-shape dense costs for THIS graph's MLP layers (cached
            # cumulatively in the machine file; reference: per-(op,config)
            # measured kernels, model.cu:20-64)
            from ..autotune.machine import calibrate_dense, graph_dense_shapes

            shapes = graph_dense_shapes(self.graph)
            missing = [
                sh for sh in shapes
                if f"{sh[0]}x{sh[1]}" not in machine.dense_costs
            ]
            if missing:
                machine = calibrate_dense(machine, shapes)
                if cache:
                    machine.save(cache)
            # generic measured costs for the model's conv/batch-matmul/
            # attention ops (the reference measures EVERY op's kernels,
            # model.cu:20-64; Linear rides calibrate_dense above)
            from ..autotune.machine import (
                calibrate_graph_ops, measurable_graph_ops, op_cost_sig,
            )

            if any(
                op_cost_sig(o) not in machine.op_costs
                for o in measurable_graph_ops(self.graph)
            ):
                machine = calibrate_graph_ops(machine, self.graph)
                if cache:
                    machine.save(cache)
            # per-dim gather/stream winners for THIS model's packed dims
            # (cached cumulatively like dense_costs). Dims whose tables
            # would never run the packed kernel (packed tables off, or
            # every table at the dim rides the one-hot path) are skipped —
            # each measurement is two fresh Mosaic compiles through the
            # tunnel.
            from ..autotune.machine import calibrate_modes_for_dims

            packed_dims = sorted({
                op.out_dim for op in self.graph.compute_ops
                if op.op_type is OperatorType.OP_EMBEDDING
                and 128 % op.out_dim == 0
                and getattr(op, "num_entries", 0)
                > self.config.onehot_embedding_threshold
            }) if self.config.packed_tables != "off" else []
            dim_missing = [
                d for d in packed_dims
                if str(d) not in machine.gather_mode_by_dim
                or str(d) not in machine.stream_mode_by_dim
            ]
            if dim_missing:
                machine = calibrate_modes_for_dims(machine, dim_missing)
                if cache:
                    machine.save(cache)
            # Re-apply the modes now that calibration ran: auto takes the
            # measured winners; an EXPLICIT config must win over the
            # leftovers the calibration A/B left set (set with d=None also
            # clears the per-dim overrides).
            from ..ops.pallas.packed_update import (
                set_gather_mode, set_stream_mode,
            )

            if self.config.packed_gather_mode == "auto":
                set_gather_mode(machine.gather_mode)
                for dk, dv in machine.gather_mode_by_dim.items():
                    set_gather_mode(dv, int(dk))
            else:
                set_gather_mode(self.config.packed_gather_mode)
            if self.config.packed_stream_mode == "auto":
                set_stream_mode(machine.stream_mode)
                for dk, dv in machine.stream_mode_by_dim.items():
                    set_stream_mode(dv, int(dk))
            else:
                set_stream_mode(self.config.packed_stream_mode)
            print(f"[autotune] machine model calibrated (cache: {cache})")
        from ..autotune.search import autotune_plan_joint

        owner, cost_us, report = autotune_plan_joint(
            self.graph, machine, self.config.batch_size,
            budget=self.config.search_budget, alpha=self.config.search_alpha,
            seed=self.config.seed, opt_state_factor=osf,
            allow_splits=sum_only,
            # seed mode: one-hot tables start replicated (parallel/passes.py
            # min_vocab); the annealer may flip either way
            min_vocab=self.config.onehot_embedding_threshold,
            # the pooled exchange rides the compute dtype
            exchange_dtype_bytes=(
                2.0 if self.config.compute_dtype in ("bfloat16", "float16")
                else 4.0
            ),
            enable_propagation=self.config.enable_propagation,
            # host-tail candidate hot-prefix (parallel/host_tail.py): the
            # search may move a huge table's cold rows to the host (mode 2)
            # instead of paying the HBM overflow penalty
            host_tail_hot=self.config.host_tail_threshold or (1 << 20),
            # packed-table storage dtype scales the gather/table-pass terms
            table_dtype_bytes=(
                2.0 if self.config.table_dtype == "bfloat16" else 4.0
            ),
        )
        # decisions that apply even when NO table stays placed (owner empty):
        # one-hot replication and host-tail offload are per-table modes, not
        # collection placements
        # explicit None check: a searched "replicate NOTHING" (empty list)
        # must still clear any pre-set replication on the plan
        if (report or {}).get("replicated_tables") is not None:
            plan.replicated_tables = report["replicated_tables"]
        # host-tail placements chosen by the search (mode 2): the
        # compile-time pass reads plan.host_tail_rows and splits those
        # tables into a device hot prefix + host store
        tails = (report or {}).get("host_tail_rows")
        if tails and any(tails) and plan.host_tail_rows is None:
            from ..ops.embedding import Embedding as _Emb

            n_emb = sum(
                1 for o in self.graph.compute_ops if isinstance(o, _Emb)
            )
            # search table order == graph Embedding order only on the
            # raw (pre-fusion) graph; a fused layout interleaves
            # sub-table entries, so skip the decode there
            if len(tails) == n_emb:
                plan.host_tail_rows = tails
        if owner:
            plan.table_assignment = owner
            split = (report or {}).get("table_split")
            if split and any(s > 1 for s in split):
                plan.table_split = split
            # per-op dense TP chosen by the search: materialize the specs
            # (reference analog: --enable-parameter-parallel, but per op)
            tp_ops = set((report or {}).get("tp_ops", []))
            if tp_ops and "model" in mesh.axis_names:
                from ..parallel.plan import enable_parameter_parallel

                enable_parameter_parallel(
                    plan, self.graph, min_out_dim=2, only=tp_ops
                )
                self._search_tp = report["tp"]
            # exchange mode chosen by the search (dense vs routed buckets)
            if (report or {}).get("exchange") and plan.exchange == "dense":
                plan.exchange = report["exchange"]
            # the cost model scored the hierarchical exchange; make the
            # runtime execute it only when the mesh really spans multiple
            # ICI domains (a single slice is all-ICI — flat is optimal)
            dom = machine.ici_domain or n
            if (
                plan.chips_per_host is None
                and machine.hierarchical_a2a > 0
                and 1 < dom < n
            ):
                plan.chips_per_host = int(dom)
        self._search_report = report
        if report:
            cal_us = machine.predict_step_us(cost_us)
            print(
                f"[autotune] predicted step {cal_us:.1f}us "
                f"(model {cost_us:.1f}us x residual "
                f"{machine.step_residual:.2f}; round-robin "
                f"{report['round_robin_us']:.1f}us, "
                f"{report['improvement']:.2f}x)"
            )

    # ------------------------------------------------------------------ verbs
    def _stage(self, feeds: Dict[str, Any], labels=None):
        """Host->device batch staging (reference analog: ZCM full tensor ->
        partitioned device batch copies in next_batch, dlrm.cc:482). With a
        mesh, arrays are placed batch-sharded across it."""
        for name, arr in self._constant_arrays.items():
            if name not in feeds:
                feeds = {**feeds, name: arr}
        if self._input_shardings is not None:
            feeds = {
                k: (v if k in self._constant_arrays
                    else jax.device_put(v, self._input_shardings[k]))
                for k, v in feeds.items()
            }
            if labels is not None:
                labels = jax.device_put(labels, self._label_sharding)
        return feeds, labels

    def forward(self, feeds: Dict[str, Any], training: bool = False):
        """reference: FFModel::forward (model.cc:1416). Runs inference-style
        forward; for training use train_batch (fused fwd+bwd+update)."""
        assert self._compiled
        self._apply_packed_modes()
        ht = getattr(self, "_host_tail", None)
        if ht is not None:
            # read-only tail serve: no drop counting, no pending update
            feeds = {**feeds, **ht.build_feeds(feeds, train=False)}
        feeds, _ = self._stage(feeds)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), self._step_count)
        return self._forward_fn(self._params, feeds, training, rng)

    def train_batch(self, feeds: Dict[str, Any], labels) -> float:
        """One fused step = reference forward+zero_gradients+backward+update
        (the reference hot loop, dlrm.cc:162-183)."""
        assert self._compiled
        assert not getattr(self, "_tables_quantized", False), (
            "tables were quantized for serving (quantize_embeddings); "
            "training needs the f32 master tables"
        )
        self._apply_packed_modes()
        if self.config.host_routing and getattr(self, "_route_ops", None):
            feeds = {**feeds, **self.compute_routes(feeds)}
        ht = getattr(self, "_host_tail", None)
        if ht is not None:
            feeds = {**feeds, **ht.build_feeds(feeds)}
        feeds, labels = self._stage(feeds, labels)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), self._step_count)
        if ht is not None:
            (self._params, self._opt_state, self._metrics_total, loss,
             g_host) = self._train_step(
                self._params, self._opt_state, self._metrics_total, feeds,
                labels, rng,
            )
            # host half of the sparse update: SGD on the touched tail rows
            # at the current rate (reference: CPU-side embedding backward,
            # src/ops/embedding.cc)
            ht.apply_grads(
                {k: np.asarray(v) for k, v in g_host.items()},
                self._current_lr(),
            )
        else:
            (self._params, self._opt_state, self._metrics_total,
             loss) = self._train_step(
                self._params, self._opt_state, self._metrics_total, feeds,
                labels, rng,
            )
        self._step_count += 1
        return loss

    def _current_lr(self) -> float:
        """Scalar learning rate of the CURRENT step for the HOST-side row
        updates (LR schedules mutate the optimizer state after compile, so
        no compile-time snapshot). Mirrors the device step's rate choice: a
        DISTINCT sparse optimizer carries its own rate (train_step sets
        lr=None so the dense schedule does not leak onto the tables); only
        when the table rows ride the dense optimizer does the scheduled
        dense-state lr apply."""
        sopt = getattr(self, "sparse_optimizer", None)
        if sopt is not None and sopt is not self.optimizer:
            return float(getattr(sopt, "lr", self.config.learning_rate))
        st = self._opt_state
        if isinstance(st, dict):
            if "lr" in st:
                return float(np.asarray(st["lr"]))
            dense = st.get("dense")
            if isinstance(dense, dict) and "lr" in dense:
                return float(np.asarray(dense["lr"]))
        opt_for_rows = sopt or self.optimizer
        return float(getattr(opt_for_rows, "lr", self.config.learning_rate))

    def _setup_host_tail(self, plan) -> None:
        """Compile-time host-tail setup (see parallel/host_tail.py): run
        the graph pass, create the demand-allocated stores, register the
        runtime that builds (pos, val) feeds and applies tail grads."""
        from ..parallel.passes import offload_embedding_tails

        entries = offload_embedding_tails(self.graph, plan, self.config)
        if not entries:
            self._host_tail = getattr(self, "_host_tail", None)
            return
        # tail rows must follow the SAME rule as the device's hot prefix
        # (one table, one optimizer): plain SGD (-lr*g; the reference's
        # CPU-side embedding backward, src/ops/embedding.cc) and row-wise
        # AdaGrad (per-row accumulator in the store) are supported;
        # momentum/Adam would silently diverge — refuse instead
        row_opt = getattr(self, "sparse_optimizer", None) or self.optimizer
        from ..training.optimizer import (
            RowWiseAdagradOptimizer as _RWA,
            SGDOptimizer as _SGD,
        )

        if isinstance(row_opt, _RWA):
            rule, eps, acc0 = (
                "rowwise_adagrad", row_opt.epsilon,
                row_opt.initial_accumulator,
            )
        else:
            assert (
                isinstance(row_opt, _SGD)
                and row_opt.momentum == 0.0
                and row_opt.weight_decay == 0.0
            ), (
                "host-tail offload supports plain SGD or row-wise AdaGrad "
                f"row updates only (got {type(row_opt).__name__}); pass "
                "sparse_optimizer= one of those or disable "
                "host_tail_threshold"
            )
            rule, eps, acc0 = "sgd", 0.0, 0.0
        from ..parallel.host_tail import HostTailRuntime, HostTailStore

        rt = HostTailRuntime(rule=rule, epsilon=eps)
        for j, (op, sfeed, full, hot, k_cap) in enumerate(entries):
            # init scale mirrors the device hot prefix: the offload pass
            # rewrites a Glorot initializer to uniform(±limit) with the
            # FULL-table fan and records the limit; both halves then draw
            # from the same distribution
            scale = float(getattr(
                op, "host_tail_init_scale",
                np.sqrt(6.0 / (full + op.out_dim)),
            ))
            rt.add(
                op.name,
                HostTailStore(
                    op.out_dim, scale, seed=self.config.seed * 1000 + j,
                    acc_init=acc0,
                ),
                sfeed, hot, full, k_cap,
            )
        self._host_tail = rt

    @property
    def host_tail_dropped(self) -> int:
        ht = getattr(self, "_host_tail", None)
        return ht.dropped if ht is not None else 0

    def host_tail_drop_fraction(self) -> float:
        ht = getattr(self, "_host_tail", None)
        return ht.drop_fraction if ht is not None else 0.0

    def train_chunk(self, stacked_feeds: Dict[str, Any], stacked_labels) -> float:
        """Run K steps in one dispatch: inputs are [K, B, ...] stacks."""
        assert self._compiled
        assert not getattr(self, "_tables_quantized", False), (
            "tables were quantized for serving (quantize_embeddings); "
            "training needs the f32 master tables"
        )
        self._apply_packed_modes()
        assert self._multi_step is not None, (
            "host-tail offload steps per batch (the host serves tail rows "
            "between steps); use train_batch / fit(steps_per_call=1)"
        )
        if self._constant_arrays:
            k = int(stacked_labels.shape[0])
            for cname, arr in self._constant_arrays.items():
                if cname not in stacked_feeds:
                    stacked_feeds = {
                        **stacked_feeds,
                        cname: jnp.broadcast_to(arr, (k,) + arr.shape),
                    }
        if self._input_shardings is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def stage(v, name):
                if name in self._constant_arrays:
                    return jax.device_put(v, NamedSharding(self.mesh, P()))
                base = self._input_shardings[name].spec
                return jax.device_put(
                    v, NamedSharding(self.mesh, P(None, *base))
                )

            stacked_feeds = {k: stage(v, k) for k, v in stacked_feeds.items()}
            stacked_labels = jax.device_put(
                stacked_labels,
                NamedSharding(self.mesh, P(None, *self._label_sharding.spec)),
            )
        rng0 = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), self._step_count)
        self._params, self._opt_state, self._metrics_total, loss = self._multi_step(
            self._params, self._opt_state, self._metrics_total,
            stacked_feeds, stacked_labels, rng0,
        )
        self._step_count += int(stacked_labels.shape[0])
        return loss

    def eval_batch(self, feeds: Dict[str, Any], labels) -> float:
        assert self._compiled
        self._apply_packed_modes()
        ht = getattr(self, "_host_tail", None)
        if ht is not None:
            # read-only tail serve: no drop counting, no pending update
            feeds = {**feeds, **ht.build_feeds(feeds, train=False)}
        feeds, labels = self._stage(feeds, labels)
        self._metrics_total, loss = self._eval_step(
            self._params, self._metrics_total, feeds, labels
        )
        return loss

    def reset_metrics(self) -> None:
        """reference: FFModel::reset_metrics (model.h:508)."""
        self._metrics_total = metrics_lib.zero_perf_metrics(
            with_auc=bool(self.metrics_mask & MetricsType.METRICS_AUC_ROC)
        )

    def get_metrics(self) -> Dict[str, float]:
        """reference: FFModel::get_metrics (model.h:513) + PerfMetrics print."""
        return metrics_lib.summarize(
            jax.tree_util.tree_map(np.asarray, self._metrics_total), self.metrics_mask
        )

    # ------------------------------------------------------------------ loops
    def fit(
        self,
        feeds: Dict[str, np.ndarray],
        labels: np.ndarray,
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        verbose: bool = True,
        callbacks: Sequence = (),
        steps_per_call: int = 1,
        shuffle: bool = False,
        validation_data=None,
    ) -> Dict[str, float]:
        """Keras-style loop (reference: base_model.py:195-424): slice host
        arrays into batches, run fused steps, print PerfMetrics per
        print_freq, report throughput after a warmup epoch like the
        reference's DLRM driver (dlrm.cc:150-194)."""
        assert self._compiled
        epochs = epochs or self.config.epochs
        bs = batch_size or self.config.batch_size
        from ..data.loader import DataLoader

        loader = DataLoader(feeds, labels, bs, shuffle=shuffle, seed=self.config.seed)
        steps = loader.steps_per_epoch
        history: Dict[str, float] = {}
        warm_time = None
        for cb in callbacks:
            cb.on_train_begin(self)
        if self.config.profiling and self.mesh is None:
            # reference: OpMeta.profiling per-op timing prints
            # ("[Linear] forward time = ..."), SURVEY §5(a)
            from ..utils.profiling import op_timing_report, print_op_timings

            first, first_l = next(iter(loader.epoch()))
            print_op_timings(op_timing_report(self, first, reps=3, warmup=1))
        stop = False
        for epoch in range(epochs):
            for cb in callbacks:
                cb.on_epoch_begin(self, epoch)
            self.reset_metrics()
            t0 = time.time()
            if steps_per_call > 1:
                i = 0
                for sfeeds, slabels in loader.stacked_epoch(steps_per_call):
                    loss = self.train_chunk(sfeeds, slabels)
                    i += slabels.shape[0]
                    if verbose and (i // steps_per_call) % max(self.config.print_freq, 1) == 0:
                        m = self.get_metrics()
                        msg = " ".join(f"{k}={v:.6g}" for k, v in m.items())
                        print(f"epoch {epoch} step {i}/{steps} loss={float(loss):.6g} {msg}")
            else:
                for i, (batch, lbl) in enumerate(loader.epoch()):
                    loss = self.train_batch(batch, lbl)
                    if verbose and (i % max(self.config.print_freq, 1) == 0):
                        m = self.get_metrics()
                        msg = " ".join(f"{k}={v:.6g}" for k, v in m.items())
                        print(f"epoch {epoch} step {i}/{steps} loss={float(loss):.6g} {msg}")
            # force completion before timing (block_until_ready does not
            # synchronize through remote-tunnel backends)
            _ = float(jnp.sum(self._metrics_total["train_all"]))
            dt = time.time() - t0
            if epoch == 0:
                warm_time = dt
            history = self.get_metrics()
            history["epoch_time_s"] = dt
            history["throughput"] = steps * bs / dt
            if validation_data is not None:
                # keras parity: per-epoch validation pass, reported as val_*;
                # training metric totals are preserved around it
                vx, vy = validation_data
                assert vy.shape[0] >= bs, (
                    f"validation set ({vy.shape[0]}) smaller than one batch ({bs})"
                )
                train_totals = self._metrics_total
                val = self.evaluate(vx, vy, batch_size=bs)
                self._metrics_total = train_totals
                history.update({f"val_{k}": v for k, v in val.items()})
            if verbose:
                print(
                    f"epoch {epoch} done in {dt:.2f}s "
                    f"throughput={history['throughput']:.1f} samples/s"
                )
            for cb in callbacks:
                stop = cb.on_epoch_end(self, epoch, history) or stop
            if stop:
                break
        if warm_time is not None:
            history["first_epoch_time_s"] = warm_time
        for cb in callbacks:
            cb.on_train_end(self, history)
        return history

    def evaluate(
        self,
        feeds: Dict[str, np.ndarray],
        labels: np.ndarray,
        batch_size: Optional[int] = None,
    ) -> Dict[str, float]:
        assert self._compiled
        bs = batch_size or self.config.batch_size
        n = labels.shape[0]
        steps = n // bs
        assert steps > 0, f"evaluate: dataset ({n}) smaller than one batch ({bs})"
        self.reset_metrics()
        for i in range(steps):
            sl = slice(i * bs, (i + 1) * bs)
            batch = {k: v[sl] for k, v in feeds.items()}
            self.eval_batch(batch, labels[sl])
        return self.get_metrics()

    def predict(
        self,
        feeds: Dict[str, np.ndarray],
        batch_size: Optional[int] = None,
    ) -> np.ndarray:
        """Serving entry for an ARBITRARY number of examples: inputs are
        chunked to the compiled batch size and the last partial chunk is
        padded by repeating its final row (valid indices, static XLA
        shapes — no per-remainder recompile) then trimmed. The reference's
        keras predict drops remainders; serving cannot."""
        assert self._compiled
        bs = batch_size or self.config.batch_size
        n = next(iter(feeds.values())).shape[0]
        assert n > 0, "predict: empty input"
        outs = []
        for i in range(0, n, bs):
            chunk = {k: v[i : i + bs] for k, v in feeds.items()}
            m = next(iter(chunk.values())).shape[0]
            if m < bs:
                chunk = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], bs - m, axis=0)], axis=0
                    )
                    for k, v in chunk.items()
                }
            y = self.forward(chunk, training=False)
            outs.append(np.asarray(y)[:m])
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------ state IO
    def get_parameters(self):
        return self._params

    def quantize_embeddings(self, dtype: str = "bfloat16") -> int:
        """Serving-side table quantization (beyond the reference):
        "bfloat16"/"float16" cast every embedding table in place (2x less
        table HBM, 2x effective row-gather bandwidth); "int8" rewrites
        each table as int8 rows + per-row f32 scales (4x; the production
        serving format — dequant rides the lookup). Training needs the
        f32 master tables, so train_batch/train_chunk refuse afterwards
        (re-compile or set_parameters to restore). Returns the number of
        arrays touched."""
        assert self._compiled
        n = 0
        new_params = dict(self._params)
        for op in self.graph.compute_ops:
            if op.op_type is not OperatorType.OP_EMBEDDING:
                continue
            sub = dict(new_params.get(op.name, {}))
            if dtype == "int8":
                from ..ops.embedding import quantize_table_int8

                if "pool" in sub:
                    # fused EmbeddingCollection: quantize the flat pool
                    # (serving is single-chip/per-replica; the sharded
                    # exchange paths have no int8 dequant)
                    lay = op.layout
                    if (
                        self.mesh is not None
                        and self.mesh.shape.get(
                            getattr(self.plan, "batch_axis", "data"), 1
                        ) > 1
                    ):
                        raise ValueError(
                            "int8 serving for a SHARDED embedding "
                            "collection is not supported; quantize a "
                            "single-chip (or per-replica) model instead"
                        )
                    flat = sub.pop("pool").astype(jnp.float32).reshape(
                        lay.num_shards * lay.r_pad, lay.dim
                    )
                    q, s = quantize_table_int8(flat, False)
                    sub["pool_q"] = q
                    sub["pool_scale"] = s
                    n += 1
                    new_params[op.name] = sub
                    continue
                if "weight" not in sub:
                    continue
                w = sub.pop("weight")
                packed = bool(getattr(op, "packed", False))
                if packed:
                    from ..ops.pallas.packed_update import unpack_table

                    w = unpack_table(w, op.num_entries, op.out_dim)
                q, s = quantize_table_int8(
                    w, packed, getattr(op, "chunk_packs", 1024)
                )
                sub["weight_q"] = q
                sub["weight_scale"] = s
                n += 1
            else:
                jdt = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}[dtype]
                for k, v in list(sub.items()):
                    if hasattr(v, "dtype") and v.dtype == jnp.float32:
                        sub[k] = v.astype(jdt)
                        n += 1
            new_params[op.name] = sub
        self._params = new_params
        self._tables_quantized = n > 0
        return n

    def set_parameters(self, params) -> None:
        """reference: Parameter::set_weights numpy round trip
        (src/runtime/model.cu:338-467)."""
        self._params = jax.tree_util.tree_map(jnp.asarray, params)

    def _op_by_name(self, op_name: str):
        for op in self.graph.compute_ops:
            if op.name == op_name:
                return op
        return None

    def get_weights(self, op_name: str):
        """Per-op weight dict as host numpy, in the op's LOGICAL shapes
        (packed-layout tables are unpacked to [vocab, dim]; reference:
        Parameter::get_weights, flexflow_cffi.py:660-694)."""
        import numpy as _np

        sub = self._params[op_name]
        op = self._op_by_name(op_name)
        if op is not None and getattr(op, "packed", False):
            sub = op.unpack_params(sub)
        return {k: _np.asarray(v) for k, v in sub.items()}

    def set_weights(self, op_name: str, weights) -> None:
        """Per-op weight update; logical shapes accepted for packed tables
        (reference: Parameter::set_weights replica-aware IO, model.cu:338)."""
        op = self._op_by_name(op_name)
        if op is not None and getattr(op, "packed", False) and "weight" in weights:
            w = jnp.asarray(weights["weight"], jnp.float32)
            if w.shape == (op.num_entries, op.out_dim):
                from ..ops.pallas.packed_update import pack_table

                weights = {**weights, "weight": pack_table(w, op.chunk_packs)}
        cur = self._params[op_name]
        new = {}
        for k, v in cur.items():
            if k in weights:
                arr = jnp.asarray(weights[k], v.dtype)
                assert arr.shape == v.shape, (
                    f"{op_name}/{k}: shape {arr.shape} != {v.shape}"
                )
                if getattr(v, "sharding", None) is not None and self.mesh is not None:
                    arr = jax.device_put(arr, v.sharding)
                new[k] = arr
            else:
                new[k] = v
        self._params = {**self._params, op_name: new}

    def calibrate_step_residual(self, feeds, labels, steps: int = 8,
                                machine=None, cache_path: str = ""):
        """Close the profile-then-simulate loop over the FULL step
        (reference analog: the simulator is trusted because every cost is
        measured, model.cu:20-64 — here the per-kernel constants come from
        calibrate*(), and this measures the compiled multi-step scan and
        stores measured/predicted as the machine's step residual, cached
        for future searches). Returns (residual, measured_us, predicted_us).
        """
        self._apply_packed_modes()
        import time as _time

        from ..autotune.machine import MachineSpec, preset
        from ..autotune.search import autotune_plan_joint

        assert self._compiled
        if machine is None:
            import os as _os

            cache_path = cache_path or ".ffsim_machine.json"
            if _os.path.exists(cache_path):
                machine = MachineSpec.from_file(cache_path)
            else:
                machine = preset("tpu_v5e")
            machine = machine.torus_for(1)
        bs = self.config.batch_size
        # pre-stage the stacked batch ON DEVICE once: host->device transfer
        # must stay outside the timed region (the bench's ZCM protocol),
        # and the warmup must reuse the exact compiled executable
        stacked = {
            k: jnp.asarray(
                np.broadcast_to(v, (steps,) + np.asarray(v).shape)
            )
            for k, v in feeds.items()
        }
        slabels = jnp.asarray(
            np.broadcast_to(labels, (steps,) + np.asarray(labels).shape)
        )
        rng0 = jax.random.PRNGKey(self.config.seed)
        assert self._multi_step is not None, (
            "calibrate_step_residual needs the scanned multi-step path; "
            "host-tail models step per batch (host intervenes between steps)"
        )
        # timing must not perturb the live model: the jitted multi-step
        # DONATES its state args (compile's donate=True default), so run on
        # COPIES — snapshotting the live arrays and restoring them would
        # hand back deleted buffers after donation. Each timed run feeds the
        # previous run's outputs (fresh buffers, identical shapes/shardings).
        state = jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x,
            (self._params, self._opt_state, self._metrics_total),
        )

        def run(state):
            p, o, t, loss = self._multi_step(*state, stacked, slabels, rng0)
            float(loss)  # host readback = device-sync point
            return (p, o, t)

        state = run(state)  # compile + warm
        from ..autotune.machine import measure_dispatch_latency

        # the timed region carries ONE dispatch+readback round trip
        # (~2.5-26 ms through a remote tunnel) — subtract it or small
        # step counts inflate the measured per-step time
        dispatch_s = measure_dispatch_latency()
        t0 = _time.perf_counter()
        run(state)
        measured_us = max(
            (_time.perf_counter() - t0 - dispatch_s) / steps * 1e6, 1.0
        )
        _, pred_us, _ = autotune_plan_joint(
            self.graph, machine, bs, budget=1,
            min_vocab=self.config.onehot_embedding_threshold,
            exchange_dtype_bytes=(
                2.0 if self.config.compute_dtype in ("bfloat16", "float16")
                else 4.0
            ),
            table_dtype_bytes=(
                2.0 if self.config.table_dtype == "bfloat16" else 4.0
            ),
        )
        residual = measured_us / max(pred_us, 1e-9)
        machine.step_residual = residual
        if cache_path:
            machine.save(cache_path)
        return residual, measured_us, pred_us

    def routed_drop_fraction(self, feeds) -> float:
        """Per-batch dropped-lookup fraction under the routed exchange's
        capacity buckets (0.0 when the exchange is dense/exact). The
        observability counter for the routed mode's quantified accuracy
        cost (see parallel/routed_exchange.routed_drop_stats)."""
        import numpy as _np

        lay = getattr(self, "_embedding_layout", None)
        if lay is None or lay.exchange != "routed" or lay.routed_cap_factor <= 0:
            return 0.0
        from ..parallel.routed_exchange import routed_drop_stats

        coll = next(
            (op for op in self.graph.compute_ops
             if op.name == "embedding_collection"), None,
        )
        if coll is None:
            return 0.0
        idx = _np.stack(
            [
                _np.asarray(feeds[t.owner_op.name]).reshape(
                    len(feeds[t.owner_op.name]), -1
                )
                for t in coll.inputs
            ],
            axis=1,
        )
        _, _, frac = routed_drop_stats(lay, idx)
        return float(frac)

    def compute_routes(self, feeds) -> Dict[str, Any]:
        """HOST-side routing metadata for the packed embedding update (the
        sort order / pack positions / chunk starts are pure functions of
        the indices): computed off the device's critical path by the input
        pipeline (ffdata threaded radix sort) and attached to the batch
        under reserved '_route:<op>:<field>' keys. The jitted step then
        skips its on-device bitonic sort."""
        import numpy as _np

        from ..ops.pallas.packed_update import host_pack_routes

        out: Dict[str, Any] = {}
        for op in getattr(self, "_route_ops", []) or []:
            idx = _np.asarray(feeds[op.inputs[0].owner_op.name])
            rows = _np.where(idx >= 0, idx, op.num_entries).reshape(-1)
            o, enc, st = host_pack_routes(
                rows, op.num_entries, op.out_dim, op.chunk_packs
            )
            pre = f"_route:{op.name}:"
            out[pre + "order"] = o
            out[pre + "enc"] = enc
            out[pre + "starts"] = st
        return out

    def set_learning_rate(self, lr: float) -> None:
        """reference: Optimizer::set_learning_rate exposed to Keras LR
        schedulers (callbacks.py:49-63). The rate lives in optimizer state,
        so no recompilation happens."""
        assert self._compiled
        import jax.numpy as _jnp

        st = dict(self._opt_state)
        if "dense" in st and isinstance(st["dense"], dict) and "lr" in st["dense"]:
            st["dense"] = {**st["dense"], "lr": _jnp.float32(lr)}
        elif "lr" in st:
            st["lr"] = _jnp.float32(lr)
        self._opt_state = st

    def get_learning_rate(self) -> float:
        st = self._opt_state
        if "dense" in st and isinstance(st["dense"], dict) and "lr" in st["dense"]:
            return float(st["dense"]["lr"])
        return float(st.get("lr", 0.0))

    def set_iteration_config_sequence_length(self, seq_length: int) -> None:
        """reference: model.h:551. Changing it triggers a re-trace (new static
        shapes), the XLA analog of the reference's runtime extent adjustment."""
        self.iter_config.seq_length = seq_length
