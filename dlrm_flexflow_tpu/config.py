"""Runtime configuration + CLI parsing.

TPU-native analog of the reference's FFConfig (reference: include/config.h:98-154,
defaults src/runtime/model.cc:2212-2235, parser src/runtime/model.cc:2282+).
Legion `-ll:*` resource flags have no TPU meaning; their role (how many devices,
how much device memory) is played by mesh flags here.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass
class FFConfig:
    # --- training loop (reference: config.h:112-120) ---
    epochs: int = 1
    batch_size: int = 64
    print_freq: int = 10
    # --- optimizer defaults (consumed by SGDOptimizer ctor) ---
    learning_rate: float = 0.01
    weight_decay: float = 0.0001
    # --- dataset ---
    dataset_path: str = ""
    # --- devices / mesh (replaces -ll:gpu/-ll:cpu/--nodes) ---
    num_nodes: int = 1
    devices_per_node: int = -1  # -1 => all local devices
    mesh_shape: Optional[Tuple[int, ...]] = None  # overrides (nodes, chips)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # chips per host for the hierarchical pooled-embedding exchange
    # (ICI-combine-then-DCN, parallel/embedding_collection.py); 0 = flat.
    chips_per_host: int = 0
    # --- auto-parallelization search (reference: config.h:125-130) ---
    search_budget: int = 0
    search_alpha: float = 0.05
    search_overlap_backward_update: bool = False
    enable_parameter_parallel: bool = False
    enable_attribute_parallel: bool = False
    enable_propagation: bool = False
    import_strategy_file: str = ""
    export_strategy_file: str = ""
    export_strategy_task_graph_file: str = ""
    # --- simulator / machine model (reference: config.h:133-139) ---
    machine_model_version: int = 0
    machine_model_file: str = ""
    simulator_segment_size: int = 16777216
    simulator_max_num_segments: int = 1
    # --- execution knobs ---
    profiling: bool = False
    perform_fusion: bool = False  # XLA fuses; flag kept for parity/reporting
    # Fuse same-dim tables into one pooled collection even without a mesh.
    # Off by default on one chip: XLA's scatter/gather on a single
    # [sum_vocab, small_D] pool relayouts to (8,128) tiles (8x padded copies
    # for D=16), measured slower than per-table params; the sharded path
    # always fuses (the all-to-all needs the collection).
    fuse_embeddings: bool = False
    # Embedding tables with vocab <= this use one-hot MXU matmuls (stream
    # the table) instead of HBM gathers; their grads stay dense. 0 = off.
    onehot_embedding_threshold: int = 8192
    # Mid-band extension of the one-hot path over PACKED tables: vocab in
    # (onehot_embedding_threshold, this] contracts onehot[B, V/rpp] @
    # packed[V/rpp, 128] — all 128 MXU lanes live (the narrow one-hot
    # wastes 128/D of them), so the profitable vocab grows by rpp=128/D.
    # Dense [P, 128] grads; these tables skip the gather AND the
    # update-stream machinery. 0 = off. Requires 128 % dim == 0 and a
    # pooling aggregation.
    onehot_packed_threshold: int = 0
    allow_tensor_op_math: bool = True  # => bf16 matmuls on MXU
    # Pallas kernel routing: "auto" uses hand-written kernels only where they
    # measured faster than XLA on TPU (scripts/microbench_pallas.py decides;
    # currently: dot-interaction at D>=128), "on" forces them everywhere
    # they exist, "off" is pure XLA.
    use_pallas: str = "auto"
    # Packed-layout embedding tables ([V*D/128, 128] canonical storage) +
    # the Pallas packed-update kernel replacing the XLA scatter on the
    # sparse path (ops/pallas/packed_update.py; measured 19x on the kaggle
    # update phase). "auto" = on when the backend is TPU, "on" forces it
    # (interpret-mode kernels off-TPU — test only), "off" disables.
    packed_tables: str = "auto"
    # "auto" packs a table only when its per-step update stream has at
    # least this many rows (batch * bag): below it the stream-sort and
    # table-pass fixed costs lose to the XLA scatter they replace. Round-5
    # re-measurement (bf16 tables + selective/manual dispatch, Zipf 1.05):
    # packed wins 1.45x at 8192 and ties at 4096 (round-2 crossover was
    # 8k-16k); "on" ignores the threshold
    packed_min_rows: int = 4096
    # pooled-embedding exchange mode for the sharded collection: "dense"
    # slot exchange or "routed" capacity buckets (scale-out mode; wire and
    # per-chip work independent of split degree). Plan-level setting wins.
    exchange: str = "dense"
    # input pipeline precomputes the packed-update routing metadata
    # (sort order / pack positions / chunk starts) on the HOST so the
    # device step skips its stream sort (train_batch/fit path; bench
    # has --host-routing)
    host_routing: bool = False
    # host-tail embedding offload (parallel/host_tail.py): tables with
    # vocab above this keep exactly `threshold` hot rows on the device and
    # the cold tail in a demand-allocated host store (0 = off). The
    # beyond-HBM axis of the reference's hetero CPU placement
    # (dlrm_strategy_hetero.cc); plan.host_tail_rows overrides per table.
    host_tail_threshold: int = 0
    # static capacity of the per-table (pos, val) tail exchange as a
    # fraction of batch*bag; overflow drops that step's extra partials
    # (counted in FFModel.host_tail_dropped)
    host_tail_cap_frac: float = 0.0625
    # packed-table row-gather implementation (ops/pallas/packed_update):
    # "pack" fetches whole 512 B packs + mask, "subpack" a (1, D) lane
    # slice per row (8x fewer logical bytes at D=16); "auto" defers to the
    # gather calibration's measured winner (machine.gather_mode)
    packed_gather_mode: str = "auto"
    # packed update-stream format: "expanded" ships lane-expanded [K, 128]
    # delta tiles; "compact" ships dense-packed [K/rpp, 128] and the kernel
    # expands lanes itself (rpp-fold less stream HBM traffic, no XLA-side
    # lane_expand materialization); "auto" = calibrated winner
    # (machine.stream_mode)
    packed_stream_mode: str = "auto"
    # touched-chunk selective dispatch for the packed update kernel: "on"
    # routes the update grid through only the chunks that received entries
    # (table read+write HBM ∝ touched chunks — matches the reference
    # backward's ∝-batch cost, src/ops/embedding.cu:192-217, under skewed
    # index distributions); "off" reproduces the full-table pass (A/B)
    packed_selective: str = "on"
    # TRAINING storage dtype for packed sparse embedding tables
    # ("float32" | "bfloat16"). bf16 halves the two biggest HBM pools of
    # the DLRM step — the forward row gathers and the update kernel's
    # table pass — at the cost of bf16 rounding on each row write (the
    # one-hot MXU kernel still accumulates f32 and the optimizer
    # side pools — Adam m/v, momentum velocity, AdaGrad accumulators —
    # stay f32). Serving-time quantization is separate
    # (FFModel.quantize_embeddings). Dense params are unaffected.
    table_dtype: str = "float32"
    compute_dtype: str = "bfloat16"  # activations/matmul dtype; params stay f32
    seed: int = 42
    # --- runtime-adjustable iteration config (reference: config.h:156-161) ---
    seq_length: int = -1

    @property
    def num_devices(self) -> int:
        import jax

        if self.mesh_shape is not None:
            n = 1
            for d in self.mesh_shape:
                n *= d
            return n
        per_node = self.devices_per_node
        if per_node == -1:
            return len(jax.devices())
        return self.num_nodes * per_node

    def machine_cache_path(self) -> str:
        """The machine-calibration cache location — ONE derivation shared
        by compile()'s mode reader and the calibration writer so they can
        never diverge."""
        return self.machine_model_file or (
            self.export_strategy_file + ".machine.json"
            if self.export_strategy_file
            else ".ffsim_machine.json"
        )

    @staticmethod
    def parse_args(argv: Optional[Sequence[str]] = None) -> "FFConfig":
        cfg = FFConfig()
        cfg.update_from_args(argv)
        return cfg

    def update_from_args(self, argv: Optional[Sequence[str]] = None) -> List[str]:
        """Consume known flags (reference flag spelling, model.cc:2282); return the rest."""
        import sys

        args = list(sys.argv[1:] if argv is None else argv)
        rest: List[str] = []
        i = 0

        def take() -> str:
            nonlocal i
            i += 1
            return args[i]

        while i < len(args):
            a = args[i]
            if a in ("-e", "--epochs"):
                self.epochs = int(take())
            elif a in ("-b", "--batch-size"):
                self.batch_size = int(take())
            elif a in ("--lr", "--learning-rate"):
                self.learning_rate = float(take())
            elif a in ("--wd", "--weight-decay"):
                self.weight_decay = float(take())
            elif a in ("-p", "--print-freq"):
                self.print_freq = int(take())
            elif a in ("-d", "--dataset"):
                self.dataset_path = take()
            elif a == "--budget" or a == "--search-budget":
                self.search_budget = int(take())
            elif a == "--alpha" or a == "--search-alpha":
                self.search_alpha = float(take())
            elif a == "--search-overlap-backward-update":
                self.search_overlap_backward_update = True
            elif a == "--import" or a == "--import-strategy":
                self.import_strategy_file = take()
            elif a == "--export" or a == "--export-strategy":
                self.export_strategy_file = take()
            elif a == "--taskgraph" or a == "--export-strategy-task-graph-file":
                self.export_strategy_task_graph_file = take()
            elif a == "--enable-parameter-parallel":
                self.enable_parameter_parallel = True
            elif a == "--enable-attribute-parallel":
                self.enable_attribute_parallel = True
            elif a == "--enable-propagation":
                self.enable_propagation = True
            elif a == "--nodes":
                self.num_nodes = int(take())
            elif a == "--devices-per-node" or a == "-ll:gpu":
                self.devices_per_node = int(take())
            elif a == "--mesh":
                self.mesh_shape = tuple(int(x) for x in take().split("x"))
            elif a == "--chips-per-host":
                self.chips_per_host = int(take())
            elif a == "--profiling":
                self.profiling = True
            elif a == "--fusion":
                self.perform_fusion = True
            elif a == "--allow-tensor-op-math":
                self.allow_tensor_op_math = True
            elif a == "--compute-dtype":
                self.compute_dtype = take()
            elif a == "--use-pallas":
                self.use_pallas = take()
            elif a == "--packed-tables":
                self.packed_tables = take()
            elif a == "--exchange":
                self.exchange = take()
            elif a == "--host-routing":
                self.host_routing = True
            elif a == "--host-tail-threshold":
                self.host_tail_threshold = int(take())
            elif a == "--host-tail-cap-frac":
                self.host_tail_cap_frac = float(take())
            elif a == "--packed-gather-mode":
                self.packed_gather_mode = take()
            elif a == "--packed-stream-mode":
                self.packed_stream_mode = take()
            elif a == "--packed-selective":
                self.packed_selective = take()
            elif a == "--table-dtype":
                self.table_dtype = take()
            elif a == "--machine-model-version":
                self.machine_model_version = int(take())
            elif a == "--machine-model-file":
                self.machine_model_file = take()
            elif a == "--simulator-segment-size":
                self.simulator_segment_size = int(take())
            elif a == "--simulator-max-num-segments":
                self.simulator_max_num_segments = int(take())
            elif a == "--seed":
                self.seed = int(take())
            else:
                rest.append(a)
            i += 1
        return rest


@dataclasses.dataclass
class FFIterationConfig:
    """Per-iteration runtime knobs (reference: include/config.h:156-161).

    seq_length < 0 means "use full tensor extents". Consumed by BatchMatmul
    and attention-adjacent ops exactly like the reference's
    iter_config.seq_length (src/ops/batch_matmul.cu:21-43).
    """

    seq_length: int = -1

    def reset(self) -> None:
        self.seq_length = -1
