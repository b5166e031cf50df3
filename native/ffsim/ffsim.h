// ffsim: TPU cost model + event-driven step simulator + MCMC placement
// search for the dlrm_flexflow_tpu autotuner.
//
// Native C++ analog of the reference's auto-parallelization engine
// (reference: src/runtime/simulator.cc — task-graph simulation + memory
// penalty; src/runtime/machine_model.cc — device/link models;
// src/runtime/model.cc:1928 FFModel::optimize — MCMC). The reference
// profiles CUDA kernels and simulates Legion region copies; this core
// scores sharding plans with a TPU roofline (MXU flops, HBM GB/s) plus a
// ring-collective model over ICI/DCN, with measured-calibration hooks fed
// from Python.
//
// Flat C ABI: callers pass plain arrays (ctypes-friendly).
#pragma once
#include <cstdint>

extern "C" {

// ---- machine description (≅ reference MachineModel / machine config file)
struct FFSimMachine {
  int32_t num_chips;          // chips in the mesh (data axis)
  int32_t chips_per_host;     // ICI domain size; inter-host traffic -> DCN
  double mxu_tflops;          // dense bf16 TFLOP/s per chip
  double hbm_gbps;            // HBM bandwidth per chip, GB/s
  double hbm_capacity_gb;     // usable HBM per chip
  double ici_gbps;            // per-link ICI bandwidth, GB/s (one direction)
  double ici_latency_us;      // per-hop latency
  double dcn_gbps;            // per-host DCN bandwidth
  double dcn_latency_us;
  // calibration: effective random-gather bandwidth for embedding rows
  // (measured; far below hbm_gbps because of short rows)
  double gather_gbps;
  double scatter_gbps;
  // fixed per-step overhead (dispatch, host) in us
  double step_overhead_us;
  // message segmentation (reference: --simulator-segment-size /
  // --simulator-max-num-segments, simulator.cc:218-288): collectives are
  // chunked; each segment pays the hop latency but segments pipeline
  double segment_bytes;
  double max_segments;
  // overlap gradient allreduce with backward compute (reference:
  // --search-overlap-backward-update): 1.0 = fully overlapped
  double overlap_backward_update;
  // >0: pooled exchange is hierarchical (intra-host ICI combine of split
  // partials, then one row per (ICI-domain, table) over DCN —
  // parallel/embedding_collection.py); 0: flat all-to-all where every
  // slot's dense [batch] partial crosses the slow link
  double hierarchical_a2a;
  // ---- v2 fields (topology-aware model + packed-update + DAG scoring) ----
  // ICI torus geometry of one slice: x*y chips (y=1 -> 1D ring). All-to-all
  // and allreduce costs derive from per-axis bisection, NOT chip count
  // (reference analog: EnhancedMachineModel per-link paths,
  // include/simulator.h:153-236).
  int32_t ici_axis_x;
  int32_t ici_axis_y;
  // chips per ICI domain (slice). A v5e-64 is ONE 8x8 slice: all 64 chips
  // ICI-connected; DCN only beyond a slice. 0 => num_chips (single slice).
  int32_t ici_domain;
  // packed-update kernel model (ops/pallas/packed_update.py): sequential
  // table-pass bandwidth and per-lookup overhead (sort/prep amortized).
  // update_pass_gbps==0 => legacy scatter model (scatter_gbps).
  double update_pass_gbps;
  double update_ns_per_row;
  double update_us_per_table;  // per-sub-table fixed cost (kernel launch,
                               // chunk-starts prep) — NOT bytes-proportional
  // 1 => score with the event-driven DAG schedule of the step (overlap of
  // a2a with bottom-MLP compute, allreduce with embedding update);
  // 0 => closed-form serial sum (v1 behavior)
  int32_t use_dag;
  // routed (capacity-bucketed) exchange model (parallel/routed_exchange.py):
  // wire = cap * lookups * (idx + 2*row) bytes per chip, independent of the
  // split degree, plus a per-entry routing cost (batched sort + bucket
  // slices). 0 = dense slot exchange (slot_payload model).
  int32_t routed_exchange;
  double routed_cap;            // capacity factor (default 2)
  double routing_ns_per_entry;  // per lookup-entry routing cost
  // model-axis size available for dense tensor parallelism (mesh data x
  // model); 1 = pure DP mesh
  int32_t model_axis;
  // host-tail offload terms (parallel/host_tail.py; table mode 2): the
  // host<->device link carrying the compact (pos, val) tail exchange and
  // the per-row host-side lookup/update cost (reference analog: zero-copy
  // host embedding placement, dlrm_strategy_hetero.cc + CPU EmbeddingBag
  // src/ops/embedding.cc:23-319)
  double pcie_gbps;
  double pcie_latency_us;
  double host_row_ns;
  // dense-parameter sync mode comparison (reference: the simulator models
  // BOTH parameter-server sync — barriers + pinned update + per-worker
  // comm, simulator.cc:403-498 — and NCCL allreduce, :561-604).
  // 0 = allreduce (what the runtime implements: XLA psum over ICI);
  // 1 = parameter server: every chip ships dense grads to a host-pinned
  // server over the host link and receives updated params back (2*n*P
  // bytes through ONE link), with the optimizer update on the host.
  // Kept for cost comparison only — ffsim2_breakdown under param_sync=1
  // shows why allreduce wins on a torus (tests/test_autotune2.py).
  int32_t param_sync;
  double ps_gbps;  // server link + host update bandwidth; 0 => pcie_gbps
};

// ---- op kinds
enum FFSimOpKind : int32_t {
  FFSIM_DENSE = 0,      // data-parallel compute (MLP layer, interaction...)
  FFSIM_EMBED = 1,      // one embedding table (placement variable)
  FFSIM_OTHER = 2,      // elementwise etc., data-parallel
};

// One op per entry. Costs are TOTALS for the global batch, fwd only;
// the simulator derives bwd = 2x fwd flops (dense) and update costs.
struct FFSimOp {
  int32_t kind;
  double flops;        // fwd floating ops (global batch)
  double bytes;        // fwd HBM bytes touched (global batch)
  double param_bytes;  // parameter size (per replica)
  // embedding-only fields
  double table_rows;   // vocab size
  double row_bytes;    // dim * dtype_bytes
  double lookups;      // global batch * bag (rows gathered per step)
  double pooled_rows;  // pooled exchange rows per slot = global batch
                       // (0 => legacy fallback to `lookups`)
  double sub_count;    // row-split degree of the owning table (slots/table)
  double wire_row_bytes;  // pooled-row bytes ON THE WIRE (compute dtype,
                          // e.g. bf16 = dim*2; 0 => row_bytes, i.e. f32)
  // ---- v2 fields ----
  // graph stage for the DAG builder: 0 = before the pooled exchange
  // (bottom MLP — overlaps the fwd all-to-all), 1 = after it
  // (interaction + top MLP), 2 = anywhere
  int32_t stage;
  double act_bytes;    // fwd output activation bytes (global batch) — the
                       // TP activation-psum volume
  // MEASURED single-chip fwd time (us, global batch, bwd = 2x) from the
  // dense-op calibration (reference: real kernels timed per (op, config),
  // src/runtime/model.cu:20-64). 0 => analytic roofline.
  double fwd_us;
  // host-tail candidacy (embedding ops; search mode 2 is viable only when
  // tail_hot_rows > 0): modeled device-resident hot-prefix length, and the
  // fraction of lookups landing in the tail rows [hot, vocab)
  // (frequency-ordered ids make this small — Zipf estimate or measured)
  double tail_hot_rows;
  double tail_miss_frac;
  // packed-table STORAGE bytes per row (config.table_dtype; bf16 = dim*2).
  // 0 => row_bytes (f32). Halves the forward-gather and update-pass HBM
  // terms without touching the f32 optimizer side pools.
  double table_row_bytes;
  // expected fraction of update-kernel chunks touched by one step's
  // lookups (selective dispatch, ops/pallas/packed_update.py): the table
  // read+write pass scales by this. 0 => 1.0 (full pass / unknown).
  double upd_touched_frac;
};

// ---- simulate one training step under a table placement --------------------
// owner[i] in [0, num_chips) for each op with kind==FFSIM_EMBED (indexed by
// its position among embedding ops); ignored for other ops.
// Returns predicted step time in microseconds (including memory penalty).
double ffsim_simulate(const FFSimMachine* m,
                      const FFSimOp* ops, int32_t num_ops,
                      const int32_t* table_owner, int32_t num_tables,
                      double opt_state_factor /* e.g. 1.0 SGD, 2.0 rowwise-adagrad */);

// Detailed breakdown (all us): out[0]=dense, out[1]=embed_max_chip,
// out[2]=all2all, out[3]=allreduce, out[4]=update, out[5]=mem_penalty_us,
// out[6]=total.
void ffsim_breakdown(const FFSimMachine* m,
                     const FFSimOp* ops, int32_t num_ops,
                     const int32_t* table_owner, int32_t num_tables,
                     double opt_state_factor, double* out7);

// ---- MCMC placement search (≅ FFModel::optimize, model.cc:1928-1991) ------
// Starts from `owner` (in/out). budget = iterations, alpha = acceptance
// temperature (reference --search-alpha). Seeded deterministic RNG.
// Returns best makespan us; best assignment written back into owner.
double ffsim_mcmc_search(const FFSimMachine* m,
                         const FFSimOp* ops, int32_t num_ops,
                         int32_t* owner, int32_t num_tables,
                         double opt_state_factor,
                         int64_t budget, double alpha, uint64_t seed,
                         // optional iteration log: every log_every iters
                         // writes current best into log_buf (may be null)
                         int64_t log_every, double* log_buf, int64_t log_cap);

// Event-driven generic DAG scheduler (≅ simulator.cc:500-560): tasks with
// durations, device ids (or -1 for "all-device collective"), and dependency
// edges. Returns makespan. Exposed for cost-model unit tests and future
// non-DLRM graphs.
double ffsim_schedule_dag(int32_t num_devices,
                          const double* durations_us, const int32_t* device_of,
                          int32_t num_tasks,
                          const int32_t* edge_src, const int32_t* edge_dst,
                          int32_t num_edges);

// ======================= v2: joint per-op search ===========================
// State vectors (all in/out for the search):
//   owner[t] in [0, num_chips)  — first chip of table t's consecutive range
//   split[t] in [1, split_cap]  — row-split degree (sub-tables on chips
//                                 owner[t] .. owner[t]+split[t]-1 mod n)
//   mode[t]  0 = placed, 1 = replicated (one-hot MXU, dense-grad allreduce),
//            2 = host-tail offload (hot prefix on device, cold rows served
//                by the hosts over PCIe; viable only when tail_hot_rows > 0)
//   tp[j]    1 or model_axis    — per-dense-op tensor parallelism
// This is the reference's per-op ParallelConfig search folded into ONE
// annealer (reference: FFModel::optimize mutating every op's config,
// model.cc:1928-1991; propagate along volume-weighted edges model.cc:1830).

double ffsim2_simulate(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, const int32_t* tp,
                       int32_t num_dense, double opt_state_factor);

// out9: [0]=dense_us [1]=embed_fwd_max [2]=embed_upd_max [3]=all2all
// [4]=allreduce [5]=dense_update [6]=mem_penalty [7]=makespan(dag or sum)
// [8]=closed_form_sum
void ffsim2_breakdown(const FFSimMachine* m, const FFSimOp* ops,
                      int32_t num_ops, const int32_t* owner,
                      const int32_t* split, const int32_t* mode,
                      int32_t num_tables, const int32_t* tp,
                      int32_t num_dense, double opt_state_factor,
                      double* out9);

// Joint simulated annealing over (owner, split, mode, tp). Move set:
// owner move / owner swap / split x2 / split /2 / mode flip / tp flip /
// propagate (copy a dense op's tp along a volume-weighted random edge;
// co-locate two tables). vocab_caps[t] bounds split[t] (can't split a
// table beyond its rows). Returns best cost; best state written back.
double ffsim2_search(const FFSimMachine* m, const FFSimOp* ops,
                     int32_t num_ops, int32_t* owner, int32_t* split,
                     int32_t* mode, int32_t num_tables, int32_t* tp,
                     int32_t num_dense, const int32_t* vocab_caps,
                     const int32_t* edge_src, const int32_t* edge_dst,
                     const double* edge_vol, int32_t num_edges,
                     double opt_state_factor, int32_t split_cap,
                     int64_t budget, double alpha, uint64_t seed);

// ================== v2g: graph-generic task-graph scoring ==================
// Same state space as v2, but the step DAG is built from the ACTUAL op graph
// (op_edge_src/dst index into the `ops` array) instead of the fixed DLRM
// 3-stage shape: per-op fwd/bwd tasks on a representative worst-chip device,
// exchange/allreduce collectives on a network device, wired by the real
// producer-consumer edges (reference: the SimTask DAG is built from the op
// graph for ANY model, src/runtime/simulator.cc:328-498; scheduling 500-560).
// With num_op_edges == 0 (or use_dag == 0) these fall back to the v2 path.

// Modeled exchange wire volumes under a plan (full fwd-direction bytes,
// before the (n-1)/n leave-the-chip factor): out3[0] = dense slot payload,
// out3[1] = hierarchical cross-domain payload, out3[2] = routed bucket
// wire. CI pins these to the runtime's step_exchange_bytes reporting
// (reference: comm volumes from region intersections, simulator.cc:357-388).
void ffsim2_wire_bytes(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, double* out3);

double ffsim2g_simulate(const FFSimMachine* m, const FFSimOp* ops,
                        int32_t num_ops, const int32_t* owner,
                        const int32_t* split, const int32_t* mode,
                        int32_t num_tables, const int32_t* tp,
                        int32_t num_dense, double opt_state_factor,
                        const int32_t* op_edge_src, const int32_t* op_edge_dst,
                        int32_t num_op_edges);

void ffsim2g_breakdown(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, const int32_t* tp,
                       int32_t num_dense, double opt_state_factor,
                       const int32_t* op_edge_src, const int32_t* op_edge_dst,
                       int32_t num_op_edges, double* out9);

double ffsim2g_search(const FFSimMachine* m, const FFSimOp* ops,
                      int32_t num_ops, int32_t* owner, int32_t* split,
                      int32_t* mode, int32_t num_tables, int32_t* tp,
                      int32_t num_dense, const int32_t* vocab_caps,
                      const int32_t* edge_src, const int32_t* edge_dst,
                      const double* edge_vol, int32_t num_edges,
                      double opt_state_factor, int32_t split_cap,
                      int64_t budget, double alpha, uint64_t seed,
                      const int32_t* op_edge_src, const int32_t* op_edge_dst,
                      int32_t num_op_edges);

}  // extern "C"
