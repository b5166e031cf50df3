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
  // partials, then per-(host,table) rows over DCN —
  // parallel/embedding_collection.py); 0: flat all-to-all where every
  // slot's dense [batch] partial crosses the slow link
  double hierarchical_a2a;
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

}  // extern "C"
