// ffsim implementation. See ffsim.h for the design mapping to the
// reference simulator/search (src/runtime/simulator.cc, model.cc:1928).
#include "ffsim.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

constexpr double kPenaltyUsPerMB = 1000.0;  // reference: 1 ms/MB over
                                            // capacity (simulator.cc:605-627)

struct StepCosts {
  double dense_us = 0;       // DP compute (fwd+bwd), per chip
  double embed_max_us = 0;   // max over chips of local lookup+scatter
  double all2all_us = 0;     // pooled exchange fwd + grad exchange bwd
  double allreduce_us = 0;   // dense-parameter gradient allreduce
  double update_us = 0;      // dense optimizer update, per chip
  double mem_penalty_us = 0;
  double total() const {
    return dense_us + embed_max_us + all2all_us + allreduce_us + update_us +
           mem_penalty_us;
  }
};

// Generic collective stage: wire bytes over one link class with `hops`
// ring steps. Segmentation (reference: simulator.cc:218-288): chunks
// pipeline across ring hops, so hop latency is paid once per ring pass
// plus once per extra segment (pipelined fill), not per (hop x segment).
double link_time_us(const FFSimMachine& m, double wire_bytes,
                    double link_gbps, double lat, int hops) {
  if (hops <= 0 || wire_bytes <= 0) return 0.0;
  double n_seg = 1.0;
  if (m.segment_bytes > 0) {
    n_seg = std::ceil(wire_bytes / m.segment_bytes);
    if (m.max_segments > 0) n_seg = std::min(n_seg, m.max_segments);
    if (n_seg < 1) n_seg = 1;
  }
  return wire_bytes / (link_gbps * 1e3) /* bytes/us at GB/s */ +
         lat * (hops + (n_seg - 1));
}

// Ring collective time over the data axis. Intra-host rings ride ICI;
// when the mesh spans hosts the slowest stage is the DCN crossing.
double ring_time_us(const FFSimMachine& m, double bytes_per_chip,
                    double steps_factor) {
  if (m.num_chips <= 1) return 0.0;
  const int n = m.num_chips;
  const bool multi_host = n > m.chips_per_host;
  const double link_gbps = multi_host ? m.dcn_gbps : m.ici_gbps;
  const double lat = multi_host ? m.dcn_latency_us : m.ici_latency_us;
  // steps_factor: allreduce=2(n-1)/n, allgather/all2all=(n-1)/n
  return link_time_us(m, bytes_per_chip * steps_factor, link_gbps, lat, n - 1);
}

StepCosts compute_costs(const FFSimMachine& m, const FFSimOp* ops,
                        int32_t num_ops, const int32_t* owner,
                        int32_t num_tables, double opt_state_factor) {
  StepCosts c;
  const int n = std::max(1, (int)m.num_chips);
  const double flops_per_us = m.mxu_tflops * 1e6;     // flops per us
  const double hbm_bytes_per_us = m.hbm_gbps * 1e3;   // bytes per us
  const double gather_bpu = (m.gather_gbps > 0 ? m.gather_gbps : 8.0) * 1e3;
  const double scatter_bpu = (m.scatter_gbps > 0 ? m.scatter_gbps : 8.0) * 1e3;

  std::vector<double> chip_lookup_us(n, 0.0);
  std::vector<double> chip_rows(n, 0.0);
  double dense_param_bytes = 0;
  double slot_payload = 0;   // dense per-slot pooled bytes (flat wire volume:
                             // each exchange slot carries [global_batch] rows)
  double table_payload = 0;  // combined per-(host,table) bytes (what crosses
                             // DCN under the hierarchical exchange)
  const double cph_d = m.chips_per_host > 0 ? (double)m.chips_per_host
                                            : (double)n;
  int t = 0;
  for (int i = 0; i < num_ops; i++) {
    const FFSimOp& op = ops[i];
    if (op.kind == FFSIM_EMBED) {
      int dev = (num_tables > 0) ? owner[t % num_tables] : 0;
      dev = ((dev % n) + n) % n;  // defensive: out-of-range owner wraps
      t++;
      // fused lookup (gather) fwd + scatter update bwd, all on the owner
      const double bytes = op.lookups * op.row_bytes;
      chip_lookup_us[dev] += bytes / gather_bpu;          // fwd gather
      chip_lookup_us[dev] += bytes / scatter_bpu;         // bwd scatter
      chip_rows[dev] += op.table_rows * op.row_bytes;
      // pooled exchange: every slot ships one pooled row per global-batch
      // sample (zeros ride too — the exchange tensor is dense), so the flat
      // wire volume grows with the split degree; the hierarchical DCN
      // volume only grows with the hosts a table spans
      const double prows = op.pooled_rows > 0 ? op.pooled_rows : op.lookups;
      const double s = op.sub_count >= 1.0 ? op.sub_count : 1.0;
      const double wrb = op.wire_row_bytes > 0 ? op.wire_row_bytes : op.row_bytes;
      slot_payload += wrb * prows;
      const double hosts_spanned = std::ceil(s / cph_d);
      table_payload += wrb * prows * (hosts_spanned / s);
    } else {
      // roofline: compute-bound on MXU or bandwidth-bound on HBM,
      // sharded DP over n chips; bwd ~ 2x fwd flops (two matmuls)
      const double fwd = std::max(op.flops / flops_per_us, op.bytes / hbm_bytes_per_us) / n;
      c.dense_us += 3.0 * fwd;
      if (op.kind == FFSIM_DENSE) dense_param_bytes += op.param_bytes;
    }
  }
  c.embed_max_us =
      *std::max_element(chip_lookup_us.begin(), chip_lookup_us.end());

  // pooled all-to-all fwd + grad all-to-all bwd; each chip keeps 1/n local
  const int cph = m.chips_per_host > 0 ? std::min((int)m.chips_per_host, n) : n;
  const bool multi_host = n > cph;
  if (n > 1 && multi_host && m.hierarchical_a2a > 0) {
    // hierarchical: slot partials exchange + combine inside the host over
    // ICI, then one row per (host, table) crosses DCN
    const int hosts = n / cph;
    const double t_ici = link_time_us(
        m, slot_payload / n * double(cph - 1) / cph, m.ici_gbps,
        m.ici_latency_us, cph - 1);
    const double t_dcn = link_time_us(
        m, table_payload / n * double(hosts - 1) / hosts, m.dcn_gbps,
        m.dcn_latency_us, hosts - 1);
    c.all2all_us = 2.0 * (t_ici + t_dcn);
  } else {
    c.all2all_us = 2.0 * ring_time_us(m, slot_payload / n, double(n - 1) / n);
  }

  // dense grads allreduce (XLA psum), ring; optionally overlapped with
  // the backward sweep (reference: --search-overlap-backward-update -- the
  // reference's simulator models update tasks overlapping backward, 
  // simulator.cc:403-498 mode 3a)
  c.allreduce_us = ring_time_us(m, dense_param_bytes, 2.0 * double(n - 1) / n);
  if (m.overlap_backward_update > 0) {
    const double bwd_us = c.dense_us * (2.0 / 3.0);  // bwd share of 3x fwd
    const double hidden = std::min(c.allreduce_us, bwd_us) *
                          std::min(1.0, m.overlap_backward_update);
    c.allreduce_us -= hidden;
  }

  // dense optimizer update: params + grads + opt state traffic, per chip
  // (replicated params -> full size each chip)
  c.update_us = dense_param_bytes * (2.0 + opt_state_factor) / hbm_bytes_per_us;

  // memory penalty: per-chip table bytes (+ row-state) + replicated dense
  const double cap_bytes = m.hbm_capacity_gb * 1e9;
  for (int d = 0; d < n; d++) {
    const double used = chip_rows[d] * (1.0 + 0.25 * opt_state_factor) +
                        dense_param_bytes * (1.0 + opt_state_factor);
    if (used > cap_bytes)
      c.mem_penalty_us += (used - cap_bytes) / 1e6 * kPenaltyUsPerMB;
  }
  c.mem_penalty_us += m.step_overhead_us;
  return c;
}

}  // namespace

extern "C" {

double ffsim_simulate(const FFSimMachine* m, const FFSimOp* ops,
                      int32_t num_ops, const int32_t* owner,
                      int32_t num_tables, double opt_state_factor) {
  return compute_costs(*m, ops, num_ops, owner, num_tables, opt_state_factor)
      .total();
}

void ffsim_breakdown(const FFSimMachine* m, const FFSimOp* ops,
                     int32_t num_ops, const int32_t* owner,
                     int32_t num_tables, double opt_state_factor,
                     double* out7) {
  StepCosts c =
      compute_costs(*m, ops, num_ops, owner, num_tables, opt_state_factor);
  out7[0] = c.dense_us;
  out7[1] = c.embed_max_us;
  out7[2] = c.all2all_us;
  out7[3] = c.allreduce_us;
  out7[4] = c.update_us;
  out7[5] = c.mem_penalty_us;
  out7[6] = c.total();
}

double ffsim_mcmc_search(const FFSimMachine* m, const FFSimOp* ops,
                         int32_t num_ops, int32_t* owner, int32_t num_tables,
                         double opt_state_factor, int64_t budget, double alpha,
                         uint64_t seed, int64_t log_every, double* log_buf,
                         int64_t log_cap) {
  const int n = std::max(1, (int)m->num_chips);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  std::uniform_int_distribution<int> pick_table(0, std::max(0, num_tables - 1));
  std::uniform_int_distribution<int> pick_dev(0, n - 1);

  std::vector<int32_t> cur(owner, owner + num_tables);
  std::vector<int32_t> best = cur;
  double cur_cost =
      ffsim_simulate(m, ops, num_ops, cur.data(), num_tables, opt_state_factor);
  double best_cost = cur_cost;
  int64_t logged = 0;

  for (int64_t it = 0; it < budget; it++) {
    std::vector<int32_t> cand = cur;
    // mutations (≅ reference rewrite(): re-place one op, model.cc:1905;
    // swap plays the role of propagate()'s pairwise moves)
    if (num_tables >= 2 && unif(rng) < 0.3) {
      int a = pick_table(rng), b = pick_table(rng);
      std::swap(cand[a], cand[b]);
    } else if (num_tables >= 1) {
      cand[pick_table(rng)] = pick_dev(rng);
    }
    const double cost = ffsim_simulate(m, ops, num_ops, cand.data(),
                                       num_tables, opt_state_factor);
    const double diff = cost - cur_cost;
    if (diff < 0 || unif(rng) < std::exp(-alpha * diff)) {
      cur = cand;
      cur_cost = cost;
      if (cost < best_cost) {
        best_cost = cost;
        best = cur;
      }
    }
    // periodic reset to best (reference: budget/100 resets, model.cc:1971)
    if (budget >= 100 && it % (budget / 100) == budget / 100 - 1) {
      cur = best;
      cur_cost = best_cost;
    }
    if (log_buf && log_every > 0 && it % log_every == 0 && logged < log_cap)
      log_buf[logged++] = best_cost;
  }
  std::memcpy(owner, best.data(), sizeof(int32_t) * num_tables);
  return best_cost;
}

double ffsim_schedule_dag(int32_t num_devices, const double* durations_us,
                          const int32_t* device_of, int32_t num_tasks,
                          const int32_t* edge_src, const int32_t* edge_dst,
                          int32_t num_edges) {
  // Event-driven list scheduling with per-device timelines
  // (≅ simulator.cc:500-560). device -1 = collective occupying all devices.
  std::vector<std::vector<int32_t>> succ(num_tasks);
  std::vector<int32_t> indeg(num_tasks, 0);
  std::vector<double> ready(num_tasks, 0.0);
  for (int e = 0; e < num_edges; e++) {
    succ[edge_src[e]].push_back(edge_dst[e]);
    indeg[edge_dst[e]]++;
  }
  std::vector<double> dev_free(std::max(1, num_devices), 0.0);
  using QE = std::pair<double, int32_t>;  // (ready_time, task)
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  for (int i = 0; i < num_tasks; i++)
    if (indeg[i] == 0) pq.push({0.0, i});
  double makespan = 0.0;
  while (!pq.empty()) {
    auto [rt, i] = pq.top();
    pq.pop();
    double start;
    if (device_of[i] < 0) {
      start = rt;
      for (double f : dev_free) start = std::max(start, f);
      const double end = start + durations_us[i];
      for (double& f : dev_free) f = end;
    } else {
      start = std::max(rt, dev_free[device_of[i]]);
      dev_free[device_of[i]] = start + durations_us[i];
    }
    const double end = start + durations_us[i];
    makespan = std::max(makespan, end);
    for (int32_t s : succ[i]) {
      ready[s] = std::max(ready[s], end);
      if (--indeg[s] == 0) pq.push({ready[s], s});
    }
  }
  return makespan;
}

}  // extern "C"
