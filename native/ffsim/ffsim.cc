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

// ========================== v2 cost model ==================================

struct Costs2 {
  double stage_fwd[3] = {0, 0, 0};  // per-chip fwd us by graph stage
  double embed_fwd_max = 0, embed_upd_max = 0;
  double a2a_us = 0, allreduce_us = 0, update_us = 0, mem_penalty = 0;
  // host-tail offload (mode 2): per-step host tail service + PCIe wire.
  // Serial with the device step (the host builds feeds before and applies
  // grads after it), so it adds to every schedule variant.
  double host_us = 0;
  std::vector<double> gather_us, upd_us;
  // per-op per-chip fwd durations for the graph-generic DAG builder
  // (0 for placed embeds — their cost lives in embed_fwd_max / a2a_us)
  std::vector<double> op_fwd;
  // modeled wire volumes (full fwd-direction bytes, before the (n-1)/n
  // leave-the-chip factor) — exported for the runtime bytes cross-check
  double slot_payload = 0, domain_payload = 0, routed_wire = 0;
  double dense_total() const {
    return 3.0 * (stage_fwd[0] + stage_fwd[1] + stage_fwd[2]);
  }
  double closed() const {
    return dense_total() + embed_fwd_max + embed_upd_max + a2a_us +
           allreduce_us + update_us + mem_penalty + host_us;
  }
};

int ici_domain_of(const FFSimMachine& m) {
  const int n = std::max(1, (int)m.num_chips);
  int dom = m.ici_domain > 0 ? std::min((int)m.ici_domain, n) : n;
  if (n % dom != 0) dom = n;
  return dom;
}

// per-slice torus axes (defensive: fall back to a 1D ring)
void slice_axes(const FFSimMachine& m, int dom, int* ax, int* ay) {
  int x = m.ici_axis_x > 0 ? m.ici_axis_x : dom;
  int y = m.ici_axis_y > 0 ? m.ici_axis_y : 1;
  if (x * y != dom) { x = dom; y = 1; }
  *ax = x;
  *ay = y;
}

// All-to-all inside one ICI slice, axis-decomposed over the torus: a ring
// phase on an axis of length L moves B*L/8 bytes over the busiest link
// direction (bidirectional + wrap), so cost follows the per-axis BISECTION,
// not the chip count (an 8x8 slice beats a 64-ring 4x).
double a2a_slice_us(const FFSimMachine& m, double bytes_per_chip, int dom) {
  if (dom <= 1 || bytes_per_chip <= 0) return 0.0;
  int ax, ay;
  slice_axes(m, dom, &ax, &ay);
  const double w = m.ici_gbps * 1e3;  // bytes/us per link direction
  double us = 0.0;
  if (ax > 1) us += bytes_per_chip * ax / 8.0 / w + m.ici_latency_us;
  if (ay > 1) us += bytes_per_chip * ay / 8.0 / w + m.ici_latency_us;
  return us;
}

// Allreduce inside one slice: reduce-scatter + all-gather riding every
// torus axis concurrently (per-axis bidirectional rings).
double ar_slice_us(const FFSimMachine& m, double bytes_per_chip, int dom) {
  if (dom <= 1 || bytes_per_chip <= 0) return 0.0;
  int ax, ay;
  slice_axes(m, dom, &ax, &ay);
  const double w = m.ici_gbps * 1e3;
  const int axes = (ax > 1) + (ay > 1);
  return 2.0 * bytes_per_chip * double(dom - 1) / dom / (w * 2.0 * axes) +
         m.ici_latency_us * axes;
}

Costs2 compute_costs2(const FFSimMachine& m, const FFSimOp* ops,
                      int32_t num_ops, const int32_t* owner,
                      const int32_t* split, const int32_t* mode,
                      int32_t num_tables, const int32_t* tp,
                      int32_t num_dense, double opt_state_factor) {
  Costs2 c;
  const int n = std::max(1, (int)m.num_chips);
  const int dom = ici_domain_of(m);
  const int n_slices = n / dom;
  const double fpu = m.mxu_tflops * 1e6;
  const double bpu = m.hbm_gbps * 1e3;
  const double gather_bpu = (m.gather_gbps > 0 ? m.gather_gbps : 8.0) * 1e3;
  const double scatter_bpu = (m.scatter_gbps > 0 ? m.scatter_gbps : 8.0) * 1e3;
  const int max_m = m.model_axis > 1 ? (int)m.model_axis : 1;
  bool any_tp = false;
  for (int j = 0; j < num_dense; j++)
    if (tp && tp[j] > 1) any_tp = true;
  const int dpar = any_tp ? std::max(1, n / max_m) : n;  // data-axis degree

  c.gather_us.assign(n, 0.0);
  c.upd_us.assign(n, 0.0);
  c.op_fwd.assign(num_ops, 0.0);
  std::vector<double> rows_bytes(n, 0.0);       // storage-dtype table bytes
  std::vector<double> rows_state_bytes(n, 0.0);  // f32 optimizer-pool basis
  double dense_param_bytes = 0, repl_bytes_per_chip = 0;
  double slot_payload = 0, domain_payload = 0;
  const bool routed = m.routed_exchange > 0;
  const double rcap = m.routed_cap > 0 ? m.routed_cap : 2.0;
  double routed_wire = 0, routed_entries = 0;
  int ti = 0, dj = 0;
  for (int i = 0; i < num_ops; i++) {
    const FFSimOp& op = ops[i];
    const int st = (op.stage == 0 || op.stage == 1) ? op.stage : 2;
    if (op.kind == FFSIM_EMBED) {
      const int t = ti++;
      if (t >= num_tables) continue;
      const double dim = op.row_bytes / 4.0;
      if (mode && mode[t] == 1) {
        // replicated one-hot MXU path: dense DP work + dense-grad sync
        const double f = 2.0 * op.lookups * op.table_rows * dim;
        c.stage_fwd[st] += f / fpu / dpar;
        c.op_fwd[i] = f / fpu / dpar;
        dense_param_bytes += op.table_rows * op.row_bytes;
        repl_bytes_per_chip += op.table_rows * op.row_bytes;
        continue;
      }
      if (mode && mode[t] == 2 && op.tail_hot_rows > 0) {
        // host-tail offload (parallel/host_tail.py): the hot prefix is a
        // standalone DP table on every chip (sparse-updated, no dense
        // allreduce); tail lookups are served by the hosts over PCIe as a
        // compact (pos, val) exchange. Reference analog: zero-copy host
        // embedding placement (dlrm_strategy_hetero.cc).
        const double hot = std::min(op.tail_hot_rows, op.table_rows);
        const double q = std::min(std::max(op.tail_miss_frac, 0.0), 1.0);
        const double g_bytes = op.lookups * (1.0 - q) / n * op.row_bytes;
        for (int d = 0; d < n; d++) {
          c.gather_us[d] += g_bytes / gather_bpu;
          c.upd_us[d] += g_bytes / scatter_bpu;
        }
        repl_bytes_per_chip += hot * op.row_bytes;  // memory term only
        const int cph_t =
            m.chips_per_host > 0 ? std::min((int)m.chips_per_host, n) : n;
        const int hosts = std::max(1, n / cph_t);
        const double miss = op.lookups * q / hosts;  // per-host tail rows
        // wire per host: f32 partial rows + pos up, grad rows down
        const double wire = miss * (2.0 * op.row_bytes + 4.0);
        const double pcie_bpu = (m.pcie_gbps > 0 ? m.pcie_gbps : 10.0) * 1e3;
        c.host_us += wire / pcie_bpu + 2.0 * m.pcie_latency_us +
                     2.0 * miss * m.host_row_ns * 1e-3;
        continue;
      }
      int s = split ? split[t] : 1;
      s = std::max(1, std::min(s, std::min(n, (int)std::max(1.0, op.table_rows))));
      const int o0 = ((owner[t] % n) + n) % n;
      // packed-table storage dtype (config.table_dtype): bf16 halves the
      // gather and table-pass HBM terms; the f32 optimizer side pools ride
      // the memory term separately below
      const double trb =
          op.table_row_bytes > 0 ? op.table_row_bytes : op.row_bytes;
      // selective touched-chunk dispatch: the table read+write pass scales
      // with the chunks that received entries (∝ batch under skew), not
      // total vocab (ops/pallas/packed_update.py _selective_schedule)
      const double touched =
          op.upd_touched_frac > 0 ? std::min(op.upd_touched_frac, 1.0) : 1.0;
      for (int k = 0; k < s; k++) {
        const int dev = (o0 + k) % n;
        const double bytes = op.lookups / s * trb;
        c.gather_us[dev] += bytes / gather_bpu;
        if (m.update_pass_gbps > 0) {
          c.upd_us[dev] +=
              2.0 * (op.table_rows / s) * trb * touched /
                  (m.update_pass_gbps * 1e3) +
              (op.lookups / s) * m.update_ns_per_row * 1e-3 +
              m.update_us_per_table;
        } else {
          c.upd_us[dev] += op.lookups / s * op.row_bytes / scatter_bpu;
        }
        rows_bytes[dev] += op.table_rows / s * trb;
        rows_state_bytes[dev] += op.table_rows / s * op.row_bytes;
      }
      const double prows = op.pooled_rows > 0 ? op.pooled_rows : op.lookups;
      const double wrb = op.wire_row_bytes > 0 ? op.wire_row_bytes : op.row_bytes;
      if (routed) {
        // capacity buckets: idx there + rows back (fwd), row ids + grads
        // there (bwd) — 2 idx + 2 payload rows per entry, independent of
        // the split degree (matches the runtime's accounting,
        // embedding_collection.py step_exchange_bytes). Unsplit sub-buckets
        // are exact (factor 1); split ones carry the capacity factor.
        const double cap_eff = s > 1 ? rcap : 1.0;
        routed_wire += cap_eff * op.lookups * (8.0 + 2.0 * wrb);
        routed_entries += op.lookups;
      } else {
        slot_payload += s * wrb * prows;
        if (n_slices > 1) {
          const int spans =
              std::min(n_slices, (int)((o0 % dom + s + dom - 1) / dom));
          domain_payload += wrb * prows * spans;
        }
      }
    } else {
      double denom = dpar;
      if (op.kind == FFSIM_DENSE) {
        const int t = (tp && dj < num_dense) ? std::max(1, tp[dj]) : 1;
        dj++;
        if (t > 1) {
          denom = double(dpar) * max_m;
          // activation psum over the model submesh, fwd + bwd
          const double psum_b = op.act_bytes / std::max(1, dpar);
          const double psum_us = 2.0 * 2.0 * psum_b * double(max_m - 1) /
                                 max_m / (m.ici_gbps * 1e3) / 3.0;
          c.stage_fwd[st] += psum_us;
          c.op_fwd[i] += psum_us;
          // (divided by 3: stage_fwd is tripled into fwd+bwd by closed())
          dense_param_bytes += op.param_bytes / max_m;
        } else {
          dense_param_bytes += op.param_bytes;
        }
      }
      const double raw =
          op.fwd_us > 0 ? op.fwd_us
                        : std::max(op.flops / fpu, op.bytes / bpu);
      const double f = raw / denom;
      c.stage_fwd[st] += f;
      c.op_fwd[i] += f;
    }
  }
  if (routed && n > 1) {
    // source-side routing (batched sort + bucket slices + reassembly),
    // paid by every chip on both fwd and bwd
    const double route_us =
        routed_entries / n * m.routing_ns_per_entry * 1e-3;
    for (int d = 0; d < n; d++) {
      c.gather_us[d] += route_us;
      c.upd_us[d] += route_us;
    }
  }
  c.embed_fwd_max = *std::max_element(c.gather_us.begin(), c.gather_us.end());
  c.embed_upd_max = *std::max_element(c.upd_us.begin(), c.upd_us.end());

  // pooled exchange (fwd) + grad exchange (bwd)
  if (routed && n > 1) {
    // three compact all-to-alls folded into one bytes total (a2a_us is
    // already the fwd+bwd sum, so no extra 2x below)
    c.a2a_us = a2a_slice_us(m, routed_wire / n, dom);
    if (n_slices > 1)
      c.a2a_us += link_time_us(
          m, routed_wire / n * double(n_slices - 1) / n_slices, m.dcn_gbps,
          m.dcn_latency_us, n_slices - 1);
  } else if (n > 1) {
    double t_ici = a2a_slice_us(m, slot_payload / n, dom);
    double t_dcn = 0;
    if (n_slices > 1) {
      if (m.hierarchical_a2a > 0) {
        t_dcn = link_time_us(
            m, domain_payload / n * double(n_slices - 1) / n_slices,
            m.dcn_gbps, m.dcn_latency_us, n_slices - 1);
      } else {
        t_dcn = link_time_us(
            m, slot_payload / n * double(n - dom) / n, m.dcn_gbps,
            m.dcn_latency_us, n_slices - 1);
      }
    }
    c.a2a_us = 2.0 * (t_ici + t_dcn);
  }

  if (m.param_sync == 1) {
    // parameter-server comparison mode (reference: simulator.cc:403-498
    // models PS sync — per-worker grad xfer to a pinned server copy +
    // update there + param xfer back; :561-604 models NCCL allreduce).
    // Every chip's dense grads funnel through the HOST link into the
    // server and updated params return: 2*n*P bytes through one link,
    // serialized — no torus bisection helps. The optimizer update runs on
    // the host at the same link-class bandwidth. The runtime implements
    // only allreduce (XLA psum over ICI); this branch exists so the model
    // can SHOW that choice winning (tests/test_autotune2.py).
    const double ps_bw =
        (m.ps_gbps > 0 ? m.ps_gbps : (m.pcie_gbps > 0 ? m.pcie_gbps : 10.0));
    c.allreduce_us = link_time_us(m, 2.0 * n * dense_param_bytes, ps_bw,
                                  m.pcie_latency_us, 1);
    c.update_us = dense_param_bytes * (2.0 + opt_state_factor) / (ps_bw * 1e3);
  } else {
    // dense-grad allreduce (slice rings + DCN stage when multi-slice)
    c.allreduce_us = ar_slice_us(m, dense_param_bytes, dom);
    if (n_slices > 1)
      c.allreduce_us += link_time_us(
          m, 2.0 * dense_param_bytes * double(n_slices - 1) / n_slices,
          m.dcn_gbps, m.dcn_latency_us, n_slices - 1);

    c.update_us =
        dense_param_bytes * (2.0 + opt_state_factor) / bpu;
  }

  const double cap_bytes = m.hbm_capacity_gb * 1e9;
  for (int d = 0; d < n; d++) {
    // table storage at its dtype; optimizer side pools stay f32
    // (rows_state_bytes), as do replicated one-hot tables
    const double used =
        rows_bytes[d] + rows_state_bytes[d] * 0.25 * opt_state_factor +
        repl_bytes_per_chip * (1.0 + 0.25 * opt_state_factor) +
        dense_param_bytes * (1.0 + opt_state_factor);
    if (used > cap_bytes)
      c.mem_penalty += (used - cap_bytes) / 1e6 * kPenaltyUsPerMB;
  }
  c.mem_penalty += m.step_overhead_us;
  c.slot_payload = slot_payload;
  c.domain_payload = domain_payload;
  c.routed_wire = routed_wire;
  return c;
}

// Build the DLRM-step task DAG under a placement and event-schedule it
// (devices 0..n-1 compute, device n = network). This is what the
// closed-form sum cannot see: the fwd all-to-all overlaps the bottom MLP,
// the bwd all-to-all overlaps the bottom-MLP backward, and the dense-grad
// allreduce overlaps the embedding update.
// (reference: simulator.cc:328-631 SimTask DAG + list scheduling 500-560)
double dag_makespan(const FFSimMachine& m, const Costs2& c) {
  const int n = std::max(1, (int)m.num_chips);
  const double bot_f = c.stage_fwd[0];
  const double top_f = c.stage_fwd[1] + c.stage_fwd[2];
  std::vector<double> dur;
  std::vector<int32_t> dev;
  auto add = [&](double d, int device) {
    dur.push_back(d);
    dev.push_back(device);
    return (int32_t)dur.size() - 1;
  };
  std::vector<int32_t> es, ed;
  auto edge = [&](int a, int b) { es.push_back(a); ed.push_back(b); };
  std::vector<int> bot_fwd(n), emb_fwd(n), top_fwd(n), top_bwd(n),
      bot_bwd(n), emb_upd(n), dup(n);
  for (int cdev = 0; cdev < n; cdev++) {
    // embedding gathers first: they feed the exchange, which then rides
    // the network while the bottom MLP computes (ties in the ready queue
    // break by insertion order)
    emb_fwd[cdev] = add(c.gather_us[cdev], cdev);
    bot_fwd[cdev] = add(bot_f, cdev);
  }
  const int a2a_f = add(c.a2a_us / 2.0, n);
  for (int cdev = 0; cdev < n; cdev++) {
    top_fwd[cdev] = add(top_f, cdev);
    top_bwd[cdev] = add(2.0 * top_f, cdev);
    bot_bwd[cdev] = add(2.0 * bot_f, cdev);
  }
  const int a2a_b = add(c.a2a_us / 2.0, n);
  const int ar = add(c.allreduce_us, n);
  for (int cdev = 0; cdev < n; cdev++) {
    emb_upd[cdev] = add(c.upd_us[cdev], cdev);
    dup[cdev] = add(c.update_us, cdev);
  }
  for (int cdev = 0; cdev < n; cdev++) {
    edge(emb_fwd[cdev], a2a_f);
    edge(a2a_f, top_fwd[cdev]);
    edge(bot_fwd[cdev], top_fwd[cdev]);
    edge(top_fwd[cdev], top_bwd[cdev]);
    edge(top_bwd[cdev], a2a_b);
    edge(top_bwd[cdev], bot_bwd[cdev]);
    edge(a2a_b, emb_upd[cdev]);
    edge(bot_bwd[cdev], ar);
    edge(ar, dup[cdev]);
  }
  const double span = ffsim_schedule_dag(
      n + 1, dur.data(), dev.data(), (int32_t)dur.size(), es.data(),
      ed.data(), (int32_t)es.size());
  return span + c.mem_penalty + c.host_us;
}

double simulate2_total(const FFSimMachine& m, const Costs2& c) {
  return m.use_dag > 0 ? dag_makespan(m, c) : c.closed();
}

// Graph-GENERIC task DAG, PER-CHIP variant — the DEFAULT generic scoring
// path (use_dag=1; reference: SimTask DAG built from the actual op graph
// for any model, simulator.cc:328-498; per-device timelines 500-560).
// Devices 0..n-1 are the chips — each carries its OWN copy of the
// data-parallel fwd/bwd tasks plus its own embedding gather/update load
// (c.gather_us[d]/c.upd_us[d]) — and device n is the network (exchange
// halves, dense-grad allreduce).
//
// Why per-chip matters (round-4 VERDICT item 7, pinned by
// tests/test_autotune2.py): the exchange collectives DO barrier the
// phases, but each chip's serial chain runs through its OWN gather, its
// own dense fwd/bwd, and its own update. The representative-chip collapse
// (dag_makespan_generic_rep, use_dag=2) charges ONE device
// max-over-chips(gather) AND max-over-chips(update); when those maxes
// land on DIFFERENT chips — e.g. a lookup-heavy table on chip A and a
// huge-vocab table on chip B — the real makespan is
// max_d(own-gather + chain + own-update), strictly less. The collapse is
// an upper bound (exact when one chip carries both maxes), kept for
// comparison at n x fewer tasks per eval.
// Edges come from the REAL producer-consumer op edges, so what overlaps the
// exchange is whatever the graph actually allows (in DLRM the bottom MLP;
// in a transformer nothing — the whole stack consumes the embedding).
double dag_makespan_generic_perchip(const FFSimMachine& m, const FFSimOp* ops,
                                    int32_t num_ops, const int32_t* mode,
                                    int32_t num_tables, const int32_t* oe_src,
                                    const int32_t* oe_dst, int32_t n_oe,
                                    const Costs2& c) {
  const int n = std::max(1, (int)m.num_chips);
  const int net = n;  // network device id
  std::vector<double> dur;
  std::vector<int32_t> dev;
  auto add = [&](double d, int device) {
    dur.push_back(d);
    dev.push_back(device);
    return (int32_t)dur.size() - 1;
  };
  std::vector<int32_t> es, ed;
  auto edge = [&](int a, int b) {
    if (a >= 0 && b >= 0) {
      es.push_back(a);
      ed.push_back(b);
    }
  };
  constexpr int kNone = -1;
  // fwd/bwd task ids per (op, chip): replicated DP tasks, one per chip
  std::vector<int> fwd((size_t)num_ops * n, kNone), bwd((size_t)num_ops * n, kNone);
  std::vector<char> placed(num_ops, 0);
  bool any_placed = false;
  std::vector<int> emb_f(n, kNone), emb_u(n, kNone);
  {
    int t = 0;
    for (int i = 0; i < num_ops; i++) {
      if (ops[i].kind == FFSIM_EMBED) {
        const int ti = t++;
        // mode 0 (placed) and mode 2 (host-tail) both account their device
        // work in the per-chip gather/update tasks; only replicated
        // one-hot tables (mode 1) run as dense DP ops
        if (!mode || (ti < num_tables && mode[ti] != 1)) {
          placed[i] = 1;
          any_placed = true;
          continue;
        }
      }
    }
  }
  // gathers first on each chip (they feed the exchange; ready-queue ties
  // break by insertion order) — matching the staged DAG's ordering
  int a2a_f = kNone, a2a_b = kNone;
  if (any_placed) {
    for (int d = 0; d < n; d++) emb_f[d] = add(c.gather_us[d], d);
  }
  for (int i = 0; i < num_ops; i++)
    if (!placed[i])
      for (int d = 0; d < n; d++) fwd[(size_t)i * n + d] = add(c.op_fwd[i], d);
  if (any_placed) {
    a2a_f = add(c.a2a_us / 2.0, net);
    for (int d = 0; d < n; d++) edge(emb_f[d], a2a_f);
  }
  for (int i = num_ops - 1; i >= 0; i--)
    if (!placed[i])
      for (int d = 0; d < n; d++)
        bwd[(size_t)i * n + d] = add(2.0 * c.op_fwd[i], d);
  if (any_placed) {
    a2a_b = add(c.a2a_us / 2.0, net);
    for (int d = 0; d < n; d++) {
      emb_u[d] = add(c.upd_us[d], d);
      edge(a2a_b, emb_u[d]);
    }
  }
  for (int e = 0; e < n_oe; e++) {
    const int a = oe_src[e], b = oe_dst[e];
    if (a < 0 || a >= num_ops || b < 0 || b >= num_ops) continue;
    if (placed[a] && !placed[b]) {
      // embedding output reaches b through the pooled exchange
      for (int d = 0; d < n; d++) {
        edge(a2a_f, fwd[(size_t)b * n + d]);
        edge(bwd[(size_t)b * n + d], a2a_b);
      }
    } else if (!placed[a] && !placed[b]) {
      // DP dataflow stays chip-local (each chip owns its batch shard)
      for (int d = 0; d < n; d++) {
        edge(fwd[(size_t)a * n + d], fwd[(size_t)b * n + d]);
        edge(bwd[(size_t)b * n + d], bwd[(size_t)a * n + d]);
      }
    } else if (!placed[a] && placed[b]) {
      // dense op feeding an embedding (rare: computed indices); every
      // chip's gather then waits on its producer
      for (int d = 0; d < n; d++) {
        edge(fwd[(size_t)a * n + d], emb_f[d]);
        edge(emb_u[d], bwd[(size_t)a * n + d]);
      }
    }  // placed->placed: both inside the gather/update tasks, no edge
  }
  // fwd-before-own-bwd (covers the loss turnaround at graph sinks too:
  // a sink's bwd cannot start before its fwd, and the loss itself is
  // modeled as part of the sink's cost)
  for (int i = 0; i < num_ops; i++)
    if (!placed[i])
      for (int d = 0; d < n; d++)
        edge(fwd[(size_t)i * n + d], bwd[(size_t)i * n + d]);
  // dense-grad allreduce after the bwd of every op that owns dense params
  // (incl. replicated one-hot tables), then the dense optimizer update
  const int ar = add(c.allreduce_us, net);
  for (int d = 0; d < n; d++) edge(ar, add(c.update_us, d));
  {
    int t = 0;
    bool any_param = false;
    for (int i = 0; i < num_ops; i++) {
      bool owns = ops[i].kind == FFSIM_DENSE && ops[i].param_bytes > 0;
      if (ops[i].kind == FFSIM_EMBED) {
        const int ti = t++;
        owns = mode && ti < num_tables && mode[ti] == 1;
      }
      if (owns && !placed[i]) {
        for (int d = 0; d < n; d++) edge(bwd[(size_t)i * n + d], ar);
        any_param = true;
      }
    }
    if (!any_param)  // keep the collective ordered after the backward
      for (int i = 0; i < num_ops; i++)
        if (!placed[i])
          for (int d = 0; d < n; d++) edge(bwd[(size_t)i * n + d], ar);
  }
  const double span = ffsim_schedule_dag(
      n + 1, dur.data(), dev.data(), (int32_t)dur.size(), es.data(),
      ed.data(), (int32_t)es.size());
  return span + c.mem_penalty + c.host_us;
}

// Representative-chip collapse of the generic DAG (use_dag=2): one
// compute device carries the per-op fwd/bwd tasks plus the max-over-chips
// gather/update aggregates; device 1 is the network. An UPPER BOUND on
// the per-chip schedule — exact when one chip carries both phase maxes,
// pessimistic when the gather max and update max land on different chips
// (see the perchip variant's note) — at n x fewer tasks per search eval.
double dag_makespan_generic_rep(const FFSimMachine& m, const FFSimOp* ops,
                                int32_t num_ops, const int32_t* mode,
                                int32_t num_tables, const int32_t* oe_src,
                                const int32_t* oe_dst, int32_t n_oe,
                                const Costs2& c) {
  std::vector<double> dur;
  std::vector<int32_t> dev;
  auto add = [&](double d, int device) {
    dur.push_back(d);
    dev.push_back(device);
    return (int32_t)dur.size() - 1;
  };
  std::vector<int32_t> es, ed;
  auto edge = [&](int a, int b) {
    if (a >= 0 && b >= 0) {
      es.push_back(a);
      ed.push_back(b);
    }
  };
  constexpr int kNone = -1;
  std::vector<int> fwd(num_ops, kNone), bwd(num_ops, kNone);
  std::vector<char> placed(num_ops, 0);
  bool any_placed = false;
  {
    int t = 0;
    for (int i = 0; i < num_ops; i++) {
      if (ops[i].kind == FFSIM_EMBED) {
        const int ti = t++;
        // mode 0 (placed) and mode 2 (host-tail) both account their device
        // work in the gather/update aggregates; only replicated one-hot
        // tables (mode 1) run as dense DP ops
        if (!mode || (ti < num_tables && mode[ti] != 1)) {
          placed[i] = 1;
          any_placed = true;
        }
      }
    }
  }
  // gathers first (they feed the exchange; ready-queue ties break by
  // insertion order) — matching the staged DAG's and perchip ordering
  int emb_f = kNone, a2a_f = kNone, a2a_b = kNone, emb_u = kNone;
  if (any_placed) emb_f = add(c.embed_fwd_max, 0);
  for (int i = 0; i < num_ops; i++)
    if (!placed[i]) fwd[i] = add(c.op_fwd[i], 0);
  if (any_placed) {
    a2a_f = add(c.a2a_us / 2.0, 1);
    edge(emb_f, a2a_f);
  }
  for (int i = num_ops - 1; i >= 0; i--)
    if (fwd[i] != kNone) bwd[i] = add(2.0 * c.op_fwd[i], 0);
  if (any_placed) {
    a2a_b = add(c.a2a_us / 2.0, 1);
    emb_u = add(c.embed_upd_max, 0);
    edge(a2a_b, emb_u);
  }
  for (int e = 0; e < n_oe; e++) {
    const int a = oe_src[e], b = oe_dst[e];
    if (a < 0 || a >= num_ops || b < 0 || b >= num_ops) continue;
    if (placed[a] && !placed[b]) {
      // embedding output reaches b through the pooled exchange
      edge(a2a_f, fwd[b]);
      edge(bwd[b], a2a_b);
    } else if (!placed[a] && !placed[b]) {
      edge(fwd[a], fwd[b]);
      edge(bwd[b], bwd[a]);
    } else if (!placed[a] && placed[b]) {
      // dense op feeding an embedding (rare: computed indices); the gather
      // group then waits on it
      edge(fwd[a], emb_f);
      edge(emb_u, bwd[a]);
    }  // placed->placed: both inside the aggregate, no edge needed
  }
  // fwd-before-own-bwd (covers the loss turnaround at graph sinks too)
  for (int i = 0; i < num_ops; i++)
    if (fwd[i] != kNone && bwd[i] != kNone) edge(fwd[i], bwd[i]);
  // dense-grad allreduce after the bwd of every op that owns dense params
  // (incl. replicated one-hot tables), then the dense optimizer update
  const int ar = add(c.allreduce_us, 1);
  const int du = add(c.update_us, 0);
  edge(ar, du);
  {
    int t = 0;
    bool any_param = false;
    for (int i = 0; i < num_ops; i++) {
      bool owns = ops[i].kind == FFSIM_DENSE && ops[i].param_bytes > 0;
      if (ops[i].kind == FFSIM_EMBED) {
        const int ti = t++;
        owns = mode && ti < num_tables && mode[ti] == 1;
      }
      if (owns && bwd[i] != kNone) {
        edge(bwd[i], ar);
        any_param = true;
      }
    }
    if (!any_param)  // keep the collective ordered after the backward
      for (int i = 0; i < num_ops; i++)
        if (bwd[i] != kNone) edge(bwd[i], ar);
  }
  const double span = ffsim_schedule_dag(
      2, dur.data(), dev.data(), (int32_t)dur.size(), es.data(), ed.data(),
      (int32_t)es.size());
  return span + c.mem_penalty + c.host_us;
}

double simulate2g_total(const FFSimMachine& m, const FFSimOp* ops,
                        int32_t num_ops, const int32_t* mode,
                        int32_t num_tables, const int32_t* oe_src,
                        const int32_t* oe_dst, int32_t n_oe, const Costs2& c) {
  if (m.use_dag > 0 && n_oe > 0) {
    if (m.use_dag >= 2)
      return dag_makespan_generic_rep(m, ops, num_ops, mode, num_tables,
                                      oe_src, oe_dst, n_oe, c);
    return dag_makespan_generic_perchip(m, ops, num_ops, mode, num_tables,
                                        oe_src, oe_dst, n_oe, c);
  }
  return simulate2_total(m, c);
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

// ========================== v2 entry points ================================

double ffsim2_simulate(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, const int32_t* tp,
                       int32_t num_dense, double opt_state_factor) {
  Costs2 c = compute_costs2(*m, ops, num_ops, owner, split, mode, num_tables,
                            tp, num_dense, opt_state_factor);
  return simulate2_total(*m, c);
}

void ffsim2_breakdown(const FFSimMachine* m, const FFSimOp* ops,
                      int32_t num_ops, const int32_t* owner,
                      const int32_t* split, const int32_t* mode,
                      int32_t num_tables, const int32_t* tp,
                      int32_t num_dense, double opt_state_factor,
                      double* out9) {
  Costs2 c = compute_costs2(*m, ops, num_ops, owner, split, mode, num_tables,
                            tp, num_dense, opt_state_factor);
  out9[0] = c.dense_total();
  out9[1] = c.embed_fwd_max;
  out9[2] = c.embed_upd_max;
  out9[3] = c.a2a_us;
  out9[4] = c.allreduce_us;
  out9[5] = c.update_us;
  out9[6] = c.mem_penalty + c.host_us;  // incl. host-tail service
  out9[7] = simulate2_total(*m, c);
  out9[8] = c.closed();
}

// Modeled exchange wire volumes under a plan (full fwd-direction bytes):
// out3[0] = dense slot payload, out3[1] = hierarchical cross-domain payload,
// out3[2] = routed bucket wire (idx+rows+grads). The CI cross-check pins
// these to the runtime's step_exchange_bytes reporting
// (reference analog: the simulator's comm-volume accounting from region
// intersections, src/runtime/simulator.cc:357-388).
void ffsim2_wire_bytes(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, double* out3) {
  Costs2 c = compute_costs2(*m, ops, num_ops, owner, split, mode, num_tables,
                            nullptr, 0, 0.0);
  out3[0] = c.slot_payload;
  out3[1] = c.domain_payload;
  out3[2] = c.routed_wire;
}

double ffsim2g_simulate(const FFSimMachine* m, const FFSimOp* ops,
                        int32_t num_ops, const int32_t* owner,
                        const int32_t* split, const int32_t* mode,
                        int32_t num_tables, const int32_t* tp,
                        int32_t num_dense, double opt_state_factor,
                        const int32_t* op_edge_src, const int32_t* op_edge_dst,
                        int32_t num_op_edges) {
  Costs2 c = compute_costs2(*m, ops, num_ops, owner, split, mode, num_tables,
                            tp, num_dense, opt_state_factor);
  return simulate2g_total(*m, ops, num_ops, mode, num_tables, op_edge_src,
                          op_edge_dst, num_op_edges, c);
}

void ffsim2g_breakdown(const FFSimMachine* m, const FFSimOp* ops,
                       int32_t num_ops, const int32_t* owner,
                       const int32_t* split, const int32_t* mode,
                       int32_t num_tables, const int32_t* tp,
                       int32_t num_dense, double opt_state_factor,
                       const int32_t* op_edge_src, const int32_t* op_edge_dst,
                       int32_t num_op_edges, double* out9) {
  Costs2 c = compute_costs2(*m, ops, num_ops, owner, split, mode, num_tables,
                            tp, num_dense, opt_state_factor);
  out9[0] = c.dense_total();
  out9[1] = c.embed_fwd_max;
  out9[2] = c.embed_upd_max;
  out9[3] = c.a2a_us;
  out9[4] = c.allreduce_us;
  out9[5] = c.update_us;
  out9[6] = c.mem_penalty + c.host_us;  // incl. host-tail service
  out9[7] = simulate2g_total(*m, ops, num_ops, mode, num_tables, op_edge_src,
                             op_edge_dst, num_op_edges, c);
  out9[8] = c.closed();
}

double ffsim2g_search(const FFSimMachine* m, const FFSimOp* ops,
                      int32_t num_ops, int32_t* owner, int32_t* split,
                      int32_t* mode, int32_t num_tables, int32_t* tp,
                      int32_t num_dense, const int32_t* vocab_caps,
                      const int32_t* edge_src, const int32_t* edge_dst,
                      const double* edge_vol, int32_t num_edges,
                      double opt_state_factor, int32_t split_cap,
                      int64_t budget, double alpha, uint64_t seed,
                      const int32_t* op_edge_src, const int32_t* op_edge_dst,
                      int32_t num_op_edges) {
  const int n = std::max(1, (int)m->num_chips);
  const int max_m = m->model_axis > 1 ? (int)m->model_axis : 1;
  const int cap = split_cap > 0 ? std::min(split_cap, n) : n;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  std::uniform_int_distribution<int> pick_table(0, std::max(0, num_tables - 1));
  std::uniform_int_distribution<int> pick_dense(0, std::max(0, num_dense - 1));
  std::uniform_int_distribution<int> pick_dev(0, n - 1);

  // host-tail candidacy per table (mode 2 viable only where the lowering
  // marked a hot prefix — parallel/host_tail.py)
  std::vector<char> tail_ok(std::max(1, (int)num_tables), 0);
  {
    int t = 0;
    for (int i = 0; i < num_ops && t < num_tables; i++)
      if (ops[i].kind == FFSIM_EMBED) tail_ok[t++] = ops[i].tail_hot_rows > 0;
  }

  // cumulative edge weights for volume-weighted propagate moves
  // (reference: random graph walks weighted by edge volume, model.h:287-289)
  std::vector<double> cum;
  double vol_total = 0;
  for (int e = 0; e < num_edges; e++) {
    vol_total += (edge_vol ? std::max(edge_vol[e], 1.0) : 1.0);
    cum.push_back(vol_total);
  }

  struct State {
    std::vector<int32_t> owner, split, mode, tp;
  };
  State cur{{owner, owner + num_tables},
            {split, split + num_tables},
            {mode, mode + num_tables},
            {tp, tp + num_dense}};
  auto eval = [&](const State& s) {
    return ffsim2g_simulate(m, ops, num_ops, s.owner.data(), s.split.data(),
                            s.mode.data(), num_tables, s.tp.data(), num_dense,
                            opt_state_factor, op_edge_src, op_edge_dst,
                            num_op_edges);
  };
  State best = cur;
  double cur_cost = eval(cur), best_cost = cur_cost;

  for (int64_t it = 0; it < budget; it++) {
    State cand = cur;
    const double r = unif(rng);
    if (num_tables > 0 && r < 0.30) {
      cand.owner[pick_table(rng)] = pick_dev(rng);
    } else if (num_tables >= 2 && r < 0.45) {
      std::swap(cand.owner[pick_table(rng)], cand.owner[pick_table(rng)]);
    } else if (num_tables > 0 && r < 0.60) {
      const int t = pick_table(rng);
      const int vc = vocab_caps ? vocab_caps[t] : cap;
      cand.split[t] = std::min({cand.split[t] * 2, cap, std::max(vc, 1)});
    } else if (num_tables > 0 && r < 0.70) {
      const int t = pick_table(rng);
      cand.split[t] = std::max(1, cand.split[t] / 2);
    } else if (num_tables > 0 && r < 0.78) {
      const int t = pick_table(rng);
      if (tail_ok[t]) {
        // jump to a random DIFFERENT mode (0 placed / 1 replicated /
        // 2 host-tail) — cycling would force 0->2 through the replicated
        // mode, whose cost wall the annealer cannot cross
        int nm = (int)(unif(rng) * 2.0);
        if (nm >= cand.mode[t]) nm++;  // uniform over the two other modes
        cand.mode[t] = nm;
      } else {
        cand.mode[t] ^= 1;
      }
    } else if (num_dense > 0 && max_m > 1 && r < 0.84) {
      const int j = pick_dense(rng);
      cand.tp[j] = cand.tp[j] > 1 ? 1 : max_m;
    } else if (num_dense > 0 && max_m > 1 && r < 0.88) {
      // global TP flip: engaging the model axis re-shapes the mesh for
      // EVERY op, so per-op flips face an acceptance barrier (one TP op
      // halves the data axis for all the others) — jump it in one move
      bool any = false;
      for (int j = 0; j < num_dense; j++)
        if (cand.tp[j] > 1) any = true;
      for (int j = 0; j < num_dense; j++) cand.tp[j] = any ? 1 : max_m;
    } else if (num_edges > 0 && num_dense > 0 && max_m > 1 && r < 0.93) {
      // propagate: copy tp along a volume-weighted random edge
      const double x = unif(rng) * vol_total;
      const int e = (int)(std::lower_bound(cum.begin(), cum.end(), x) -
                          cum.begin());
      const int a = edge_src[std::min(e, num_edges - 1)];
      const int b = edge_dst[std::min(e, num_edges - 1)];
      if (a >= 0 && a < num_dense && b >= 0 && b < num_dense)
        cand.tp[b] = cand.tp[a];
    } else if (num_tables >= 2) {
      // co-locate two tables (the pairwise analog of propagate for
      // placement variables)
      cand.owner[pick_table(rng)] = cand.owner[pick_table(rng)];
    } else if (num_tables == 1) {
      cand.owner[0] = pick_dev(rng);
    } else if (num_dense > 0 && max_m > 1) {
      const int j = pick_dense(rng);
      cand.tp[j] = cand.tp[j] > 1 ? 1 : max_m;
    } else {
      continue;
    }
    const double cost = eval(cand);
    const double diff = cost - cur_cost;
    if (diff < 0 || unif(rng) < std::exp(-alpha * diff)) {
      cur = std::move(cand);
      cur_cost = cost;
      if (cost < best_cost) {
        best_cost = cost;
        best = cur;
      }
    }
    if (budget >= 100 && it % (budget / 100) == budget / 100 - 1) {
      cur = best;
      cur_cost = best_cost;
    }
  }
  std::memcpy(owner, best.owner.data(), sizeof(int32_t) * num_tables);
  std::memcpy(split, best.split.data(), sizeof(int32_t) * num_tables);
  std::memcpy(mode, best.mode.data(), sizeof(int32_t) * num_tables);
  if (num_dense > 0)
    std::memcpy(tp, best.tp.data(), sizeof(int32_t) * num_dense);
  return best_cost;
}

double ffsim2_search(const FFSimMachine* m, const FFSimOp* ops,
                     int32_t num_ops, int32_t* owner, int32_t* split,
                     int32_t* mode, int32_t num_tables, int32_t* tp,
                     int32_t num_dense, const int32_t* vocab_caps,
                     const int32_t* edge_src, const int32_t* edge_dst,
                     const double* edge_vol, int32_t num_edges,
                     double opt_state_factor, int32_t split_cap,
                     int64_t budget, double alpha, uint64_t seed) {
  return ffsim2g_search(m, ops, num_ops, owner, split, mode, num_tables, tp,
                        num_dense, vocab_caps, edge_src, edge_dst, edge_vol,
                        num_edges, opt_state_factor, split_cap, budget, alpha,
                        seed, nullptr, nullptr, 0);
}

}  // extern "C"
