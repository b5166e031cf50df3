// ffdata: native host-side batch gatherer for the data pipeline.
//
// Native analog of the reference's C++ DataLoader batch tasks (reference:
// examples/cpp/DLRM/dlrm.cc:262-601 — per-iteration index launches copying
// sample slices from the zero-copy host dataset into batch tensors;
// python/flexflow_dataloader.cc:543-741 SingleDataLoader). On the TPU
// build the device-side copy is jax.device_put; what remains on the host
// is the permuted row gather from the full dataset into the batch buffer,
// which numpy fancy-indexing runs single-threaded. This library does the
// same gather with a thread pool — one memcpy per row, rows striped over
// threads — so large-batch input pipelines keep up with the device.
//
// Flat C ABI (ctypes-friendly), no dependencies beyond the C++17 stdlib.
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i] = src[idx[i]] for i in [0, n_rows), row_bytes each.
// Multi-threaded over rows. src has src_rows rows; out-of-range indices are
// clamped (defensive; callers validate).
void ffdata_gather_rows(const uint8_t* src, int64_t src_rows,
                        int64_t row_bytes, const int64_t* idx, int64_t n_rows,
                        uint8_t* dst, int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      int64_t r = idx[i];
      if (r < 0) r = 0;
      if (r >= src_rows) r = src_rows - 1;
      std::memcpy(dst + i * row_bytes, src + r * row_bytes, row_bytes);
    }
  };
  if (num_threads == 1 || n_rows < 4096) {
    worker(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n_rows ? b + chunk : n_rows;
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
}

// Gather many arrays that share the same index vector (one batch step for
// all feeds + labels): amortizes thread startup across arrays.
void ffdata_gather_batch(int32_t num_arrays, const uint8_t** srcs,
                         const int64_t* src_rows, const int64_t* row_bytes,
                         const int64_t* idx, int64_t n_rows, uint8_t** dsts,
                         int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto worker = [&](int64_t begin, int64_t end) {
    for (int32_t a = 0; a < num_arrays; ++a) {
      const uint8_t* src = srcs[a];
      uint8_t* dst = dsts[a];
      int64_t rb = row_bytes[a];
      int64_t sr = src_rows[a];
      auto clamp = [sr](int64_t r) {
        if (r < 0) return (int64_t)0;
        if (r >= sr) return sr - 1;
        return r;
      };
      // typed fast paths: DLRM rows are mostly 8B (int64 index columns)
      // or small float rows — memcpy call overhead dominates there
      if (rb == 8) {
        const uint64_t* s64 = reinterpret_cast<const uint64_t*>(src);
        uint64_t* d64 = reinterpret_cast<uint64_t*>(dst);
        for (int64_t i = begin; i < end; ++i) d64[i] = s64[clamp(idx[i])];
      } else if (rb == 4) {
        const uint32_t* s32 = reinterpret_cast<const uint32_t*>(src);
        uint32_t* d32 = reinterpret_cast<uint32_t*>(dst);
        for (int64_t i = begin; i < end; ++i) d32[i] = s32[clamp(idx[i])];
      } else if (rb % 8 == 0) {
        const uint64_t* s64 = reinterpret_cast<const uint64_t*>(src);
        uint64_t* d64 = reinterpret_cast<uint64_t*>(dst);
        int64_t w = rb / 8;
        for (int64_t i = begin; i < end; ++i) {
          const uint64_t* sp = s64 + clamp(idx[i]) * w;
          uint64_t* dp = d64 + i * w;
          for (int64_t j = 0; j < w; ++j) dp[j] = sp[j];
        }
      } else if (rb % 4 == 0) {
        const uint32_t* s32 = reinterpret_cast<const uint32_t*>(src);
        uint32_t* d32 = reinterpret_cast<uint32_t*>(dst);
        int64_t w = rb / 4;
        for (int64_t i = begin; i < end; ++i) {
          const uint32_t* sp = s32 + clamp(idx[i]) * w;
          uint32_t* dp = d32 + i * w;
          for (int64_t j = 0; j < w; ++j) dp[j] = sp[j];
        }
      } else {
        for (int64_t i = begin; i < end; ++i) {
          std::memcpy(dst + i * rb, src + clamp(idx[i]) * rb, rb);
        }
      }
    }
  };
  if (num_threads == 1 || n_rows < 4096) {
    worker(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n_rows ? b + chunk : n_rows;
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
}


// Scatter-add rows: table[idx[i]] += g[i] (or -= lr*g[i] via scale), f32.
// Duplicate-safe multi-threading: thread t applies only updates whose
// destination row hashes to t, so no two threads touch the same row
// (the host-side analog of the reference's CPU embedding backward,
// src/ops/embedding.cc:353-361, minus its non-atomic FIXME).
void ffdata_scatter_add_f32(float* table, int64_t table_rows, int64_t dim,
                            const int64_t* idx, int64_t n_rows,
                            const float* grads, float scale,
                            int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto worker = [&](int32_t tid) {
    for (int64_t i = 0; i < n_rows; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= table_rows) continue;  // padding rows drop
      if (num_threads > 1 && (r % num_threads) != tid) continue;
      float* dst = table + r * dim;
      const float* g = grads + i * dim;
      for (int64_t j = 0; j < dim; ++j) dst[j] += scale * g[j];
    }
  };
  if (num_threads == 1) {
    worker(0);
    return;
  }
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
}

// Batched stable argsort of int64 keys: order[t] = argsort(keys[t]) for T
// independent arrays, one thread per array (threads capped). Feeds the
// host-routing path of the packed embedding update (the sort order of an
// update stream is index-derived, so the input pipeline computes it off
// the device's critical path — ops/pallas/packed_update.host_pack_routes).
void ffdata_argsort_i64_batch(const int64_t* keys, int32_t t, int64_t k,
                              int32_t* order, int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<int32_t> work;
  auto sort_one = [&](int32_t ti) {
    const int64_t* kk = keys + (int64_t)ti * k;
    int32_t* oo = order + (int64_t)ti * k;
    // LSD radix over 11-bit digits (keys are pack ids, far below 2^33):
    // stable, O(k) per pass — ~6x a comparison sort at 65k keys
    int64_t maxk = 0;
    for (int64_t i = 0; i < k; ++i)
      if (kk[i] > maxk) maxk = kk[i];
    constexpr int kBits = 11;
    constexpr int kBuckets = 1 << kBits;
    std::vector<int32_t> a(k), b(k);
    for (int64_t i = 0; i < k; ++i) a[i] = (int32_t)i;
    std::vector<int32_t> count(kBuckets);
    for (int shift = 0; (maxk >> shift) > 0 || shift == 0; shift += kBits) {
      std::fill(count.begin(), count.end(), 0);
      for (int64_t i = 0; i < k; ++i)
        count[(kk[a[i]] >> shift) & (kBuckets - 1)]++;
      int32_t pos = 0;
      for (int c = 0; c < kBuckets; ++c) {
        int32_t n = count[c];
        count[c] = pos;
        pos += n;
      }
      for (int64_t i = 0; i < k; ++i)
        b[count[(kk[a[i]] >> shift) & (kBuckets - 1)]++] = a[i];
      std::swap(a, b);
    }
    std::memcpy(oo, a.data(), sizeof(int32_t) * k);
  };
  if (num_threads == 1 || t == 1) {
    for (int32_t ti = 0; ti < t; ++ti) sort_one(ti);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int32_t> next{0};
  int32_t nt = num_threads < t ? num_threads : t;
  for (int32_t w = 0; w < nt; ++w) {
    threads.emplace_back([&]() {
      for (;;) {
        int32_t ti = next.fetch_add(1);
        if (ti >= t) return;
        sort_one(ti);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
