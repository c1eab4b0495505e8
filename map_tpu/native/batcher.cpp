// Native host-side batch assembly for the input pipeline.
//
// The trainer's host loop gathers shuffled rows out of the memory-resident
// feat_ids matrix, pads them, and stacks steps_per_call batches per device
// dispatch (map_tpu/data/loader.py + trainer._train_stream). At >400k
// examples/s the Python/numpy fancy-indexing path starts to contend with the
// GIL against the prefetch thread; these kernels do the row gathers with a
// small thread pool and no GIL (called via ctypes, which releases it).
//
// The reference has no native runtime (SURVEY.md §0); this is part of the
// TPU build's native runtime layer alongside the Pallas device kernels.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int num_threads_for(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t by_work = work_items / 4096 + 1;
  return static_cast<int>(std::min<int64_t>(hw, by_work));
}

template <typename T>
void gather_rows_impl(const T* __restrict x, int64_t n_cols,
                      const int64_t* __restrict idx, int64_t n_idx,
                      T* __restrict out) {
  int nthreads = num_threads_for(n_idx);
  if (nthreads <= 1) {
    for (int64_t i = 0; i < n_idx; ++i) {
      std::memcpy(out + i * n_cols, x + idx[i] * n_cols, n_cols * sizeof(T));
    }
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_idx + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(lo + chunk, n_idx);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * n_cols, x + idx[i] * n_cols,
                    n_cols * sizeof(T));
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather rows of a row-major int32 matrix: out[i, :] = x[idx[i], :].
void map_tpu_gather_rows_i32(const int32_t* x, int64_t n_cols,
                             const int64_t* idx, int64_t n_idx, int32_t* out) {
  gather_rows_impl<int32_t>(x, n_cols, idx, n_idx, out);
}

// Gather elements of a float32 vector: out[i] = x[idx[i]].
void map_tpu_gather_f32(const float* x, const int64_t* idx, int64_t n_idx,
                        float* out) {
  for (int64_t i = 0; i < n_idx; ++i) out[i] = x[idx[i]];
}

// Walker alias-table construction (semantics of the reference
// alias_multinomial.py:43-70). probs must sum to 1. O(K); the Python loop
// takes minutes at CTR vocabulary sizes (millions of ids).
void map_tpu_build_alias(const double* probs, int64_t k, float* out_prob,
                         int32_t* out_alias) {
  std::vector<double> scaled(k);
  std::vector<int64_t> smaller, larger;
  smaller.reserve(k);
  larger.reserve(k);
  for (int64_t i = 0; i < k; ++i) {
    scaled[i] = probs[i] * static_cast<double>(k);
    out_alias[i] = 0;
    if (scaled[i] < 1.0) {
      smaller.push_back(i);
    } else {
      larger.push_back(i);
    }
  }
  while (!smaller.empty() && !larger.empty()) {
    int64_t small = smaller.back();
    smaller.pop_back();
    int64_t large = larger.back();
    larger.pop_back();
    out_alias[small] = static_cast<int32_t>(large);
    scaled[large] = (scaled[large] - 1.0) + scaled[small];
    if (scaled[large] < 1.0) {
      smaller.push_back(large);
    } else {
      larger.push_back(large);
    }
  }
  for (int64_t i : smaller) scaled[i] = 1.0;
  for (int64_t i : larger) scaled[i] = 1.0;
  for (int64_t i = 0; i < k; ++i) out_prob[i] = static_cast<float>(scaled[i]);
}

}  // extern "C"
