// lako_native: host-side exact inner-product top-k (MIPS).
//
// CPU fallback for lako_tpu.retrieval.index.DenseIndex — the role faiss-cpu's
// IndexFlatIP plays in the reference (src/index.py:19-76) — for environments
// without an accelerator (data-prep boxes, CI). Multi-threaded, cache-blocked,
// with per-thread bounded heaps and a final merge.
//
// Build: make -C native  (produces liblako_native.so; loaded via ctypes from
// lako_tpu/retrieval/native.py)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Hit {
  float score;
  int64_t id;
  bool operator<(const Hit& o) const {
    // min-heap on score so the worst hit is on top
    return score > o.score;
  }
};

// Score one query against corpus rows [row_begin, row_end), maintaining a
// bounded min-heap of the best k.
void scan_block(const float* corpus, int64_t d, int64_t row_begin,
                int64_t row_end, const float* query, int64_t k,
                std::priority_queue<Hit>& heap) {
  for (int64_t r = row_begin; r < row_end; ++r) {
    const float* row = corpus + r * d;
    float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
    int64_t j = 0;
    for (; j + 4 <= d; j += 4) {  // unrolled; compiler vectorizes with -O3
      acc0 += row[j] * query[j];
      acc1 += row[j + 1] * query[j + 1];
      acc2 += row[j + 2] * query[j + 2];
      acc3 += row[j + 3] * query[j + 3];
    }
    float acc = acc0 + acc1 + acc2 + acc3;
    for (; j < d; ++j) acc += row[j] * query[j];
    if ((int64_t)heap.size() < k) {
      heap.push({acc, r});
    } else if (acc > heap.top().score) {
      heap.pop();
      heap.push({acc, r});
    }
  }
}

}  // namespace

extern "C" {

// corpus: (n, d) row-major float32; queries: (q, d); outputs (q, k) each,
// sorted by descending score. Rows beyond n are never touched. Returns 0 on
// success.
int lako_mips_topk(const float* corpus, int64_t n, int64_t d,
                   const float* queries, int64_t q, int64_t k,
                   int64_t* out_ids, float* out_scores, int n_threads) {
  if (k <= 0 || k > n || n <= 0 || d <= 0 || q <= 0) return 1;
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());

  std::atomic<int64_t> next_query{0};
  auto worker = [&]() {
    for (;;) {
      int64_t qi = next_query.fetch_add(1);
      if (qi >= q) break;
      const float* query = queries + qi * d;
      std::priority_queue<Hit> heap;
      // corpus blocking keeps the query vector hot in L1 while streaming rows
      constexpr int64_t kBlock = 4096;
      for (int64_t b = 0; b < n; b += kBlock) {
        scan_block(corpus, d, b, std::min(n, b + kBlock), query, k, heap);
      }
      // drain heap (ascending) into the tail of the output row
      int64_t pos = k - 1;
      while (!heap.empty()) {
        out_ids[qi * k + pos] = heap.top().id;
        out_scores[qi * k + pos] = heap.top().score;
        heap.pop();
        --pos;
      }
      for (; pos >= 0; --pos) {  // k > hits found (cannot happen when k <= n)
        out_ids[qi * k + pos] = -1;
        out_scores[qi * k + pos] = -1e30f;
      }
    }
  };

  std::vector<std::thread> threads;
  int nt = std::min<int64_t>(n_threads, q);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// In-place re-rank: for each row of (q, c) candidate ids, compute scores
// against that row's query and sort descending.
int lako_mips_rerank(const float* corpus, int64_t n, int64_t d,
                     const float* queries, int64_t q, const int64_t* cand_ids,
                     int64_t c, int64_t* out_ids, float* out_scores,
                     int n_threads) {
  if (n <= 0 || d <= 0 || q <= 0 || c <= 0) return 1;
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int64_t> next_query{0};
  auto worker = [&]() {
    std::vector<Hit> hits((size_t)c);
    for (;;) {
      int64_t qi = next_query.fetch_add(1);
      if (qi >= q) break;
      const float* query = queries + qi * d;
      for (int64_t j = 0; j < c; ++j) {
        int64_t id = cand_ids[qi * c + j];
        float acc = 0.f;
        if (id >= 0 && id < n) {
          const float* row = corpus + id * d;
          for (int64_t t = 0; t < d; ++t) acc += row[t] * query[t];
        } else {
          acc = -1e30f;
        }
        hits[j] = {acc, id};
      }
      std::sort(hits.begin(), hits.end(),
                [](const Hit& a, const Hit& b) { return a.score > b.score; });
      for (int64_t j = 0; j < c; ++j) {
        out_ids[qi * c + j] = hits[j].id;
        out_scores[qi * c + j] = hits[j].score;
      }
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min<int64_t>(n_threads, q);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}
}
