// Packed-bit Hamming operations (popcount over uint64 words).
//
// The reference's duplicate filter compares unpacked byte vectors in Python
// (O(n^2) np.sum over 1152-byte rows, image_database.py:1278-1294) and its
// binary search fallback does a Python-loop dot per row (:1616-1625). These
// native equivalents work on packed bits (18 x uint64 words per 1152-d
// vector) with hardware popcount, multithreaded across rows.
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint32_t popcount64(uint64_t x) { return __builtin_popcountll(x); }

inline uint32_t hamming_words(const uint64_t* a, const uint64_t* b, int words) {
  uint32_t acc = 0;
  for (int i = 0; i < words; i++) acc += popcount64(a[i] ^ b[i]);
  return acc;
}

void parallel_for(int64_t n, int threads, void (*body)(int64_t, int64_t, void*),
                  void* ctx) {
  if (threads <= 1 || n < 1024) {
    body(0, n, ctx);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; t++) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    pool.emplace_back([=] { body(lo, hi, ctx); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Pairwise Hamming distances: a (n, words), b (n, words) → out (n,)
void tpuclip_hamming_rows(const uint64_t* a, const uint64_t* b, int64_t n,
                          int words, uint32_t* out) {
  for (int64_t i = 0; i < n; i++)
    out[i] = hamming_words(a + i * words, b + i * words, words);
}

// All-pairs Hamming matrix: rows (n, words) → out (n, n) int32.
void tpuclip_hamming_all_pairs(const uint64_t* rows, int64_t n, int words,
                               int32_t* out) {
  for (int64_t i = 0; i < n; i++) {
    out[i * n + i] = 0;
    for (int64_t j = i + 1; j < n; j++) {
      int32_t d = (int32_t)hamming_words(rows + i * words, rows + j * words, words);
      out[i * n + j] = d;
      out[j * n + i] = d;
    }
  }
}

// Duplicate clustering with the reference's champion semantics
// (image_database.py:1278-1294): iterate rows in order; a row within
// `tolerance` bits of an existing champion joins that cluster (replacing the
// champion if its similarity is higher), otherwise becomes a new champion.
// rows: (n, words) packed bits, similarities: (n,) float32.
// out_champion: (n,) int64 — for each input row, the row index of its
// cluster's final champion. Returns the number of clusters.
int64_t tpuclip_dedup_champions(const uint64_t* rows, const float* sims,
                                int64_t n, int words, int32_t tolerance,
                                int64_t* out_champion) {
  std::vector<int64_t> champs;  // row index of each cluster champion
  std::vector<int64_t> cluster_of(n);
  champs.reserve(64);
  for (int64_t i = 0; i < n; i++) {
    int64_t found = -1;
    for (size_t c = 0; c < champs.size(); c++) {
      if ((int32_t)hamming_words(rows + i * words, rows + champs[c] * words,
                                 words) <= tolerance) {
        found = (int64_t)c;
        break;
      }
    }
    if (found < 0) {
      cluster_of[i] = (int64_t)champs.size();
      champs.push_back(i);
    } else {
      cluster_of[i] = found;
      if (sims[i] > sims[champs[found]]) champs[found] = i;
    }
  }
  for (int64_t i = 0; i < n; i++) out_champion[i] = champs[cluster_of[i]];
  return (int64_t)champs.size();
}

// Binary search scan: query (words,) packed bits, matrix (n, words) packed
// bits (both in the SAME bit order) → out (n,) int32 match counts
// (popcount(q & row)), multithreaded. This is the exact integer score of the
// reference's binary fallback (dot of 0/1 vectors, image_database.py:1621).
struct ScanCtx {
  const uint64_t* q;
  const uint64_t* m;
  int words;
  int32_t* out;
};

static void scan_body(int64_t lo, int64_t hi, void* vctx) {
  auto* ctx = (ScanCtx*)vctx;
  for (int64_t i = lo; i < hi; i++) {
    const uint64_t* row = ctx->m + i * ctx->words;
    uint32_t acc = 0;
    for (int w = 0; w < ctx->words; w++) acc += popcount64(ctx->q[w] & row[w]);
    ctx->out[i] = (int32_t)acc;
  }
}

void tpuclip_binary_scan(const uint64_t* query, const uint64_t* matrix,
                         int64_t n, int words, int threads, int32_t* out) {
  ScanCtx ctx{query, matrix, words, out};
  parallel_for(n, threads, scan_body, &ctx);
}

}  // extern "C"
