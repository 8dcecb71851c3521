// Batched bicubic resize + RGB batch assembly, multithreaded.
//
// Implements PIL-compatible convolution resampling (separable bicubic,
// Catmull-Rom a = -0.5, with filter support scaled by the downscale factor —
// the same algorithm as Pillow's ImagingResample, reimplemented from the
// published algorithm, float accumulation). Used by the scan pipeline's
// native preprocessing path to resize many decoded RGB images into one
// (B, S, S, 3) uint8 batch without per-image Python overhead.
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline double bicubic_filter(double x) {
  // Keys cubic, a = -0.5 (PIL's BICUBIC).
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}
constexpr double kSupport = 2.0;

struct Coeffs {
  std::vector<int> bounds;     // (out, 2): start, size
  std::vector<double> weights; // (out, ksize)
  int ksize;
};

Coeffs precompute(int in_size, int out_size) {
  Coeffs c;
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = kSupport * filterscale;
  int ksize = (int)ceil(support) * 2 + 1;
  c.ksize = ksize;
  c.bounds.resize(out_size * 2);
  c.weights.assign((size_t)out_size * ksize, 0.0);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    // Window bounds use +0.5 rounding, exactly like Pillow's
    // ImagingResampleHorizontal — floor/ceil admits an extra tap whose
    // negative cubic lobe visibly changes upscaled pixels.
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int size = xmax - xmin;
    double* w = &c.weights[(size_t)xx * ksize];
    double total = 0.0;
    for (int i = 0; i < size; i++) {
      double weight = bicubic_filter((i + xmin - center + 0.5) / filterscale);
      w[i] = weight;
      total += weight;
    }
    if (total != 0.0)
      for (int i = 0; i < size; i++) w[i] /= total;
    c.bounds[xx * 2] = xmin;
    c.bounds[xx * 2 + 1] = size;
  }
  return c;
}

inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return (uint8_t)lround(v);
}

// Resize one RGB image (h, w, 3) uint8 → (out, out, 3) uint8.
void resize_one(const uint8_t* src, int h, int w, int out_size, uint8_t* dst,
                const Coeffs* hc_cache, const Coeffs* vc_cache) {
  Coeffs hc_local, vc_local;
  const Coeffs* hc = hc_cache;
  const Coeffs* vc = vc_cache;
  if (!hc) { hc_local = precompute(w, out_size); hc = &hc_local; }
  if (!vc) { vc_local = precompute(h, out_size); vc = &vc_local; }

  // Horizontal pass: (h, w, 3) → (h, out, 3). The intermediate is quantized
  // to uint8 exactly like Pillow's two-pass ImagingResample (8bpc), so
  // overshooting cubic lobes clip identically between the passes.
  std::vector<uint8_t> tmp((size_t)h * out_size * 3);
  for (int y = 0; y < h; y++) {
    const uint8_t* row = src + (size_t)y * w * 3;
    uint8_t* trow = &tmp[(size_t)y * out_size * 3];
    for (int x = 0; x < out_size; x++) {
      int xmin = hc->bounds[x * 2], size = hc->bounds[x * 2 + 1];
      const double* wgt = &hc->weights[(size_t)x * hc->ksize];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < size; i++) {
        const uint8_t* p = row + (size_t)(xmin + i) * 3;
        r += wgt[i] * p[0];
        g += wgt[i] * p[1];
        b += wgt[i] * p[2];
      }
      trow[x * 3] = clip8(r);
      trow[x * 3 + 1] = clip8(g);
      trow[x * 3 + 2] = clip8(b);
    }
  }
  // Vertical pass: (h, out, 3) → (out, out, 3) uint8.
  for (int y = 0; y < out_size; y++) {
    int ymin = vc->bounds[y * 2], size = vc->bounds[y * 2 + 1];
    const double* wgt = &vc->weights[(size_t)y * vc->ksize];
    uint8_t* drow = dst + (size_t)y * out_size * 3;
    for (int x = 0; x < out_size; x++) {
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < size; i++) {
        const uint8_t* p = &tmp[((size_t)(ymin + i) * out_size + x) * 3];
        r += wgt[i] * p[0];
        g += wgt[i] * p[1];
        b += wgt[i] * p[2];
      }
      drow[x * 3] = clip8(r);
      drow[x * 3 + 1] = clip8(g);
      drow[x * 3 + 2] = clip8(b);
    }
  }
}

}  // namespace

extern "C" {

// Resize one RGB uint8 image.
void tpuclip_resize_bicubic(const uint8_t* src, int h, int w, int out_size,
                            uint8_t* dst) {
  resize_one(src, h, w, out_size, dst, nullptr, nullptr);
}

// Batch: `n` images with per-image dims (hs[i], ws[i]) at srcs[i], resized
// into dst (n, out, out, 3), across `threads` workers.
void tpuclip_resize_batch(const uint8_t** srcs, const int* hs, const int* ws,
                          int64_t n, int out_size, int threads, uint8_t* dst) {
  if (threads < 1) threads = 1;
  std::atomic<int64_t>* next = new std::atomic<int64_t>(0);
  auto worker = [&, next] {
    for (;;) {
      int64_t i = next->fetch_add(1);
      if (i >= n) break;
      resize_one(srcs[i], hs[i], ws[i], out_size,
                 dst + (size_t)i * out_size * out_size * 3, nullptr, nullptr);
    }
  };
  if (threads == 1 || n == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < std::min<int64_t>(threads, n); t++)
      pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  delete next;
}

}  // extern "C"
