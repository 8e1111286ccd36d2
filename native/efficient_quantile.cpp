// Exact quantiles via recursive nth_element partial sorting.
//
// C++ counterpart of the reference's torch extension
// (ssar/analysis/efficient_quantile/efficient_quantile.cpp, SURVEY.md §2.6):
// selection-based exact quantiles in O(n) expected time without a full sort.
// Exposed through a minimal C ABI consumed via ctypes
// (ssar_tpu/utils/native.py) — used as the host-side oracle for the TPU
// sort-based quantiles and for host-side pipelines (video feature
// normalisation on decoded frames).
//
// Build: ssar_tpu/utils/native.py compiles this with g++ -O3 -shared on
// first use and caches the .so next to this file.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Linear-interpolation quantile (torch.quantile semantics) of x[0..n).
// Scratch-copies the input; q in [0, 1].
double quantile_f32(const float* x, int64_t n, double q) {
  if (n <= 0) return 0.0;
  if (n == 1) return x[0];
  std::vector<float> buf(x, x + n);
  double pos = q * static_cast<double>(n - 1);
  int64_t lo = static_cast<int64_t>(std::floor(pos));
  if (lo < 0) lo = 0;
  if (lo > n - 2) lo = n - 2;
  double frac = pos - static_cast<double>(lo);

  std::nth_element(buf.begin(), buf.begin() + lo, buf.end());
  float vlo = buf[lo];
  // the (lo+1)-th order statistic is the min of the upper partition
  float vhi = *std::min_element(buf.begin() + lo + 1, buf.end());
  return static_cast<double>(vlo) + frac * (static_cast<double>(vhi) - vlo);
}

// Batch variant: m independent quantiles over columns of a row-major
// (n, m) matrix (per-channel clamps).
void quantile_f32_cols(const float* x, int64_t n, int64_t m, double q, double* out) {
  std::vector<float> buf(n);
  for (int64_t c = 0; c < m; ++c) {
    for (int64_t i = 0; i < n; ++i) buf[i] = x[i * m + c];
    out[c] = quantile_f32(buf.data(), n, q);
  }
}

// In-place clamp of x to [lo_q, hi_q] quantiles followed by min-max
// normalisation — the reference's `standardize` (processing.py:58-61).
void standardize_f32(float* x, int64_t n, double lo_q, double hi_q) {
  if (n <= 0) return;
  float lo = static_cast<float>(quantile_f32(x, n, lo_q));
  float hi = static_cast<float>(quantile_f32(x, n, hi_q)) + 1e-10f;
  float mn = 1e30f, mx = -1e30f;
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i] < lo ? lo : (x[i] > hi ? hi : x[i]);
    x[i] = v;
    mn = std::min(mn, v);
    mx = std::max(mx, v);
  }
  float scale = 1.0f / (mx - mn + 1e-8f);
  for (int64_t i = 0; i < n; ++i) x[i] = (x[i] - mn) * scale;
}

}  // extern "C"
