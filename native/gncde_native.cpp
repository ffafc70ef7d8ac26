// Native host-side data-preprocessing kernels for gncde_tpu.
//
// The reference is pure Python (SURVEY.md section 2: no native components),
// so this library is new TPU-framework runtime: it accelerates the
// host-side graph-format conversions that sit on the input path at scale --
// edge-list -> ELL (padded neighbour lists) and edge-list -> dense adjacency
// accumulation, both O(nnz) loops that are slow in Python.
//
// Build: g++ -O3 -march=native -shared -fPIC gncde_native.cpp -o libgncde_native.so
// Bound via ctypes (gncde_tpu/native.py); numpy fallback when unavailable.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Edge list -> ELL. indices must be pre-filled with `n` (padding), values
// with 0. Rows with degree > K drop the excess (caller sizes K = max degree).
void gncde_build_ell(const int64_t* src, const int64_t* dst, const float* w,
                     int64_t nnz, int64_t n, int64_t K,
                     int32_t* indices, float* values, int64_t* slots) {
  std::memset(slots, 0, sizeof(int64_t) * n);
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t r = src[e];
    if (r < 0 || r >= n) continue;
    int64_t s = slots[r];
    if (s < K) {
      indices[r * K + s] = static_cast<int32_t>(dst[e]);
      values[r * K + s] = w ? w[e] : 1.0f;
      slots[r] = s + 1;
    }
  }
}

// Edge list -> dense adjacency (duplicate edges accumulate). A must be
// zero-initialised, shape (n, n) row-major.
void gncde_dense_adj(const int64_t* src, const int64_t* dst, const float* w,
                     int64_t nnz, int64_t n, float* A) {
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t r = src[e], c = dst[e];
    if (r < 0 || r >= n || c < 0 || c >= n) continue;
    A[r * n + c] += w ? w[e] : 1.0f;
  }
}

// Row degree histogram (for choosing ELL K).
void gncde_degrees(const int64_t* src, int64_t nnz, int64_t n, int64_t* degs) {
  std::memset(degs, 0, sizeof(int64_t) * n);
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t r = src[e];
    if (r >= 0 && r < n) degs[r] += 1;
  }
}

// Backward-Hermite cubic coefficients for a (T, C) signal (time-major,
// C = flattened channel count). Outputs d, c, b, a each (T-1, C).
void gncde_hermite_coeffs(const double* ts, const float* ys,
                          int64_t T, int64_t C,
                          float* d, float* c, float* b, float* a) {
  for (int64_t i = 0; i + 1 < T; ++i) {
    double h = ts[i + 1] - ts[i];
    double hm = (i > 0) ? (ts[i] - ts[i - 1]) : h;
    const float* y0 = ys + i * C;
    const float* y1 = ys + (i + 1) * C;
    const float* ym = (i > 0) ? ys + (i - 1) * C : ys;
    for (int64_t k = 0; k < C; ++k) {
      double slope = (double(y1[k]) - double(y0[k])) / h;
      double f0 = (i > 0) ? (double(y0[k]) - double(ym[k])) / hm : slope;
      // f1 = backward difference at the right knot = this interval's slope.
      double f1 = slope;
      a[i * C + k] = y0[k];
      b[i * C + k] = static_cast<float>(f0);
      c[i * C + k] = static_cast<float>((3.0 * slope - 2.0 * f0 - f1) / h);
      d[i * C + k] = static_cast<float>((f0 + f1 - 2.0 * slope) / (h * h));
    }
  }
}

// Edge list -> blocked-ELL (BCSR) pattern bitmap: mark[rb * nb + cb] = 1
// for every touched (row-block, col-block). nb = ceil(n / bs).
void gncde_bcsr_pattern(const int64_t* src, const int64_t* dst, int64_t nnz,
                        int64_t n, int64_t bs, uint8_t* mark) {
  int64_t nb = (n + bs - 1) / bs;
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t r = src[e], c = dst[e];
    if (r < 0 || r >= n || c < 0 || c >= n) continue;
    mark[(r / bs) * nb + (c / bs)] = 1;
  }
}

// Edge list -> BCSR tile values at a fixed pattern. slot_lut[rb * nb + cb]
// holds the slot index of col-block cb in row-block rb (or -1 when the
// block is not stored). blocks must be zero-initialised,
// shape (nb, kb, bs, bs) row-major; duplicate edges accumulate.
void gncde_bcsr_scatter(const int64_t* src, const int64_t* dst,
                        const float* w, int64_t nnz, int64_t n, int64_t bs,
                        int64_t kb, const int32_t* slot_lut, float* blocks) {
  int64_t nb = (n + bs - 1) / bs;
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t r = src[e], c = dst[e];
    if (r < 0 || r >= n || c < 0 || c >= n) continue;
    int64_t rb = r / bs, cb = c / bs;
    int32_t s = slot_lut[rb * nb + cb];
    if (s < 0) continue;
    blocks[((rb * kb + s) * bs + (r - rb * bs)) * bs + (c - cb * bs)] +=
        w ? w[e] : 1.0f;
  }
}

}  // extern "C"
