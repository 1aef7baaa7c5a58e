// Native host-side kernels for the structure compiler.
//
// The reference reaches native performance through Julia's LAPACK/BLAS
// bindings; its host-side structure analysis (`getOverlap`, fit.jl:12-39,
// O(L^2 * N) bitmask xors; `getchild` routing, common.jl:101-122) is pure
// Julia. Here the device math is XLA/Pallas and these host loops are C++:
//
//  * intersect_counts — pairwise popcount(AND) over packed leaf-observation
//    bitsets: the kernel inside the overlap matrix D.
//  * route_box — half-open box membership of test points against leaf
//    bounding boxes: the routing kernel behind prediction.
//  * pack_leaves_* — the data loader: ragged->padded gather of each leaf's
//    training rows into the device-bound [Lb, nmax, ...] blocks with dtype
//    conversion (f64 host data -> f32/f64 device layout), parallel over
//    leaves.
//
// Built as a plain shared library (see native/Makefile) and loaded via
// ctypes (deepstructuredmixtures_tpu/utils/native.py) with a NumPy
// fallback when absent.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// masks: [L, W] packed uint64 bitsets (W words per leaf).
// out:   [L, L] int64 intersection cardinalities (symmetric, diag = |n|).
void dsm_intersect_counts(const uint64_t* masks, int64_t L, int64_t W,
                          int64_t* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 4)
#endif
  for (int64_t i = 0; i < L; ++i) {
    const uint64_t* mi = masks + i * W;
    for (int64_t j = i; j < L; ++j) {
      const uint64_t* mj = masks + j * W;
      int64_t c = 0;
      for (int64_t w = 0; w < W; ++w) {
        c += __builtin_popcountll(mi[w] & mj[w]);
      }
      out[i * L + j] = c;
      out[j * L + i] = c;
    }
  }
}

// xt: [T, D] test points; lb/ub: [L, D] half-open boxes (lb < x <= ub).
// out: [T, L] uint8 membership.
void dsm_route_box(const double* xt, int64_t T, int64_t D, const double* lb,
                   const double* ub, int64_t L, uint8_t* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t t = 0; t < T; ++t) {
    const double* x = xt + t * D;
    uint8_t* row = out + t * L;
    for (int64_t l = 0; l < L; ++l) {
      const double* lo = lb + l * D;
      const double* hi = ub + l * D;
      uint8_t ok = 1;
      for (int64_t d = 0; d < D; ++d) {
        if (!(x[d] > lo[d] && x[d] <= hi[d])) {
          ok = 0;
          break;
        }
      }
      row[l] = ok;
    }
  }
}

// Packed routed index construction: for each leaf, the indices of its
// member test points, padded to tmax. member: [T, L]; tidx/tmask: [L, tmax].
void dsm_pack_routes(const uint8_t* member, int64_t T, int64_t L,
                     int64_t tmax, int32_t* tidx, uint8_t* tmask) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t l = 0; l < L; ++l) {
    int64_t k = 0;
    int32_t* ti = tidx + l * tmax;
    uint8_t* tm = tmask + l * tmax;
    for (int64_t t = 0; t < T && k < tmax; ++t) {
      if (member[t * L + l]) {
        ti[k] = static_cast<int32_t>(t);
        tm[k] = 1;
        ++k;
      }
    }
    for (; k < tmax; ++k) {
      ti[k] = 0;
      tm[k] = 0;
    }
  }
}

}  // extern "C"

// Ragged->padded leaf packing (the host data loader feeding device_put):
// gather X [N, D] / y [N] rows (float64, C-contiguous) for each leaf's
// observation list into padded [Lb, nmax, D] / [Lb, nmax] blocks of type T,
// set the validity mask. Output buffers are pre-zeroed by the caller
// (np.zeros), so only valid rows are written.
template <typename T>
static void pack_leaves(const double* X, const double* y, int64_t D,
                        const int64_t* obs, const int64_t* starts,
                        const int64_t* lens, int64_t Lb, int64_t nmax, T* xb,
                        T* yb, uint8_t* mb) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 8)
#endif
  for (int64_t l = 0; l < Lb; ++l) {
    const int64_t* o = obs + starts[l];
    const int64_t n = lens[l];
    T* xr = xb + l * nmax * D;
    T* yr = yb + l * nmax;
    uint8_t* mr = mb + l * nmax;
    for (int64_t i = 0; i < n; ++i) {
      const double* src = X + o[i] * D;
      T* dst = xr + i * D;
      for (int64_t d = 0; d < D; ++d) dst[d] = static_cast<T>(src[d]);
      yr[i] = static_cast<T>(y[o[i]]);
      mr[i] = 1;
    }
  }
}

extern "C" {

void dsm_pack_leaves_f32(const double* X, const double* y, int64_t D,
                         const int64_t* obs, const int64_t* starts,
                         const int64_t* lens, int64_t Lb, int64_t nmax,
                         float* xb, float* yb, uint8_t* mb) {
  pack_leaves<float>(X, y, D, obs, starts, lens, Lb, nmax, xb, yb, mb);
}

void dsm_pack_leaves_f64(const double* X, const double* y, int64_t D,
                         const int64_t* obs, const int64_t* starts,
                         const int64_t* lens, int64_t Lb, int64_t nmax,
                         double* xb, double* yb, uint8_t* mb) {
  pack_leaves<double>(X, y, D, obs, starts, lens, Lb, nmax, xb, yb, mb);
}

}  // extern "C"
