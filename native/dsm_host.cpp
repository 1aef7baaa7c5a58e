// Native host-side kernels for the structure compiler.
//
// The reference reaches native performance through Julia's LAPACK/BLAS
// bindings; its host-side structure analysis (`getOverlap`, fit.jl:12-39,
// O(L^2 * N) bitmask xors; `getchild` routing, common.jl:101-122) is pure
// Julia. Here the device math is XLA/Pallas and these host loops are C++:
//
//  * intersect_counts — pairwise popcount(AND) over packed leaf-observation
//    bitsets: the kernel inside the overlap matrix D (dense path).
//  * box_pairs_count / box_pairs_fill — sweep enumeration of leaf pairs
//    whose bounding boxes intersect: the O(L^2 D) prefilter that makes the
//    overlap analysis sparse (leaves overlap only if their boxes do), so
//    the frontier 20k-leaf trees no longer need O(L^2 N) bitmask work.
//  * pair_intersect — |obs_i ∩ obs_j| for the candidate pairs via sorted
//    merge, with an O(1) fast path for contiguous index ranges (sorted
//    1-D trees produce exactly those).
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

// Box-intersection pair sweep. Boxes are half-open (lb < x <= ub), so two
// leaves' observation sets can only intersect when lb_i < ub_j AND
// lb_j < ub_i on EVERY dimension (strict: segments meeting at a split
// threshold share no points). `order` is the leaf permutation sorted
// ascending by lb[:, 0]; the inner loop then terminates at the first j
// with lb0_j >= ub0_i (no later candidate can intersect on dim 0).
// Emits canonical pairs (min, max). Template over emit vs count so the
// sweep runs twice (count -> host alloc -> fill) without code drift.
static int64_t box_pairs_sweep(const double* lb, const double* ub, int64_t L,
                               int64_t D, const int64_t* order, int32_t* pi,
                               int32_t* pj) {
  int64_t cnt = 0;
  for (int64_t a = 0; a < L; ++a) {
    const int64_t i = order[a];
    const double hi0 = ub[i * D];
    for (int64_t b = a + 1; b < L; ++b) {
      const int64_t j = order[b];
      if (lb[j * D] >= hi0) break;
      bool ok = true;
      for (int64_t d = 1; d < D; ++d) {
        if (!(lb[i * D + d] < ub[j * D + d] &&
              lb[j * D + d] < ub[i * D + d])) {
          ok = false;
          break;
        }
      }
      if (ok) {
        if (pi) {
          pi[cnt] = static_cast<int32_t>(i < j ? i : j);
          pj[cnt] = static_cast<int32_t>(i < j ? j : i);
        }
        ++cnt;
      }
    }
  }
  return cnt;
}

int64_t dsm_box_pairs_count(const double* lb, const double* ub, int64_t L,
                            int64_t D, const int64_t* order) {
  return box_pairs_sweep(lb, ub, L, D, order, nullptr, nullptr);
}

void dsm_box_pairs_fill(const double* lb, const double* ub, int64_t L,
                        int64_t D, const int64_t* order, int32_t* pi,
                        int32_t* pj) {
  box_pairs_sweep(lb, ub, L, D, order, pi, pj);
}

// |obs_i ∩ obs_j| per candidate pair. obs: concatenated ASCENDING-sorted
// per-leaf index lists (starts/lens index into it); contig[l] marks leaves
// whose indices form a contiguous range (obs[last]-obs[first]+1 == len —
// O(1) intersection). General case: sorted merge, narrowed by binary
// search to the pair's overlapping value range first.
static int64_t lower_bound_i64(const int64_t* a, int64_t n, int64_t v) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (a[mid] < v)
      lo = mid + 1;
    else
      hi = mid;
  }
  return lo;
}

void dsm_pair_intersect(const int64_t* obs, const int64_t* starts,
                        const int64_t* lens, const uint8_t* contig,
                        const int32_t* pi, const int32_t* pj, int64_t P,
                        int64_t* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 64)
#endif
  for (int64_t p = 0; p < P; ++p) {
    const int64_t i = pi[p], j = pj[p];
    const int64_t *A = obs + starts[i], *B = obs + starts[j];
    const int64_t na = lens[i], nb = lens[j];
    if (na == 0 || nb == 0) {
      out[p] = 0;
      continue;
    }
    const int64_t lo = A[0] > B[0] ? A[0] : B[0];
    const int64_t hi = A[na - 1] < B[nb - 1] ? A[na - 1] : B[nb - 1];
    if (lo > hi) {
      out[p] = 0;
      continue;
    }
    if (contig[i] && contig[j]) {
      out[p] = hi - lo + 1;
      continue;
    }
    // narrow both lists to [lo, hi], then linear merge
    int64_t ai = lower_bound_i64(A, na, lo);
    int64_t bi = lower_bound_i64(B, nb, lo);
    const int64_t ae = lower_bound_i64(A, na, hi + 1);
    const int64_t be = lower_bound_i64(B, nb, hi + 1);
    int64_t c = 0;
    while (ai < ae && bi < be) {
      const int64_t va = A[ai], vb = B[bi];
      if (va == vb) {
        ++c;
        ++ai;
        ++bi;
      } else if (va < vb) {
        ++ai;
      } else {
        ++bi;
      }
    }
    out[p] = c;
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
