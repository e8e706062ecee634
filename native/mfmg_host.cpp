// Native host kernels for mfmg_tpu setup hot paths.
//
// The reference's runtime is C++ end-to-end (deal.II assembly loops,
// Trilinos CSR plumbing, cuda/utils.cu converters).  In the TPU build the
// device compute path is XLA, but the host setup pipeline keeps native
// kernels for the operations where numpy's generic dispatch is the
// bottleneck: batched agglomerate dense assembly (the np.add.at scatter),
// per-patch assembly for fast_ap, and ELL packing.
//
// Build: g++ -O3 -march=native -shared -fPIC mfmg_host.cpp -o libmfmg_host.so
// Loaded via ctypes (mfmg_tpu/native.py) with transparent numpy fallback.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Agglomerates are independent (disjoint output blocks), so the batch splits
// across host threads with no synchronization — the TPU-native analog of the
// reference's WorkStream threading over agglomerates
// (dealii/amge_host.templates.hpp:508-519).
template <typename F>
void parallel_ranges(int64_t n, F&& body)
{
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? (int64_t)hw : 1;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  if (n_threads <= 1) { body((int64_t)0, n); return; }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = n * t / n_threads, hi = n * (t + 1) / n_threads;
    pool.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Batched dense assembly for uniform structured agglomerates:
//   A_agg[g] += sum_{c in agg g} scatter(A_loc[cells_per_agg[g,c]])
// local_cells (n_bc, n_loc) gives the block-local dof index of each cell's
// local dofs and is shared by every agglomerate.
void assemble_agglomerate_batch_uniform(
    const int64_t* cells_per_agg,   // (n_agg, n_bc)
    const int64_t* local_cells,     // (n_bc, n_loc)
    const double* A_loc,            // (n_cells, n_loc, n_loc)
    double* A_agg,                  // (n_agg, m, m), zero-initialized
    int64_t n_agg, int64_t n_bc, int64_t n_loc, int64_t m)
{
  const int64_t nl2 = n_loc * n_loc;
  parallel_ranges(n_agg, [=](int64_t g_lo, int64_t g_hi) {
    for (int64_t g = g_lo; g < g_hi; ++g) {
      double* Ag = A_agg + g * m * m;
      for (int64_t c = 0; c < n_bc; ++c) {
        const double* Ac = A_loc + cells_per_agg[g * n_bc + c] * nl2;
        const int64_t* lc = local_cells + c * n_loc;
        for (int64_t i = 0; i < n_loc; ++i) {
          double* row = Ag + lc[i] * m;
          const double* src = Ac + i * n_loc;
          for (int64_t j = 0; j < n_loc; ++j)
            row[lc[j]] += src[j];
        }
      }
    }
  });
}

// float32-output variant: the downstream pipeline (batched eigensolve,
// Galerkin blocks) runs in float32 when the hierarchy dtype allows, so
// assembling straight into float halves the batch's memory traffic.
void assemble_agglomerate_batch_uniform_f32(
    const int64_t* cells_per_agg,   // (n_agg, n_bc)
    const int64_t* local_cells,     // (n_bc, n_loc)
    const double* A_loc,            // (n_cells, n_loc, n_loc)
    float* A_agg,                   // (n_agg, m, m), zero-initialized
    int64_t n_agg, int64_t n_bc, int64_t n_loc, int64_t m)
{
  const int64_t nl2 = n_loc * n_loc;
  parallel_ranges(n_agg, [=](int64_t g_lo, int64_t g_hi) {
    for (int64_t g = g_lo; g < g_hi; ++g) {
      float* Ag = A_agg + g * m * m;
      for (int64_t c = 0; c < n_bc; ++c) {
        const double* Ac = A_loc + cells_per_agg[g * n_bc + c] * nl2;
        const int64_t* lc = local_cells + c * n_loc;
        for (int64_t i = 0; i < n_loc; ++i) {
          float* row = Ag + lc[i] * m;
          const double* src = Ac + i * n_loc;
          for (int64_t j = 0; j < n_loc; ++j)
            row[lc[j]] += (float)src[j];
        }
      }
    }
  });
}

// Structured-grid stencil extraction scatter:
//   coeffs[oid_ab[a,b], rows[c,a]] += A_loc[c,a,b]
// Parallel over stencil planes (distinct oid -> disjoint output), each thread
// walking only its plane's (a,b) pairs — no synchronization.
void stencil_scatter(
    const int64_t* rows,            // (n_cells, n_loc) global node of (c, a)
    const int64_t* oid_ab,          // (n_loc, n_loc) plane id of (a, b)
    const double* A_loc,            // (n_cells, n_loc, n_loc)
    double* coeffs,                 // (n_planes, n_nodes), zero-initialized
    int64_t n_cells, int64_t n_loc, int64_t n_planes, int64_t n_nodes)
{
  // group (a, b) pairs by plane id
  std::vector<std::vector<int64_t>> pairs(n_planes);
  for (int64_t a = 0; a < n_loc; ++a)
    for (int64_t b = 0; b < n_loc; ++b)
      pairs[oid_ab[a * n_loc + b]].push_back(a * n_loc + b);
  const int64_t nl2 = n_loc * n_loc;
  parallel_ranges(n_planes, [&](int64_t p_lo, int64_t p_hi) {
    for (int64_t p = p_lo; p < p_hi; ++p) {
      double* out = coeffs + p * n_nodes;
      for (int64_t ab : pairs[p]) {
        const int64_t a = ab / n_loc;
        for (int64_t c = 0; c < n_cells; ++c)
          out[rows[c * n_loc + a]] += A_loc[c * nl2 + ab];
      }
    }
  });
}

// Generic per-patch dense assembly (ragged agglomerates / fast_ap patches):
// one patch at a time, caller loops.
void assemble_patch(
    const int64_t* cell_ids,        // (n_cells_patch,)
    const int64_t* local_cells,     // (n_cells_patch, n_loc)
    const double* A_loc,            // (n_cells_total, n_loc, n_loc)
    double* A_out,                  // (m, m), zero-initialized
    int64_t n_cells_patch, int64_t n_loc, int64_t m)
{
  const int64_t nl2 = n_loc * n_loc;
  for (int64_t c = 0; c < n_cells_patch; ++c) {
    const double* Ac = A_loc + cell_ids[c] * nl2;
    const int64_t* lc = local_cells + c * n_loc;
    for (int64_t i = 0; i < n_loc; ++i) {
      double* row = A_out + lc[i] * m;
      const double* src = Ac + i * n_loc;
      for (int64_t j = 0; j < n_loc; ++j)
        row[lc[j]] += src[j];
    }
  }
}

// CSR -> ELL packing.
void ell_pack(
    const int64_t* indptr,          // (n_rows+1,)
    const int32_t* indices,         // (nnz,)
    const double* data,             // (nnz,)
    double* vals,                   // (n_rows, L), zero-initialized
    int32_t* cols,                  // (n_rows, L), zero-initialized
    int64_t n_rows, int64_t L)
{
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t b = indptr[r], e = indptr[r + 1];
    double* vr = vals + r * L;
    int32_t* cr = cols + r * L;
    for (int64_t p = b; p < e; ++p) {
      vr[p - b] = data[p];
      cr[p - b] = indices[p];
    }
  }
}

}  // extern "C"
