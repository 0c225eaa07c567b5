// Multithreaded host-side Sinkhorn distance (entropy-regularized OT).
//
// Native-tier counterpart of the reference's single native dependency —
// pykeops' JIT-compiled C++/CUDA LazyTensor reductions used by
// sde_sampler/eval/sinkhorn.py:112-179. On TPU the tiled-XLA kernel in
// ../sinkhorn.py is the right design (the MXU does the pairwise inner
// products); this library serves the host path: CPU-only eval boxes,
// post-hoc metric sweeps over pickled samples, and very large n where the
// duals iterate best near the data.
//
// Semantics match Sinkhorn.compute exactly: log-domain eps-scaled updates
// with a geometric eps-annealing warm start, max-iteration cap, and the
// max|Δdual| stopping rule. The n×m cost matrix is materialized once (as
// float) when it fits the cache budget — iterations then cost O(nm) rather
// than O(nm·d) — and recomputed blockwise otherwise, so peak memory stays
// bounded just like the LazyTensor/XLA versions.
//
// Built JIT by eval/native/__init__.py (g++ -O3 -fopenmp -shared) the same
// way pykeops compiles on first use; no build step ships with the wheel.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline double dist_p(const float* xi, const float* yj, int d, int p) {
  double s = 0.0;
  if (p == 2) {
    for (int k = 0; k < d; ++k) {
      const double t = double(xi[k]) - double(yj[k]);
      s += t * t;
    }
    return std::sqrt(s);
  }
  if (p == 1) {
    for (int k = 0; k < d; ++k) s += std::fabs(double(xi[k]) - double(yj[k]));
    return s;
  }
  for (int k = 0; k < d; ++k)
    s += std::pow(std::fabs(double(xi[k]) - double(yj[k])), p);
  return std::pow(s, 1.0 / double(p));
}

// logsumexp over j of (-M(row, j) + dual[j]) / eps for every row of `a`
// (rows of x when transpose == false, rows of y when true). Compiled with
// -ffast-math so the exp loops vectorize through libmvec; the Python
// wrapper clamps log-weights so no input is ever ±inf.
void lse_rows(const float* x, int64_t n, const float* y, int64_t m, int d,
              int p, const float* cost /* n*m row-major or nullptr */,
              const double* dual, double eps, bool transpose, double* out) {
  const int64_t rows = transpose ? m : n;
  const int64_t cols = transpose ? n : m;
  const double inv_eps = 1.0 / eps;
#pragma omp parallel
  {
    std::vector<double> row(size_t(cols), 0.0);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < rows; ++i) {
      if (cost) {
        // `cost` is pre-transposed by the caller when transpose==true, so
        // both directions stream rows sequentially (no strided reads)
        const float* ci = cost + i * cols;
        for (int64_t j = 0; j < cols; ++j)
          row[size_t(j)] = (dual[j] - double(ci[j])) * inv_eps;
      } else {
        for (int64_t j = 0; j < cols; ++j) {
          const float* xi = transpose ? y + i * d : x + i * d;
          const float* yj = transpose ? x + j * d : y + j * d;
          row[size_t(j)] = (dual[j] - dist_p(xi, yj, d, p)) * inv_eps;
        }
      }
      double mx = row[0];
      for (int64_t j = 1; j < cols; ++j) mx = std::max(mx, row[size_t(j)]);
      double s = 0.0;
      for (int64_t j = 0; j < cols; ++j) s += std::exp(row[size_t(j)] - mx);
      out[i] = mx + std::log(s);
    }
  }
}

}  // namespace

extern "C" {

// Returns the Sinkhorn distance sum_ij P_ij M_ij; -1.0 on invalid input.
// log_a / log_b are the log importance weights (length n / m).
double sinkhorn_cpu(const float* x, int64_t n, const float* y, int64_t m,
                    int d, const double* log_a, const double* log_b, int p,
                    double eps, double eps_start, int anneal, int max_iters,
                    double stop_thresh, int64_t cost_cache_bytes,
                    int n_threads) {
  if (n <= 0 || m <= 0 || d <= 0 || p <= 0 || eps <= 0.0) return -1.0;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif

  // materialize the cost matrix AND its transpose when they fit the budget:
  // iterations then cost O(nm) with purely sequential reads in both update
  // directions (a strided column sweep over a few-hundred-MB matrix is
  // cache-miss bound and ~5x slower)
  std::vector<float> cost, cost_t;
  const float* cost_ptr = nullptr;
  const float* cost_t_ptr = nullptr;
  if (cost_cache_bytes > 0 &&
      2 * n * m * int64_t(sizeof(float)) <= cost_cache_bytes) {
    cost.resize(size_t(n) * size_t(m));
    cost_t.resize(size_t(n) * size_t(m));
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < m; ++j) {
        const float mij = float(dist_p(x + i * d, y + j * d, d, p));
        cost[i * m + j] = mij;
        cost_t[j * n + i] = mij;
      }
    cost_ptr = cost.data();
    cost_t_ptr = cost_t.data();
  }

  // geometric eps schedule: eps_start -> eps over the first 2/3 of the
  // budget, then polish at the target eps (mirrors Sinkhorn.compute)
  std::vector<double> eps_sched(size_t(max_iters), eps);
  if (anneal && eps_start > eps && max_iters > 0) {
    const int n_anneal = std::max(max_iters * 2 / 3, 1);
    const double decay = std::pow(eps / eps_start, 1.0 / double(n_anneal));
    double e = eps_start;
    for (int it = 0; it < max_iters; ++it) {
      eps_sched[size_t(it)] = std::max(e, eps);
      e *= decay;
    }
  }

  std::vector<double> u(size_t(n), 0.0);
  std::vector<double> v(size_t(m), 0.0);
  for (int64_t j = 0; j < m; ++j) v[size_t(j)] = eps * log_b[j];
  std::vector<double> u_new(size_t(n), 0.0);
  std::vector<double> v_new(size_t(m), 0.0);

  for (int it = 0; it < max_iters; ++it) {
    const double e = eps_sched[size_t(it)];
    lse_rows(x, n, y, m, d, p, cost_ptr, v.data(), e, false, u_new.data());
    for (int64_t i = 0; i < n; ++i)
      u_new[size_t(i)] = e * (log_a[i] - u_new[size_t(i)]);
    lse_rows(x, n, y, m, d, p, cost_t_ptr, u_new.data(), e, true,
             v_new.data());
    for (int64_t j = 0; j < m; ++j)
      v_new[size_t(j)] = e * (log_b[j] - v_new[size_t(j)]);
    double err = 0.0;
    for (int64_t i = 0; i < n; ++i)
      err = std::max(err, std::fabs(u[size_t(i)] - u_new[size_t(i)]));
    for (int64_t j = 0; j < m; ++j)
      err = std::max(err, std::fabs(v[size_t(j)] - v_new[size_t(j)]));
    u.swap(u_new);
    v.swap(v_new);
    if (e <= eps && err <= stop_thresh) break;  // never stop mid-anneal
  }

  // distance = sum_ij P_ij M_ij
  double total = 0.0;
#pragma omp parallel for schedule(static) reduction(+ : total)
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int64_t j = 0; j < m; ++j) {
      const double mij = cost_ptr ? double(cost_ptr[i * m + j])
                                  : dist_p(x + i * d, y + j * d, d, p);
      acc += std::exp((-mij + u[size_t(i)] + v[size_t(j)]) / eps) * mij;
    }
    total += acc;
  }
  return total;
}

int sinkhorn_cpu_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
