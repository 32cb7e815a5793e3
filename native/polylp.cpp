// polylp — dense LP + polytope kernels for the offline set-synthesis layer.
//
// Native replacement for what the reference delegated to compiled third-party
// code (MATLAB linprog / MPT3's LP core; see SURVEY.md §2): support-function
// LPs, batched redundancy elimination (min H-rep), and Pontryagin-difference
// row shrinking, called from Python via ctypes (lbmpc_tpu/sets/native.py).
//
// Algorithm: Mehrotra predictor-corrector primal-dual IPM on
//     max c'x  s.t.  F x <= h
// with slacks s > 0, duals z > 0; the KKT normal matrix (F' D F) is factored
// by a dense Cholesky. Dimensions here are tiny (n <= ~16, m <= ~10k rows),
// so everything is plain dense double-precision with no BLAS dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpolylp.so polylp.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Solve A x = b for SPD A (n x n) in-place via Cholesky. Returns false if the
// factorization breaks down.
bool chol_solve(int n, double* A, double* b) {
  // factor: A = L L^T (lower in-place)
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (d <= 0.0 || !std::isfinite(d)) return false;
    d = std::sqrt(d);
    A[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double v = A[i * n + j];
      for (int k = 0; k < j; ++k) v -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = v / d;
    }
  }
  // forward solve L y = b
  for (int i = 0; i < n; ++i) {
    double v = b[i];
    for (int k = 0; k < i; ++k) v -= A[i * n + k] * b[k];
    b[i] = v / A[i * n + i];
  }
  // backward solve L^T x = y
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int k = i + 1; k < n; ++k) v -= A[k * n + i] * b[k];
    b[i] = v / A[i * n + i];
  }
  return true;
}

struct Work {
  std::vector<double> x, s, z, rd, rp, d, M, rhs, dx, ds, dz, dx2, ds2, dz2;
};

// Returns 0 on success (optimal), 1 on numerical failure, 2 if (near)
// unbounded. On success *val = c'x at the optimum.
int lp_support(int n, int m, const double* c, const double* F, const double* h,
               double* x_out, double* val, int iters) {
  Work w;
  w.x.assign(n, 0.0);
  w.s.assign(m, 0.0);
  w.z.assign(m, 1.0);
  w.rd.resize(n);
  w.rp.resize(m);
  w.d.resize(m);
  w.M.resize(n * n);
  w.rhs.resize(n);
  w.dx.resize(n);
  w.ds.resize(m);
  w.dz.resize(m);
  double hmax = 1.0;
  for (int i = 0; i < m; ++i) {
    double si = h[i];  // s = h - F*0
    w.s[i] = si > 1.0 ? si : 1.0;
    hmax = std::max(hmax, std::fabs(h[i]));
  }
  double cnorm = 0.0;
  for (int j = 0; j < n; ++j) cnorm = std::max(cnorm, std::fabs(c[j]));
  if (cnorm == 0.0) { *val = 0.0; std::memset(x_out, 0, n * sizeof(double)); return 0; }

  for (int it = 0; it < iters; ++it) {
    // residuals: rd = -c + F' z ; rp = F x + s - h
    for (int j = 0; j < n; ++j) w.rd[j] = -c[j];
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) w.rd[j] += F[i * n + j] * w.z[i];
    double mu = 0.0;
    for (int i = 0; i < m; ++i) {
      double fx = 0.0;
      for (int j = 0; j < n; ++j) fx += F[i * n + j] * w.x[j];
      w.rp[i] = fx + w.s[i] - h[i];
      mu += w.s[i] * w.z[i];
    }
    mu /= m;
    double rpmax = 0.0, rdmax = 0.0;
    for (int i = 0; i < m; ++i) rpmax = std::max(rpmax, std::fabs(w.rp[i]));
    for (int j = 0; j < n; ++j) rdmax = std::max(rdmax, std::fabs(w.rd[j]));
    if (mu < 1e-11 * (1.0 + hmax * cnorm) && rpmax < 1e-9 * hmax && rdmax < 1e-9 * cnorm)
      break;

    for (int i = 0; i < m; ++i) {
      double ss = w.s[i] > 1e-300 ? w.s[i] : 1e-300;
      w.d[i] = std::min(w.z[i] / ss, 1e16);
    }
    // M = F' D F + reg
    std::vector<double>& M0 = w.M;
    std::fill(M0.begin(), M0.end(), 0.0);
    for (int i = 0; i < m; ++i) {
      const double di = w.d[i];
      const double* Fi = F + i * n;
      for (int a = 0; a < n; ++a) {
        const double fa = di * Fi[a];
        for (int b = a; b < n; ++b) M0[a * n + b] += fa * Fi[b];
      }
    }
    for (int a = 0; a < n; ++a)
      for (int b = 0; b < a; ++b) M0[a * n + b] = M0[b * n + a];
    double tr = 0.0;
    for (int a = 0; a < n; ++a) tr += M0[a * n + a];
    const double reg = 1e-12 * (1.0 + tr / n);
    for (int a = 0; a < n; ++a) M0[a * n + a] += reg;

    auto kkt = [&](const std::vector<double>& rc, std::vector<double>& dx,
                   std::vector<double>& ds, std::vector<double>& dz) -> bool {
      std::vector<double> Mf = w.M;  // copy; factored in-place
      for (int j = 0; j < n; ++j) w.rhs[j] = -w.rd[j];
      for (int i = 0; i < m; ++i) {
        const double ss = w.s[i] > 1e-300 ? w.s[i] : 1e-300;
        const double t = w.d[i] * w.rp[i] - rc[i] / ss;
        for (int j = 0; j < n; ++j) w.rhs[j] -= F[i * n + j] * t;
      }
      dx = w.rhs;
      if (!chol_solve(n, Mf.data(), dx.data())) return false;
      for (int i = 0; i < m; ++i) {
        double fdx = 0.0;
        for (int j = 0; j < n; ++j) fdx += F[i * n + j] * dx[j];
        const double ss = w.s[i] > 1e-300 ? w.s[i] : 1e-300;
        dz[i] = w.d[i] * (w.rp[i] + fdx) - rc[i] / ss;
        ds[i] = -w.rp[i] - fdx;
      }
      return true;
    };

    // predictor
    std::vector<double> rc(m);
    for (int i = 0; i < m; ++i) rc[i] = w.s[i] * w.z[i];
    if (!kkt(rc, w.dx, w.ds, w.dz)) return 1;
    auto steplen = [&](const std::vector<double>& v, const std::vector<double>& dv,
                       double tau) {
      double a = 1.0;
      for (int i = 0; i < m; ++i)
        if (dv[i] < 0.0) a = std::min(a, -tau * v[i] / dv[i]);
      return a;
    };
    const double ap_a = steplen(w.s, w.ds, 1.0);
    const double ad_a = steplen(w.z, w.dz, 1.0);
    double mu_aff = 0.0;
    for (int i = 0; i < m; ++i)
      mu_aff += (w.s[i] + ap_a * w.ds[i]) * (w.z[i] + ad_a * w.dz[i]);
    mu_aff /= m;
    const double sigma = std::pow(mu_aff / std::max(mu, 1e-300), 3.0);
    // corrector
    for (int i = 0; i < m; ++i)
      rc[i] = w.s[i] * w.z[i] + w.ds[i] * w.dz[i] - sigma * mu;
    if (!kkt(rc, w.dx, w.ds, w.dz)) return 1;
    const double ap = steplen(w.s, w.ds, 0.995);
    const double ad = steplen(w.z, w.dz, 0.995);
    for (int j = 0; j < n; ++j) w.x[j] += ap * w.dx[j];
    for (int i = 0; i < m; ++i) {
      w.s[i] += ap * w.ds[i];
      w.z[i] += ad * w.dz[i];
    }
    double xn = 0.0;
    for (int j = 0; j < n; ++j) xn = std::max(xn, std::fabs(w.x[j]));
    if (xn > 1e12 * (1.0 + hmax)) return 2;  // runaway: unbounded direction
  }
  double v = 0.0;
  for (int j = 0; j < n; ++j) v += c[j] * w.x[j];
  *val = v;
  std::memcpy(x_out, w.x.data(), n * sizeof(double));
  return 0;
}

// Solve the n x n system A v = b by Gaussian elimination with partial
// pivoting. Returns false if the pivot ratio signals singularity.
bool dense_solve(int n, std::vector<double>& A, std::vector<double>& b,
                 double rcond_tol) {
  double amax = 0.0;
  for (int i = 0; i < n * n; ++i) amax = std::max(amax, std::fabs(A[i]));
  if (amax == 0.0) return false;
  for (int k = 0; k < n; ++k) {
    int piv = k;
    double pv = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      const double v = std::fabs(A[i * n + k]);
      if (v > pv) { pv = v; piv = i; }
    }
    if (pv < rcond_tol * amax) return false;
    if (piv != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[piv * n + j]);
      std::swap(b[k], b[piv]);
    }
    const double d = A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double f = A[i * n + k] / d;
      if (f == 0.0) continue;
      for (int j = k; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int j = i + 1; j < n; ++j) v -= A[i * n + j] * b[j];
    b[i] = v / A[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" {

// Single LP: max c'x s.t. Fx<=h. F row-major (m x n).
int polylp_support(int n, int m, const double* c, const double* F,
                   const double* h, double* x_out, double* val) {
  return lp_support(n, m, c, F, h, x_out, val, 60);
}

// Batched support functions: K directions (K x n); vals (K,). Returns number
// of failed LPs.
int polylp_support_batch(int n, int m, int K, const double* C, const double* F,
                         const double* h, double* vals) {
  int failures = 0;
  std::vector<double> x(n);
  for (int k = 0; k < K; ++k) {
    double v;
    const int st = lp_support(n, m, C + k * n, F, h, x.data(), &v, 60);
    if (st != 0) { ++failures; v = NAN; }
    vals[k] = v;
  }
  return failures;
}

// Min H-rep: marks keep[i]=1 for irredundant rows of {Fx<=h}. Rows must be
// pre-normalized by the caller if desired. Returns number of kept rows, or -1
// on failure.
int polylp_min_hrep(int n, int m, const double* F, const double* h,
                    unsigned char* keep, double tol) {
  std::vector<unsigned char> k(m, 1);
  std::vector<double> Fsub;
  std::vector<double> hsub;
  std::vector<double> x(n);
  for (int i = 0; i < m; ++i) {
    // build subproblem without row i (and without already-dropped rows)
    Fsub.clear();
    hsub.clear();
    for (int r = 0; r < m; ++r) {
      if (r == i || !k[r]) continue;
      Fsub.insert(Fsub.end(), F + r * n, F + (r + 1) * n);
      hsub.push_back(h[r]);
    }
    if (hsub.empty()) continue;
    double v;
    const int st = lp_support(n, (int)hsub.size(), F + i * n, Fsub.data(),
                              hsub.data(), x.data(), &v, 60);
    if (st == 1) return -1;
    if (st == 0 && v <= h[i] + tol) k[i] = 0;  // redundant
    // st == 2 (unbounded without row i) -> row i is essential, keep
  }
  int kept = 0;
  for (int i = 0; i < m; ++i) {
    keep[i] = k[i];
    kept += k[i];
  }
  return kept;
}

// Vertex enumeration of {x : F x <= h} by basic-solution enumeration: every
// vertex of a (bounded, full-dimensional) polytope is the unique solution of
// n active constraint rows, so walk all n-subsets, solve, and keep feasible
// solutions. Replaces scipy.spatial.HalfspaceIntersection (itself qhull) for
// the offline set layer (ref: MPT's extreme() used by reach_set.m:5-11 /
// calc_mRPIS.m:61-64 V-rep steps). Intended for the small synthesis polytopes
// (m up to ~60, n <= 6); the caller falls back to qhull when the subset count
// exceeds the budget.
//
// Duplicates from degenerate vertices are merged with absolute tolerance
// dedup_tol. Returns the vertex count, -1 if the combination budget
// (20e6) is exceeded, -2 if more than max_out distinct vertices were found.
int polylp_vertices(int n, int m, const double* F, const double* h,
                    double feas_tol, double dedup_tol, int max_out,
                    double* V_out) {
  if (n < 1 || m < n) return 0;
  // combination-count guard: C(m, n) with early exit
  double combos = 1.0;
  for (int i = 0; i < n; ++i) combos = combos * (m - i) / (i + 1);
  if (combos > 20e6) return -1;

  double hmax = 1.0;
  for (int i = 0; i < m; ++i) hmax = std::max(hmax, std::fabs(h[i]));

  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  std::vector<double> A(n * n), b(n);
  int count = 0;
  const double dd2 = dedup_tol * dedup_tol;

  while (true) {
    for (int r = 0; r < n; ++r) {
      std::memcpy(A.data() + r * n, F + idx[r] * n, n * sizeof(double));
      b[r] = h[idx[r]];
    }
    if (dense_solve(n, A, b, 1e-10)) {
      // feasibility: F v <= h + tol (scaled)
      bool feas = true;
      for (int i = 0; i < m && feas; ++i) {
        double fv = 0.0;
        for (int j = 0; j < n; ++j) fv += F[i * n + j] * b[j];
        if (fv > h[i] + feas_tol * (1.0 + hmax)) feas = false;
      }
      if (feas) {
        bool dup = false;
        for (int v = 0; v < count && !dup; ++v) {
          double d2 = 0.0;
          for (int j = 0; j < n; ++j) {
            const double dj = V_out[v * n + j] - b[j];
            d2 += dj * dj;
          }
          dup = d2 < dd2;
        }
        if (!dup) {
          if (count >= max_out) return -2;
          std::memcpy(V_out + count * n, b.data(), n * sizeof(double));
          ++count;
        }
      }
    }
    // next combination (lexicographic)
    int k = n - 1;
    while (k >= 0 && idx[k] == m - n + k) --k;
    if (k < 0) break;
    ++idx[k];
    for (int j = k + 1; j < n; ++j) idx[j] = idx[j - 1] + 1;
  }
  return count;
}

}  // extern "C"
