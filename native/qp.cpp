// Bound-constrained strictly-convex QP solver (primal-dual active set).
//
// Native golden reference / host fallback for clsurvey_tpu/ops/qp.py —
// the role the `quadprog` C extension plays for the reference framework
// (GEM's gradient projection, ref:src/methods/rehearsal/model/gem.py:58-80).
//
//   min 1/2 v^T P v - q^T v   s.t.  v >= lb        (P SPD, t <= ~64)
//
// Same algorithm as the JAX implementation: iterate
//   A_{k+1} = { i : (lb_i - v_i) + mu_i > 0 },  v_A = lb,  P_FF v_F = ...
// with dense Gaussian elimination (partial pivoting) for the reduced solve.
//
// Exposed as extern "C" for ctypes. Build: `make -C native`.

#include <cstring>
#include <vector>
#include <cmath>

namespace {

// Solve M x = b in-place via Gaussian elimination with partial pivoting.
// Returns false on (numerical) singularity.
bool dense_solve(std::vector<double> M, std::vector<double> b, int n,
                 double* x) {
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(M[col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double a = std::fabs(M[r * n + col]);
      if (a > best) { best = a; piv = r; }
    }
    if (best < 1e-300) return false;
    if (piv != col) {
      for (int c = 0; c < n; ++c) std::swap(M[piv * n + c], M[col * n + c]);
      std::swap(b[piv], b[col]);
    }
    double inv = 1.0 / M[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      double f = M[r * n + col] * inv;
      if (f == 0.0) continue;
      for (int c = col; c < n; ++c) M[r * n + c] -= f * M[col * n + c];
      b[r] -= f * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (int c = r + 1; c < n; ++c) s -= M[r * n + c] * x[c];
    x[r] = s / M[r * n + r];
  }
  return true;
}

}  // namespace

extern "C" {

// P: t*t row-major, q: t, lb: t, v_out: t. Returns iterations used, or -1
// on failure.
int solve_bound_qp(const double* P, const double* q, const double* lb,
                   int t, int max_iters, double* v_out) {
  if (max_iters <= 0) max_iters = t + 8;
  std::vector<char> active(t, 0), prev_active(t, 0);
  std::vector<double> v(t, 0.0), mu(t, 0.0);

  int it = 0;
  for (; it < max_iters; ++it) {
    // build masked system: free rows from P, active rows = identity
    std::vector<double> M(t * t, 0.0), rhs(t, 0.0);
    for (int i = 0; i < t; ++i) {
      if (active[i]) {
        M[i * t + i] = 1.0;
        rhs[i] = lb[i];
      } else {
        double r = q[i];
        for (int j = 0; j < t; ++j) {
          if (active[j]) r -= P[i * t + j] * lb[j];
          else M[i * t + j] = P[i * t + j];
        }
        rhs[i] = r;
      }
    }
    if (!dense_solve(M, rhs, t, v.data())) return -1;

    // mu = P v - q
    for (int i = 0; i < t; ++i) {
      double s = -q[i];
      for (int j = 0; j < t; ++j) s += P[i * t + j] * v[j];
      mu[i] = s;
    }
    prev_active = active;
    bool changed = false;
    for (int i = 0; i < t; ++i) {
      char a = ((lb[i] - v[i]) + mu[i] > 0.0) ? 1 : 0;
      if (a != active[i]) changed = true;
      active[i] = a;
    }
    if (!changed) break;
  }
  for (int i = 0; i < t; ++i)
    v_out[i] = v[i] > lb[i] ? v[i] : lb[i];
  return it + 1;
}

// GEM projection end-to-end on host:
//   P = 0.5(MM^T + (MM^T)^T) + eps I; q = M g; v >= margin; x = M^T v + g
// mem: t*p row-major, grad: p. x_out: p.
int gem_project(const double* mem, const double* grad, int t, int p,
                double margin, double eps, double* x_out) {
  std::vector<double> P(t * t), q(t), lb(t, margin), v(t);
  for (int i = 0; i < t; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = 0.0;
      for (int k = 0; k < p; ++k) s += mem[i * p + k] * mem[j * p + k];
      P[i * t + j] = s;
      P[j * t + i] = s;
    }
    P[i * t + i] += eps;
    // q = -(M g): quadprog's `a` vector in the reference call
    double s = 0.0;
    for (int k = 0; k < p; ++k) s += mem[i * p + k] * grad[k];
    q[i] = -s;
  }
  int rc = solve_bound_qp(P.data(), q.data(), lb.data(), t, 0, v.data());
  if (rc < 0) return rc;
  for (int k = 0; k < p; ++k) {
    double s = grad[k];
    for (int i = 0; i < t; ++i) s += mem[i * p + k] * v[i];
    x_out[k] = s;
  }
  return rc;
}

}  // extern "C"
