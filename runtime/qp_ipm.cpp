// Dense primal-dual interior-point QP solver — native host runtime.
//
// The reference's only native-code capability is the Gurobi C solver invoked
// through cvxpy (SCP_controller.py:135-145). This is the framework's in-tree
// native equivalent: a Mehrotra predictor-corrector method for
//
//     min 0.5 x^T P x + q^T x   s.t.  G x <= h,  lb <= x <= ub
//
// mirroring the algorithm of scp_tpu/solvers/qp.py (row equilibration,
// z = 1/s scale-free start, condensed normal equations with dense Cholesky).
// Used from Python via ctypes (scp_tpu/runtime/native.py) as a host-side
// oracle / single-instance fallback where a TPU round-trip is not worth it.
//
// Build: make -C runtime   (produces libscpqp.so)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Cholesky factorization in place (lower). Returns 0 on success.
int cholesky(double* a, int n) {
  for (int j = 0; j < n; ++j) {
    double d = a[j * n + j];
    for (int k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
    if (d <= 0.0) return -1;
    d = std::sqrt(d);
    a[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = a[i * n + j];
      for (int k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = s / d;
    }
  }
  return 0;
}

void chol_solve(const double* L, double* b, int n) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

}  // namespace

extern "C" {

// Returns: iterations used (>= 0) on success, -1 if not converged,
//          -2 on numerical failure.
// info_out (optional, length >= 3): {obj, gap, primal_residual}.
int scp_qp_solve(int n, int m_in, const double* P, const double* q,
                 const double* G, const double* h, const double* lb,
                 const double* ub, int max_iter, double tol, double* x_out,
                 double* info_out) {
  const int m = m_in + 2 * n;  // fold box bounds into [G; I; -I]
  std::vector<double> Gh(static_cast<size_t>(m) * n, 0.0), hh(m);
  for (int i = 0; i < m_in; ++i) {
    std::memcpy(&Gh[static_cast<size_t>(i) * n], &G[static_cast<size_t>(i) * n],
                sizeof(double) * n);
    hh[i] = h[i];
  }
  for (int i = 0; i < n; ++i) {
    Gh[static_cast<size_t>(m_in + i) * n + i] = 1.0;
    hh[m_in + i] = ub[i];
    Gh[static_cast<size_t>(m_in + n + i) * n + i] = -1.0;
    hh[m_in + n + i] = -lb[i];
  }

  // Row equilibration.
  std::vector<double> drow(m);
  for (int i = 0; i < m; ++i) {
    double nrm = 0.0;
    for (int j = 0; j < n; ++j) nrm += Gh[static_cast<size_t>(i) * n + j] *
                                       Gh[static_cast<size_t>(i) * n + j];
    nrm = std::sqrt(nrm);
    drow[i] = 1.0 / std::max(nrm, 1e-10);
    for (int j = 0; j < n; ++j) Gh[static_cast<size_t>(i) * n + j] *= drow[i];
    hh[i] *= drow[i];
  }
  double pmax = 1.0;
  for (int i = 0; i < n * n; ++i) pmax = std::max(pmax, std::fabs(P[i]));
  const double cs = 1.0 / pmax;
  std::vector<double> Ps(static_cast<size_t>(n) * n), qs(n);
  for (int i = 0; i < n * n; ++i) Ps[i] = P[i] * cs;
  for (int i = 0; i < n; ++i) qs[i] = q[i] * cs;

  std::vector<double> x(n, 0.0), s(m), z(m);
  for (int i = 0; i < m; ++i) {
    double gx = 0.0;
    for (int j = 0; j < n; ++j) gx += Gh[static_cast<size_t>(i) * n + j] * x[j];
    s[i] = std::max(hh[i] - gx, 1.0);
    z[i] = 1.0 / s[i];
  }

  std::vector<double> K(static_cast<size_t>(n) * n), rd(n), rp(m), rhs(n),
      dx(n), dz(m), ds(m), dxa(n), dza(m), dsa(m), rc(m);
  int it = 0;
  bool converged = false;
  for (; it < max_iter; ++it) {
    // residuals
    for (int i = 0; i < n; ++i) {
      double v = qs[i];
      for (int j = 0; j < n; ++j) v += Ps[static_cast<size_t>(i) * n + j] * x[j];
      for (int k = 0; k < m; ++k) v += Gh[static_cast<size_t>(k) * n + i] * z[k];
      rd[i] = v;
    }
    double mu = 0.0;
    for (int i = 0; i < m; ++i) {
      double gx = 0.0;
      for (int j = 0; j < n; ++j) gx += Gh[static_cast<size_t>(i) * n + j] * x[j];
      rp[i] = gx + s[i] - hh[i];
      mu += s[i] * z[i];
    }
    mu /= m;

    // K = Ps + G^T diag(z/s) G + reg I
    double kdmax = 0.0;
    std::fill(K.begin(), K.end(), 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j <= i; ++j) {
        double v = Ps[static_cast<size_t>(i) * n + j];
        for (int k = 0; k < m; ++k)
          v += Gh[static_cast<size_t>(k) * n + i] * (z[k] / s[k]) *
               Gh[static_cast<size_t>(k) * n + j];
        K[static_cast<size_t>(i) * n + j] = v;
        if (i == j) kdmax = std::max(kdmax, v);
      }
    const double reg = 1e-12 * kdmax + 1e-30;
    for (int i = 0; i < n; ++i) K[static_cast<size_t>(i) * n + i] += reg;
    if (cholesky(K.data(), n) != 0) return -2;

    auto kkt = [&](const double* rcv, double* dxo, double* dso, double* dzo) {
      for (int i = 0; i < n; ++i) {
        double v = rd[i];
        for (int k = 0; k < m; ++k)
          v += Gh[static_cast<size_t>(k) * n + i] *
               ((z[k] / s[k]) * rp[k] - rcv[k] / s[k]);
        rhs[i] = -v;
      }
      std::memcpy(dxo, rhs.data(), sizeof(double) * n);
      chol_solve(K.data(), dxo, n);
      for (int k = 0; k < m; ++k) {
        double gdx = 0.0;
        for (int j = 0; j < n; ++j)
          gdx += Gh[static_cast<size_t>(k) * n + j] * dxo[j];
        dzo[k] = (z[k] / s[k]) * (gdx + rp[k]) - rcv[k] / s[k];
        dso[k] = -(rcv[k] + s[k] * dzo[k]) / z[k];
      }
    };
    auto max_step = [&](const double* v, const double* dv) {
      double a = 1.0;
      for (int k = 0; k < m; ++k)
        if (dv[k] < 0.0) a = std::min(a, -0.99 * v[k] / dv[k]);
      return a;
    };

    // predictor
    for (int k = 0; k < m; ++k) rc[k] = s[k] * z[k];
    kkt(rc.data(), dxa.data(), dsa.data(), dza.data());
    double ap = max_step(s.data(), dsa.data());
    double ad = max_step(z.data(), dza.data());
    double mu_aff = 0.0;
    for (int k = 0; k < m; ++k)
      mu_aff += (s[k] + ap * dsa[k]) * (z[k] + ad * dza[k]);
    mu_aff /= m;
    double sigma = mu_aff / std::max(mu, 1e-300);
    sigma = sigma * sigma * sigma;

    // corrector
    for (int k = 0; k < m; ++k)
      rc[k] = s[k] * z[k] + dsa[k] * dza[k] - sigma * mu;
    kkt(rc.data(), dx.data(), ds.data(), dz.data());
    double a = std::min(max_step(s.data(), ds.data()),
                        max_step(z.data(), dz.data()));
    for (int i = 0; i < n; ++i) x[i] += a * dx[i];
    double mu_new = 0.0, rpn = 0.0, hn = 0.0;
    for (int k = 0; k < m; ++k) {
      s[k] += a * ds[k];
      z[k] += a * dz[k];
      mu_new += s[k] * z[k];
      rpn += rp[k] * rp[k];
      hn += hh[k] * hh[k];
    }
    mu_new /= m;
    if (mu_new < tol && std::sqrt(rpn) / (1.0 + std::sqrt(hn)) < tol * 10) {
      converged = true;
      ++it;
      break;
    }
  }

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  if (info_out) {
    double obj = 0.0;
    for (int i = 0; i < n; ++i) {
      double px = 0.0;
      for (int j = 0; j < n; ++j) px += P[static_cast<size_t>(i) * n + j] * x[j];
      obj += 0.5 * x[i] * px + q[i] * x[i];
    }
    double mu = 0.0, rpmax = 0.0;
    for (int k = 0; k < m; ++k) {
      mu += s[k] * z[k];
      double gx = 0.0;
      for (int j = 0; j < n; ++j) gx += Gh[static_cast<size_t>(k) * n + j] * x[j];
      rpmax = std::max(rpmax, gx - hh[k]);
    }
    info_out[0] = obj;
    info_out[1] = mu / m;
    info_out[2] = rpmax;
  }
  return converged ? it : -1;
}

}  // extern "C"
