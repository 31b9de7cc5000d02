// From-spec EKF SLAM oracles — see ekf_ref.h. Deterministic mode only
// (zero sampled noise), matching tpunav's key=None / spd_repair=False
// configuration: symmetrize-only covariance maintenance and the
// Joseph-form measurement update.
#include "ekf_ref.h"

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kWEps = 1e-12;   // almost_equal epsilon (rigid2d.hpp)

double norm_pi(double a) {
  return std::atan2(std::sin(a), std::cos(a));
}

void symmetrize(double* c, int s) {
  for (int i = 0; i < s; ++i)
    for (int j = i + 1; j < s; ++j) {
      double v = 0.5 * (c[i * s + j] + c[j * s + i]);
      c[i * s + j] = v;
      c[j * s + i] = v;
    }
}

// Unicycle propagation, theta updated FIRST (the reference's ordering,
// ekf_filter.cpp:500-533), zero noise.
void motion_update(double* state, const double* u) {
  double om = u[0], vx = u[1];
  double theta = state[0];
  bool small = std::fabs(om) < kWEps;
  double tn = norm_pi(theta + (small ? 0.0 : om));
  double dx, dy;
  if (small) {
    dx = vx * std::cos(tn);
    dy = vx * std::sin(tn);
  } else {
    dx = (-vx / om) * std::sin(tn) + (vx / om) * std::sin(tn + om);
    dy = (vx / om) * std::cos(tn) - (vx / om) * std::cos(tn + om);
  }
  state[0] = tn;
  state[1] += dx;
  state[2] += dy;
}

// sigma = G cov G^T + Q with the sparse motion Jacobian evaluated at the
// PRIOR heading (ekf_filter.cpp:536-565). G = I except G[1][0], G[2][0].
void uncertainty_update(const double* motion_noise, double prior_theta,
                        const double* u, double* cov, int s) {
  double om = u[0], vx = u[1];
  bool small = std::fabs(om) < kWEps;
  double g10, g20;
  if (small) {
    g10 = -vx * std::sin(prior_theta);
    g20 = vx * std::cos(prior_theta);
  } else {
    g10 = (-vx / om) * std::cos(prior_theta) +
          (vx / om) * std::cos(prior_theta + om);
    g20 = (-vx / om) * std::sin(prior_theta) +
          (vx / om) * std::sin(prior_theta + om);
  }
  // G differs from I only in rows 1,2 (extra g·row0 term), so
  // G C G^T = C + outer updates — computed densely for clarity.
  std::vector<double> gc(s * s);
  for (int i = 0; i < s; ++i)
    for (int j = 0; j < s; ++j) {
      double v = cov[i * s + j];
      if (i == 1) v += g10 * cov[0 * s + j];
      if (i == 2) v += g20 * cov[0 * s + j];
      gc[i * s + j] = v;
    }
  for (int i = 0; i < s; ++i)
    for (int j = 0; j < s; ++j) {
      double v = gc[i * s + j];
      if (j == 1) v += g10 * gc[i * s + 0];
      if (j == 2) v += g20 * gc[i * s + 0];
      cov[i * s + j] = v;
    }
  cov[0] += motion_noise[0];
  cov[1 * s + 1] += motion_noise[1];
  cov[2 * s + 2] += motion_noise[2];
}

// Dense 2xS measurement Jacobian rows for landmark slot j
// (ekf_filter.cpp:569-597).
void jacobian_rows(const double* state, int j, int s, double* h0,
                   double* h1) {
  int jx = 2 * j + 3, jy = jx + 1;
  double dx = state[jx] - state[1], dy = state[jy] - state[2];
  double q = dx * dx + dy * dy, sq = std::sqrt(q);
  std::memset(h0, 0, s * sizeof(double));
  std::memset(h1, 0, s * sizeof(double));
  h0[1] = -dx / sq; h0[2] = -dy / sq; h0[jx] = dx / sq; h0[jy] = dy / sq;
  h1[0] = -1.0; h1[1] = dy / q; h1[2] = -dx / q;
  h1[jx] = -dy / q; h1[jy] = dx / q;
}

void predicted(const double* state, int j, double* r_hat, double* b_hat) {
  int jx = 2 * j + 3, jy = jx + 1;
  double dx = state[jx] - state[1], dy = state[jy] - state[2];
  *r_hat = std::sqrt(dx * dx + dy * dy);
  *b_hat = norm_pi(std::atan2(dy, dx) - norm_pi(state[0]));
}

// Joseph-form update at slot j (ekf_filter.cpp:363-398 gain/innovation,
// covariance via (I-KH)S(I-KH)^T + KRK^T — the framework's documented
// f32-safe deviation, exercised here in f64).
void kalman_update(const double* meas_noise, double* state, double* cov,
                   int j, double r, double b, int s) {
  std::vector<double> h0(s), h1(s);
  jacobian_rows(state, j, s, h0.data(), h1.data());

  // psi = H C H^T + R (2x2); ch = C H^T (s x 2).
  std::vector<double> ch(s * 2, 0.0);
  for (int i = 0; i < s; ++i) {
    double a = 0.0, bb = 0.0;
    for (int k = 0; k < s; ++k) {
      a += cov[i * s + k] * h0[k];
      bb += cov[i * s + k] * h1[k];
    }
    ch[i * 2 + 0] = a;
    ch[i * 2 + 1] = bb;
  }
  double psi00 = meas_noise[0], psi01 = 0.0, psi10 = 0.0,
         psi11 = meas_noise[1];
  for (int k = 0; k < s; ++k) {
    psi00 += h0[k] * ch[k * 2 + 0];
    psi01 += h0[k] * ch[k * 2 + 1];
    psi10 += h1[k] * ch[k * 2 + 0];
    psi11 += h1[k] * ch[k * 2 + 1];
  }
  double det = psi00 * psi11 - psi01 * psi10;
  double i00 = psi11 / det, i01 = -psi01 / det, i10 = -psi10 / det,
         i11 = psi00 / det;

  std::vector<double> K(s * 2);
  for (int i = 0; i < s; ++i) {
    K[i * 2 + 0] = ch[i * 2 + 0] * i00 + ch[i * 2 + 1] * i10;
    K[i * 2 + 1] = ch[i * 2 + 0] * i01 + ch[i * 2 + 1] * i11;
  }

  double r_hat, b_hat;
  predicted(state, j, &r_hat, &b_hat);
  double dz0 = r - r_hat;
  double dz1 = norm_pi(norm_pi(b) - norm_pi(b_hat));
  for (int i = 0; i < s; ++i)
    state[i] += K[i * 2 + 0] * dz0 + K[i * 2 + 1] * dz1;

  // A = I - K H; cov = A cov A^T + K R K^T.
  std::vector<double> A(s * s, 0.0), tmp(s * s, 0.0);
  for (int i = 0; i < s; ++i) {
    for (int k = 0; k < s; ++k)
      A[i * s + k] = -(K[i * 2 + 0] * h0[k] + K[i * 2 + 1] * h1[k]);
    A[i * s + i] += 1.0;
  }
  for (int i = 0; i < s; ++i)
    for (int k = 0; k < s; ++k) {
      double acc = 0.0;
      for (int l = 0; l < s; ++l) acc += A[i * s + l] * cov[l * s + k];
      tmp[i * s + k] = acc;
    }
  for (int i = 0; i < s; ++i)
    for (int k = 0; k < s; ++k) {
      double acc = 0.0;
      for (int l = 0; l < s; ++l) acc += tmp[i * s + l] * A[k * s + l];
      cov[i * s + k] = acc + K[i * 2 + 0] * meas_noise[0] * K[k * 2 + 0] +
                       K[i * 2 + 1] * meas_noise[1] * K[k * 2 + 1];
    }
}

void init_landmark(double* state, int j, double r, double b) {
  int jx = 2 * j + 3, jy = jx + 1;
  state[jx] = state[1] + r * std::cos(b + state[0]);
  state[jy] = state[2] + r * std::sin(b + state[0]);
}

bool valid_row(const double* m) {
  return std::isfinite(m[0]) && std::isfinite(m[1]);
}

}  // namespace

extern "C" void tpunav_ekf_known_update(
    int n, const double* meas_noise, const double* motion_noise,
    double* state, double* cov, unsigned char* active, const double* meas,
    int m, const double* u) {
  int s = 3 + 2 * n;
  symmetrize(cov, s);
  double prior_theta = state[0];
  motion_update(state, u);
  uncertainty_update(motion_noise, prior_theta, u, cov, s);

  for (int i = 0; i < m; ++i) {
    if (!valid_row(meas + 2 * i)) continue;
    symmetrize(cov, s);
    double x = meas[2 * i], y = meas[2 * i + 1];
    double r = std::hypot(x, y), b = std::atan2(y, x);
    if (!active[i]) {
      init_landmark(state, i, r, b);
      active[i] = 1;
    }
    kalman_update(meas_noise, state, cov, i, r, b, s);
  }
}

extern "C" void tpunav_ekf_unknown_update(
    int n, const double* meas_noise, const double* motion_noise,
    double* state, double* cov, unsigned char* active, int* count,
    double dmin, double dmax, const double* meas, int m, const double* u) {
  int s = 3 + 2 * n;
  const double inf = std::numeric_limits<double>::infinity();
  symmetrize(cov, s);
  double prior_theta = state[0];
  motion_update(state, u);
  uncertainty_update(motion_noise, prior_theta, u, cov, s);

  std::vector<double> h0(s), h1(s);
  for (int i = 0; i < m; ++i) {
    if (!valid_row(meas + 2 * i)) continue;
    symmetrize(cov, s);
    double x = meas[2 * i], y = meas[2 * i + 1];
    double r = std::hypot(x, y), b = std::atan2(y, x);

    // Mahalanobis distance to every ACTIVE slot (ekf_filter.cpp:163-208
    // with tpunav's degenerate-distance handling: clamp tiny negatives
    // to 0, map indefinite/non-finite to +inf).
    std::vector<double> d(n, inf);
    for (int k = 0; k < n; ++k) {
      if (!active[k]) continue;
      jacobian_rows(state, k, s, h0.data(), h1.data());
      double psi00 = meas_noise[0], psi01 = 0.0, psi11 = meas_noise[1];
      for (int a = 0; a < s; ++a) {
        double c0 = 0.0, c1 = 0.0;
        for (int l = 0; l < s; ++l) {
          c0 += cov[a * s + l] * h0[l];
          c1 += cov[a * s + l] * h1[l];
        }
        psi00 += h0[a] * c0;
        psi01 += h0[a] * c1;
        psi11 += h1[a] * c1;
      }
      double det = psi00 * psi11 - psi01 * psi01;
      double r_hat, b_hat;
      predicted(state, k, &r_hat, &b_hat);
      double dz0 = r - r_hat;
      double dz1 = norm_pi(norm_pi(b) - norm_pi(b_hat));
      double d2 = (psi11 * dz0 * dz0 - 2.0 * psi01 * dz0 * dz1 +
                   psi00 * dz1 * dz1) / det;
      bool bad = !std::isfinite(d2) || d2 < -1e-6;
      d[k] = bad ? inf : (d2 > 0.0 ? d2 : 0.0);
    }
    double dstar = inf;
    int jstar = 0;
    for (int k = 0; k < n; ++k)
      if (d[k] < dstar) {
        dstar = d[k];
        jstar = k;
      }
    if (*count == 0) dstar = 1e12;

    bool do_update = dstar <= dmin;
    bool do_add = (dstar >= dmax) && (*count < n);
    int j = do_add ? *count : jstar;
    if (do_add) {
      init_landmark(state, j, r, b);
      active[j] = 1;
      (*count)++;
    }
    if ((do_update || do_add) && active[j])
      kalman_update(meas_noise, state, cov, j, r, b, s);
  }
}
