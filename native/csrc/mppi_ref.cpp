/* Native MPPI reference solver — see mppi_ref.h. */

#include "mppi_ref.h"

#include <algorithm>
#include <cmath>
#include <vector>

namespace {

/* Diff-drive kinematic cart ODE: xdot = f(x, u) with x=[x,y,theta],
 * u=[ul,ur] (capability of CartModel::kinematicCart, mppi.hpp:41-48). */
inline void cart_ode(double wr, double wb, const double x[3],
                     const double u[2], double xdot[3]) {
  const double fwd = 0.5 * wr * (u[0] + u[1]);
  xdot[0] = fwd * std::cos(x[2]);
  xdot[1] = fwd * std::sin(x[2]);
  xdot[2] = wr / wb * (u[1] - u[0]);
}

/* Classical RK4 step with zero-order-hold control (rk4.cpp:95-115). */
inline void rk4_step(double wr, double wb, double dt, const double x[3],
                     const double u[2], double out[3]) {
  double k1[3], k2[3], k3[3], k4[3], xt[3];
  cart_ode(wr, wb, x, u, k1);
  for (int i = 0; i < 3; ++i) xt[i] = x[i] + 0.5 * dt * k1[i];
  cart_ode(wr, wb, xt, u, k2);
  for (int i = 0; i < 3; ++i) xt[i] = x[i] + 0.5 * dt * k2[i];
  cart_ode(wr, wb, xt, u, k3);
  for (int i = 0; i < 3; ++i) xt[i] = x[i] + dt * k3[i];
  cart_ode(wr, wb, xt, u, k4);
  for (int i = 0; i < 3; ++i)
    out[i] = x[i] + dt / 6.0 * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]);
}

}  // namespace

extern "C" {

void tpunav_mppi_solve(const tpunav_mppi_params* p, double* u,
                       const double* noise, const double pose[3],
                       const double waypoint[3], double cmd[2],
                       double* traj) {
  const int N = p->steps, K = p->rollouts;
  /* loss[t*K + k]: running LQR cost per step, terminal cost OVERWRITES the
   * last row (spec: mppi.cpp:99-105 — replaces, not adds). */
  std::vector<double> loss(static_cast<size_t>(N) * K);

  for (int k = 0; k < K; ++k) {
    double x[3] = {pose[0], pose[1], pose[2]};
    const double* nk = noise + static_cast<size_t>(k) * N * 2;
    for (int t = 0; t < N; ++t) {
      const double up[2] = {u[t * 2 + 0] + nk[t * 2 + 0],
                            u[t * 2 + 1] + nk[t * 2 + 1]};
      double xn[3];
      rk4_step(p->wheel_radius, p->wheel_base, p->dt, x, up, xn);
      x[0] = xn[0];
      x[1] = xn[1];
      x[2] = xn[2];
      if (traj) {
        double* tk = traj + (static_cast<size_t>(k) * N + t) * 3;
        tk[0] = x[0];
        tk[1] = x[1];
        tk[2] = x[2];
      }
      const double e[3] = {x[0] - waypoint[0], x[1] - waypoint[1],
                           x[2] - waypoint[2]};
      if (t == N - 1) {
        loss[static_cast<size_t>(t) * K + k] =
            e[0] * e[0] * p->p1[0] + e[1] * e[1] * p->p1[1] +
            e[2] * e[2] * p->p1[2];
      } else {
        loss[static_cast<size_t>(t) * K + k] =
            e[0] * e[0] * p->q[0] + e[1] * e[1] * p->q[1] +
            e[2] * e[2] * p->q[2] + up[0] * up[0] * p->r[0] +
            up[1] * up[1] * p->r[1];
      }
    }
  }

  /* Reverse cumulative sum down rows → cost-to-go J (mppi.cpp:15-25). */
  for (int t = N - 2; t >= 0; --t)
    for (int k = 0; k < K; ++k)
      loss[static_cast<size_t>(t) * K + k] +=
          loss[static_cast<size_t>(t + 1) * K + k];

  /* Per-step softmax-weighted control update + clamp (mppi.cpp:112-126). */
  for (int t = 0; t < N; ++t) {
    const double* jt = &loss[static_cast<size_t>(t) * K];
    const double jmin = *std::min_element(jt, jt + K);
    double wsum = 0.0, du0 = 0.0, du1 = 0.0;
    for (int k = 0; k < K; ++k) {
      const double w = std::exp(-(jt[k] - jmin) / p->lambda) + 1e-8;
      const double* nk = noise + (static_cast<size_t>(k) * N + t) * 2;
      wsum += w;
      du0 += w * nk[0];
      du1 += w * nk[1];
    }
    u[t * 2 + 0] = std::clamp(u[t * 2 + 0] + du0 / wsum, -p->max_wheel_vel,
                              p->max_wheel_vel);
    u[t * 2 + 1] = std::clamp(u[t * 2 + 1] + du1 / wsum, -p->max_wheel_vel,
                              p->max_wheel_vel);
  }

  cmd[0] = u[0];
  cmd[1] = u[1];

  /* Receding-horizon shift: drop executed step, refill tail (mppi.cpp:
   * 128-137). */
  for (int t = 0; t < N - 1; ++t) {
    u[t * 2 + 0] = u[(t + 1) * 2 + 0];
    u[t * 2 + 1] = u[(t + 1) * 2 + 1];
  }
  u[(N - 1) * 2 + 0] = p->u_init[0];
  u[(N - 1) * 2 + 1] = p->u_init[1];
}

}  // extern "C"
