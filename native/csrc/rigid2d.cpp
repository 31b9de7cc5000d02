/* Native SE(2) / diff-drive math core — see rigid2d.h. */

#include "rigid2d.h"

#include <cmath>

namespace {

constexpr double kSmallW = 1e-6;

/* sinc-like coefficients of the SE(2) exponential: A = sin(w)/w,
 * B = (1-cos(w))/w, with Taylor guards matching tpunav.core.se2. */
inline void exp_coeffs(double w, double* A, double* B) {
  if (std::fabs(w) < kSmallW) {
    *A = 1.0 - w * w / 6.0;
    *B = w / 2.0 - w * w * w / 24.0;
  } else {
    *A = std::sin(w) / w;
    *B = (1.0 - std::cos(w)) / w;
  }
}

}  // namespace

extern "C" {

double tpunav_normalize_angle_pi(double rad) {
  /* Wrap to [-pi, pi) with the same floor formula as
   * tpunav.core.angles.normalize_angle_pi so results match bit-for-bit. */
  const double two_pi = 2.0 * M_PI;
  const double shifted = rad + M_PI;
  double r = shifted - std::floor(shifted / two_pi) * two_pi;
  if (r < 0) r += two_pi;
  return r - M_PI;
}

void tpunav_se2_apply(const double pose[3], const double p[2],
                      double out[2]) {
  const double c = std::cos(pose[0]), s = std::sin(pose[0]);
  out[0] = pose[1] + c * p[0] - s * p[1];
  out[1] = pose[2] + s * p[0] + c * p[1];
}

void tpunav_se2_compose(const double a[3], const double b[3], double out[3]) {
  const double c = std::cos(a[0]), s = std::sin(a[0]);
  const double x = a[1] + c * b[1] - s * b[2];
  const double y = a[2] + s * b[1] + c * b[2];
  out[0] = a[0] + b[0];
  out[1] = x;
  out[2] = y;
}

void tpunav_se2_inverse(const double pose[3], double out[3]) {
  const double c = std::cos(pose[0]), s = std::sin(pose[0]);
  const double x = pose[1], y = pose[2];
  out[0] = -pose[0];
  out[1] = -(c * x + s * y);
  out[2] = -(-s * x + c * y);
}

void tpunav_se2_integrate_twist(const double pose[3], const double twist[3],
                                double out[3]) {
  const double w = twist[0], vx = twist[1], vy = twist[2];
  double A, B;
  exp_coeffs(w, &A, &B);
  const double d[3] = {std::atan2(std::sin(w), std::cos(w)),
                       A * vx - B * vy, B * vx + A * vy};
  tpunav_se2_compose(pose, d, out);
}

int tpunav_dd_twist_to_wheels(double wheel_radius, double wheel_base,
                              const double twist[3], double wheels[2]) {
  if (twist[2] != 0.0) return -1; /* non-holonomic: vy must be 0 */
  const double d = wheel_base / 2.0;
  wheels[0] = (-d * twist[0] + twist[1]) / wheel_radius;
  wheels[1] = (d * twist[0] + twist[1]) / wheel_radius;
  return 0;
}

void tpunav_dd_wheels_to_twist(double wheel_radius, double wheel_base,
                               const double wheels[2], double twist[3]) {
  twist[0] = wheel_radius / wheel_base * (wheels[1] - wheels[0]);
  twist[1] = wheel_radius * 0.5 * (wheels[0] + wheels[1]);
  twist[2] = 0.0;
}

void tpunav_dd_update_odometry(double wheel_radius, double wheel_base,
                               double pose[3], double enc[2],
                               double left, double right,
                               double twist_out[3]) {
  const double dul = tpunav_normalize_angle_pi(left - enc[0]);
  const double dur = tpunav_normalize_angle_pi(right - enc[1]);
  const double wheels[2] = {dul, dur};
  double vb[3];
  tpunav_dd_wheels_to_twist(wheel_radius, wheel_base, wheels, vb);
  double next[3];
  tpunav_se2_integrate_twist(pose, vb, next);
  pose[0] = tpunav_normalize_angle_pi(next[0]);
  pose[1] = next[1];
  pose[2] = next[2];
  enc[0] = tpunav_normalize_angle_pi(left);
  enc[1] = tpunav_normalize_angle_pi(right);
  if (twist_out) {
    twist_out[0] = vb[0];
    twist_out[1] = vb[1];
    twist_out[2] = vb[2];
  }
}

void tpunav_dd_feedforward(double wheel_radius, double wheel_base,
                           double pose[3], double enc[2],
                           const double cmd[3]) {
  double wheels[2];
  const double tw[3] = {cmd[0], cmd[1], 0.0};
  tpunav_dd_twist_to_wheels(wheel_radius, wheel_base, tw, wheels);
  double next[3];
  tpunav_se2_integrate_twist(pose, tw, next);
  pose[0] = tpunav_normalize_angle_pi(next[0]);
  pose[1] = next[1];
  pose[2] = next[2];
  enc[0] = tpunav_normalize_angle_pi(enc[0] + wheels[0]);
  enc[1] = tpunav_normalize_angle_pi(enc[1] + wheels[1]);
}

}  // extern "C"
