/* Native SE(2) / diff-drive math core — C API.
 *
 * Host-native counterpart of tpunav.core.{se2,diff_drive} used for parity
 * cross-checks of the JAX kernels (SURVEY.md §7.8). Re-implements the
 * capabilities of the reference's rigid2d library
 * (ref: rigid2d/include/rigid2d/rigid2d.hpp:314-372,
 *  rigid2d/include/rigid2d/diff_drive.hpp:37-104) from its spec — flat
 * double arrays instead of classes, no Eigen.
 *
 * Conventions:
 *   pose  = [theta, x, y]
 *   twist = [wz, vx, vy]
 */
#ifndef TPUNAV_NATIVE_RIGID2D_H_
#define TPUNAV_NATIVE_RIGID2D_H_

#ifdef __cplusplus
extern "C" {
#endif

/* Wrap an angle to [-pi, pi). */
double tpunav_normalize_angle_pi(double rad);

/* Apply T (pose form) to a point p=[x,y] -> out[2]. */
void tpunav_se2_apply(const double pose[3], const double p[2], double out[2]);

/* Compose two transforms given in pose form: out = a * b. */
void tpunav_se2_compose(const double a[3], const double b[3], double out[3]);

/* Inverse transform in pose form. */
void tpunav_se2_inverse(const double pose[3], double out[3]);

/* Screw-axis (matrix-exponential) integration of a unit-time body twist
 * onto a pose: out = pose * exp(twist). Handles the wz≈0 pure-translation
 * branch. (Capability of Transform2D::integrateTwist,
 * ref: rigid2d/src/rigid2d/rigid2d.cpp:239-303.) */
void tpunav_se2_integrate_twist(const double pose[3], const double twist[3],
                                double out[3]);

/* Diff-drive inverse kinematics: body twist -> wheel velocities [ul, ur].
 * Returns 0 on success, -1 if the twist has vy != 0 (non-holonomic).
 * (Capability of DiffDrive::twistToWheels, ref: diff_drive.cpp:56-76.) */
int tpunav_dd_twist_to_wheels(double wheel_radius, double wheel_base,
                              const double twist[3], double wheels[2]);

/* Forward kinematics: wheel velocities -> body twist.
 * (Capability of DiffDrive::wheelsToTwist, ref: diff_drive.cpp:79-94.) */
void tpunav_dd_wheels_to_twist(double wheel_radius, double wheel_base,
                               const double wheels[2], double twist[3]);

/* Odometry update from absolute wheel angles. pose/enc are updated in
 * place; the body twist used is written to twist_out (may be NULL).
 * (Capability of DiffDrive::updateOdometry, ref: diff_drive.cpp:97-150.) */
void tpunav_dd_update_odometry(double wheel_radius, double wheel_base,
                               double pose[3], double enc[2],
                               double left, double right,
                               double twist_out[3]);

/* Propagate a commanded body twist for one time unit, advancing the pose
 * and the simulated encoders. (Capability of DiffDrive::feedforward,
 * ref: diff_drive.cpp:153-195.) */
void tpunav_dd_feedforward(double wheel_radius, double wheel_base,
                           double pose[3], double enc[2],
                           const double cmd[3]);

#ifdef __cplusplus
}
#endif

#endif /* TPUNAV_NATIVE_RIGID2D_H_ */
