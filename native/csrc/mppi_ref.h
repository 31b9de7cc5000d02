/* Native MPPI reference solver — C API.
 *
 * Self-contained host implementation of the MPPI control update built from
 * the algorithm spec (SURVEY.md §2.2; capabilities of
 * controller/src/controller/mppi.cpp:72-140 + rk4.cpp:49-115). Takes the
 * Gaussian perturbations as an INPUT so the JAX solve
 * (tpunav.control.mppi.mppi_solve) can be cross-checked bit-for-bit
 * deterministically: same noise in, trajectories and control updates must
 * agree to float tolerance (SURVEY.md §7.8 parity harness).
 */
#ifndef TPUNAV_NATIVE_MPPI_REF_H_
#define TPUNAV_NATIVE_MPPI_REF_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  double wheel_radius;   /* cart model (ref: mppi.hpp:31-53) */
  double wheel_base;
  double lambda;         /* softmax temperature */
  double max_wheel_vel;  /* control clamp */
  double dt;             /* RK4 step */
  int steps;             /* N — horizon steps */
  int rollouts;          /* K */
  double q[3];           /* running-cost state weights (diag Q) */
  double r[2];           /* running-cost control weights (diag R) */
  double p1[3];          /* terminal-cost weights (diag P1) */
  double u_init[2];      /* refill value for the receding-horizon shift */
} tpunav_mppi_params;

/* One full MPPI solve.
 *   u        : in/out, (N, 2) row-major nominal controls. On return holds
 *              the SHIFTED sequence (executed step dropped, tail = u_init).
 *   noise    : (K, N, 2) row-major Gaussian perturbations (caller-supplied).
 *   pose     : (3,) current state [x, y, theta].
 *   waypoint : (3,) target  [x, y, theta].
 *   cmd      : out, (2,) wheel command to execute (pre-shift first row).
 *   traj     : optional out, (K, N, 3) row-major rollout states; NULL ok.
 */
void tpunav_mppi_solve(const tpunav_mppi_params* p, double* u,
                       const double* noise, const double pose[3],
                       const double waypoint[3], double cmd[2],
                       double* traj);

#ifdef __cplusplus
}
#endif

#endif /* TPUNAV_NATIVE_MPPI_REF_H_ */
