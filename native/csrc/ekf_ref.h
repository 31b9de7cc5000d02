// From-spec EKF SLAM update oracles (deterministic noise-free mode) for
// parity cross-checks against tpunav/estimation/ekf/filter.py.
//
// Reference SEMANTICS: nuslam/src/nuslam/ekf_filter.cpp —
// knownCorrespondenceSLAM (:298-411) and SLAM with Mahalanobis gating
// (:112-294) — re-derived from the spec as flat-array C (no Eigen, no
// code shared with the reference), with the framework's documented
// deviations applied identically: Joseph-form covariance update and
// clamp-to-zero / +inf handling of degenerate Mahalanobis distances.
#pragma once

extern "C" {

// One known-correspondence SLAM step. state (3+2n), cov (S*S row-major),
// active (n) are updated in place. meas is (m,2) robot-frame (x,y); NaN
// rows are skipped; measurement index == landmark id. u = [w, vx].
void tpunav_ekf_known_update(int n, const double* meas_noise,
                             const double* motion_noise, double* state,
                             double* cov, unsigned char* active,
                             const double* meas, int m, const double* u);

// One unknown-correspondence (Mahalanobis-gated) SLAM step. count is the
// tracked-landmark counter (in/out). dmin/dmax are the gates.
void tpunav_ekf_unknown_update(int n, const double* meas_noise,
                               const double* motion_noise, double* state,
                               double* cov, unsigned char* active,
                               int* count, double dmin, double dmax,
                               const double* meas, int m,
                               const double* u);

}  // extern "C"
