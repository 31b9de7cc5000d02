"""Native (C++) host library: build-on-demand loader + ctypes bindings.

The reference stack is 100% C++17; this package carries the framework's
host-native pieces (SURVEY.md §2 intro): a from-spec SE(2)/diff-drive math
core and a self-contained MPPI reference solver used to cross-check the
JAX kernels deterministically (same caller-supplied noise → same
trajectories/controls; SURVEY.md §7.8). Sources live in ``native/csrc`` at
the repo root and are compiled once with g++ into a cached shared library.
"""

from .lib import (  # noqa: F401
    MPPIRefParams,
    dd_feedforward,
    dd_twist_to_wheels,
    dd_update_odometry,
    dd_wheels_to_twist,
    ekf_known_update,
    ekf_unknown_update,
    load_library,
    mppi_solve_ref,
    normalize_angle_pi,
    se2_apply,
    se2_compose,
    se2_integrate_twist,
    se2_inverse,
)
