"""Native C++ ↔ JAX parity (SURVEY.md §7.8).

The native library re-implements the SE(2)/diff-drive math and the full
MPPI control update on the host; with identical inputs (incl. caller-
supplied noise) the JAX kernels must match it to float64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunav.control.mppi import (
    MPPIConfig,
    cost_to_go,
    init_controls,
    rollout_losses,
    update_controls,
    shift_controls,
)
from tpunav.core import diff_drive as dd
from tpunav.core import se2
from tpunav.core.angles import normalize_angle_pi
from tpunav.models.cart import CartParams
from tpunav import native

RNG = np.random.default_rng(7)


def test_normalize_angle():
    for a in [0.0, 3.0, -3.0, 4.0, -4.0, np.pi, -np.pi, 12.5, -12.5]:
        assert native.normalize_angle_pi(a) == pytest.approx(
            float(normalize_angle_pi(jnp.float64(a))), abs=1e-12)


def test_se2_ops_match():
    for _ in range(20):
        a = RNG.normal(size=3)
        b = RNG.normal(size=3)
        p = RNG.normal(size=2)
        v = RNG.normal(size=3)
        np.testing.assert_allclose(
            native.se2_compose(a, b), np.asarray(se2.compose(
                jnp.asarray(a), jnp.asarray(b))), atol=1e-12)
        np.testing.assert_allclose(
            native.se2_inverse(a), np.asarray(se2.inverse(jnp.asarray(a))),
            atol=1e-12)
        np.testing.assert_allclose(
            native.se2_apply(a, p),
            np.asarray(se2.apply(jnp.asarray(a), jnp.asarray(p))),
            atol=1e-12)
        np.testing.assert_allclose(
            native.se2_integrate_twist(a, v),
            np.asarray(se2.integrate_twist(jnp.asarray(a), jnp.asarray(v))),
            atol=1e-10)


def test_se2_integrate_twist_small_w():
    # The w≈0 Taylor branch must agree between C++ and JAX.
    pose = np.array([0.3, 1.0, -2.0])
    for w in [0.0, 1e-9, -1e-7, 1e-6]:
        v = np.array([w, 0.5, -0.25])
        np.testing.assert_allclose(
            native.se2_integrate_twist(pose, v),
            np.asarray(se2.integrate_twist(jnp.asarray(pose),
                                           jnp.asarray(v))), atol=1e-10)


def test_diff_drive_kinematics_match():
    wr, wb = 0.033, 0.160
    for _ in range(10):
        tw = np.array([RNG.normal(), RNG.normal(), 0.0])
        np.testing.assert_allclose(
            native.dd_twist_to_wheels(wr, wb, tw),
            np.asarray(dd.twist_to_wheels(dd.TURTLEBOT3, jnp.asarray(tw))),
            atol=1e-12)
        wh = RNG.normal(size=2)
        np.testing.assert_allclose(
            native.dd_wheels_to_twist(wr, wb, wh),
            np.asarray(dd.wheels_to_twist(dd.TURTLEBOT3, jnp.asarray(wh))),
            atol=1e-12)


def test_odometry_chain_match():
    """A whole encoder trajectory propagated by both implementations."""
    wr, wb = 0.033, 0.160
    state = dd.init_state(dtype=jnp.float64)
    pose = np.zeros(3)
    enc = np.zeros(2)
    angles = np.cumsum(RNG.normal(scale=0.3, size=(50, 2)), axis=0)
    for left, right in angles:
        state, _ = dd.update_odometry(dd.TURTLEBOT3, state, left, right)
        pose, enc, _ = native.dd_update_odometry(wr, wb, pose, enc,
                                                 left, right)
    np.testing.assert_allclose(pose, np.asarray(state.pose), atol=1e-9)
    np.testing.assert_allclose(enc, [state.left, state.right], atol=1e-9)


def test_feedforward_chain_match():
    wr, wb = 0.033, 0.160
    state = dd.init_state(dtype=jnp.float64)
    pose = np.zeros(3)
    enc = np.zeros(2)
    for _ in range(30):
        cmd = np.array([RNG.normal(scale=0.5), RNG.normal(scale=0.1), 0.0])
        state = dd.feedforward(dd.TURTLEBOT3, state, jnp.asarray(cmd))
        pose, enc = native.dd_feedforward(wr, wb, pose, enc, cmd)
    np.testing.assert_allclose(pose, np.asarray(state.pose), atol=1e-9)
    np.testing.assert_allclose(enc, [state.left, state.right], atol=1e-9)


def _jax_solve_with_noise(cfg, model, u, noise, pose, xd):
    """mppi_solve with externally supplied noise (bypasses sampling)."""
    loss, _ = rollout_losses(cfg, model, pose, u[None] + noise, xd)
    j = cost_to_go(loss)
    u_new = update_controls(cfg, u, noise, j)
    return u_new[0], shift_controls(cfg, u_new)


@pytest.mark.parametrize("k,n", [(5, 100), (64, 50)])
def test_mppi_solve_parity(k, n):
    """Full-solve parity: same noise → same command and shifted controls.

    K=5, N=100 is the reference's own operating point
    (controller/config/mppi_params.yaml)."""
    cfg = MPPIConfig(horizon=n * 0.01, dt=0.01, rollouts=k)
    model = CartParams(0.033, 0.160)
    ref = native.MPPIRefParams(
        wheel_radius=0.033, wheel_base=0.160, lambda_=cfg.lambda_,
        max_wheel_vel=cfg.max_wheel_vel, dt=cfg.dt, steps=n, rollouts=k,
        q_diag=cfg.q_diag, r_diag=cfg.r_diag, p1_diag=cfg.p1_diag,
        u_init=cfg.u_init)

    u = np.asarray(init_controls(cfg, dtype=jnp.float64))
    noise = RNG.normal(scale=0.9, size=(k, n, 2))
    pose = np.array([0.1, -0.2, 0.3])
    xd = np.array([1.0, 1.0, 0.0])

    cmd_c, u_c = native.mppi_solve_ref(ref, u, noise, pose, xd)
    cmd_j, u_j = _jax_solve_with_noise(
        cfg, model, jnp.asarray(u), jnp.asarray(noise), jnp.asarray(pose),
        jnp.asarray(xd))

    np.testing.assert_allclose(cmd_c, np.asarray(cmd_j), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(u_c, np.asarray(u_j), rtol=1e-9, atol=1e-9)


def test_mppi_trajectory_parity():
    """Rollout trajectories agree state-for-state."""
    k, n = 8, 25
    cfg = MPPIConfig(horizon=n * 0.01, dt=0.01, rollouts=k)
    model = CartParams(0.033, 0.160)
    ref = native.MPPIRefParams(
        wheel_radius=0.033, wheel_base=0.160, lambda_=cfg.lambda_,
        max_wheel_vel=cfg.max_wheel_vel, dt=cfg.dt, steps=n, rollouts=k,
        q_diag=cfg.q_diag, r_diag=cfg.r_diag, p1_diag=cfg.p1_diag)

    u = np.asarray(init_controls(cfg, dtype=jnp.float64)) + 1.0
    noise = RNG.normal(scale=0.9, size=(k, n, 2))
    pose = np.array([0.0, 0.0, 0.5])
    xd = np.array([0.5, 0.5, 0.0])

    _, _, traj_c = native.mppi_solve_ref(ref, u, noise, pose, xd,
                                         want_traj=True)
    _, traj_j = rollout_losses(cfg, model, jnp.asarray(pose),
                               jnp.asarray(u)[None] + jnp.asarray(noise),
                               jnp.asarray(xd))
    # JAX traj is (N, K, 3) time-major; native is (K, N, 3).
    np.testing.assert_allclose(np.swapaxes(traj_c, 0, 1),
                               np.asarray(traj_j), rtol=1e-9, atol=1e-10)


def test_closed_loop_parity():
    """Receding-horizon loop: both implementations track the same course
    when driven by the same per-step noise."""
    k, n = 16, 40
    cfg = MPPIConfig(horizon=n * 0.01, dt=0.01, rollouts=k)
    model = CartParams(0.033, 0.160)
    ref = native.MPPIRefParams(
        wheel_radius=0.033, wheel_base=0.160, lambda_=cfg.lambda_,
        max_wheel_vel=cfg.max_wheel_vel, dt=cfg.dt, steps=n, rollouts=k,
        q_diag=cfg.q_diag, r_diag=cfg.r_diag, p1_diag=cfg.p1_diag)

    from tpunav.models.cart import kinematic_cart
    from tpunav.ops.rk4 import rk4_step

    u_c = np.asarray(init_controls(cfg, dtype=jnp.float64))
    u_j = jnp.asarray(u_c)
    pose_c = np.zeros(3)
    pose_j = jnp.zeros(3, jnp.float64)
    xd = np.array([0.4, 0.0, 0.0])
    f = lambda x, uu: kinematic_cart(model, x, uu)

    for _ in range(30):
        noise = RNG.normal(scale=0.9, size=(k, n, 2))
        cmd_c, u_c = native.mppi_solve_ref(ref, u_c, noise, pose_c, xd)
        cmd_j, u_j = _jax_solve_with_noise(
            cfg, model, u_j, jnp.asarray(noise), pose_j, jnp.asarray(xd))
        np.testing.assert_allclose(cmd_c, np.asarray(cmd_j), atol=1e-8)
        # Advance both plants with their own command (1/60 s tick).
        pose_j = rk4_step(f, pose_j, jnp.asarray(cmd_c), 1.0 / 60.0)
        pose_c = np.asarray(pose_j)
    # The loop actually drove toward the goal (30 ticks at 1/60 s with
    # max wheel speed 6.35 rad/s covers at most ~0.1 m).
    assert pose_c[0] > 0.02


def test_native_ekf_known_da_matches_jax():
    """The from-spec C oracle (native/csrc/ekf_ref.cpp) must reproduce
    ``known_correspondence_slam`` in deterministic f64 mode over a
    multi-step course with NaN-gated visibility — state, covariance, and
    active mask (pins the r5 compaction + sparse-H chain to an
    independent flat-loop implementation of the same spec)."""
    from tpunav.estimation.ekf import (EKFConfig, ekf_init,
                                       known_correspondence_slam)

    n = 6
    cfg = EKFConfig(num_landmarks=n, spd_repair=False,
                    motion_noise=(1e-6, 1e-6, 1e-6),
                    measurement_noise=(1e-5, 1e-5))
    rng = np.random.default_rng(2)
    lms = rng.uniform(-1.0, 1.0, (n, 2))
    st = ekf_init(cfg)                      # f64
    c_state = np.asarray(st.state)
    c_cov = np.asarray(st.cov)
    c_active = np.asarray(st.active)
    u = np.array([0.03, 0.015])
    pose = np.zeros(3)

    for t in range(10):
        pose = np.array([pose[0] + u[0],
                         pose[1] + u[1] * np.cos(pose[0] + u[0]),
                         pose[2] + u[1] * np.sin(pose[0] + u[0])])
        ct, s_ = np.cos(pose[0]), np.sin(pose[0])
        rel = lms - pose[1:3]
        rf = np.stack([ct * rel[:, 0] + s_ * rel[:, 1],
                       -s_ * rel[:, 0] + ct * rel[:, 1]], -1)
        vis = np.linalg.norm(rel, axis=1) < 1.1
        meas = np.where(vis[:, None], rf + rng.normal(0, 1e-3, rf.shape),
                        np.nan)
        st = known_correspondence_slam(cfg, st, jnp.asarray(meas),
                                       jnp.asarray(u))
        c_state, c_cov, c_active = native.ekf_known_update(
            n, cfg.measurement_noise, cfg.motion_noise, c_state, c_cov,
            c_active, meas, u)
        np.testing.assert_allclose(np.asarray(st.state), c_state,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(st.cov), c_cov, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(st.active), c_active)


def test_native_ekf_unknown_da_matches_jax():
    """Same oracle check for the Mahalanobis-gated path: gating
    decisions (add/update/ignore), count, state, and covariance must
    track the JAX chain exactly."""
    from tpunav.estimation.ekf import (EKFConfig, ekf_init,
                                       slam_unknown_da)

    n = 8
    cfg = EKFConfig(num_landmarks=n, dmin=5e1, dmax=1e4,
                    spd_repair=False,
                    motion_noise=(1e-5, 1e-5, 1e-5),
                    measurement_noise=(1e-5, 1e-5))
    rng = np.random.default_rng(5)
    lms = rng.uniform(-1.2, 1.2, (6, 2))
    st = ekf_init(cfg)
    c_state = np.asarray(st.state)
    c_cov = np.asarray(st.cov)
    c_active = np.asarray(st.active)
    c_count = 0
    u = np.array([0.02, 0.012])
    pose = np.zeros(3)

    for t in range(10):
        pose = np.array([pose[0] + u[0],
                         pose[1] + u[1] * np.cos(pose[0] + u[0]),
                         pose[2] + u[1] * np.sin(pose[0] + u[0])])
        ct, s_ = np.cos(pose[0]), np.sin(pose[0])
        rel = lms - pose[1:3]
        rf = np.stack([ct * rel[:, 0] + s_ * rel[:, 1],
                       -s_ * rel[:, 0] + ct * rel[:, 1]], -1)
        vis = np.linalg.norm(rel, axis=1) < 1.2
        meas = np.where(vis[:, None], rf + rng.normal(0, 1e-3, rf.shape),
                        np.nan)
        st = slam_unknown_da(cfg, st, jnp.asarray(meas), jnp.asarray(u))
        c_state, c_cov, c_active, c_count = native.ekf_unknown_update(
            n, cfg.measurement_noise, cfg.motion_noise, c_state, c_cov,
            c_active, c_count, cfg.dmin, cfg.dmax, meas, u)
        assert int(st.count) == c_count, (t, int(st.count), c_count)
        np.testing.assert_array_equal(np.asarray(st.active), c_active)
        np.testing.assert_allclose(np.asarray(st.state), c_state,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(st.cov), c_cov, atol=1e-9)
    assert c_count >= 5              # the course actually built a map
