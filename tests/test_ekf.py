"""EKF SLAM tests: motion model, landmark initialization, innovation
behavior, closed-loop accuracy vs dead-reckoning (the reference's
evaluation, nuslam/README.md), and unknown-DA gating.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.estimation.ekf import (
    EKFConfig,
    ekf_init,
    known_correspondence_slam,
    landmark_map,
    robot_pose,
    slam_unknown_da,
)
from tpunav.estimation.ekf import filter as ekff
from tpunav.estimation.ekf.spd import is_spd, nearest_spd
from tpunav.sim import landmark_measurements

# 12 ground-truth cylinders (ref: nuslam/config/block_world_landmarks.yaml).
LANDMARKS = jnp.array([
    [0.75, 0.1], [0.95, 0.6], [0.5, 0.8], [0.1, 0.75],
    [-0.4, 0.9], [-0.8, 0.5], [-0.9, 0.0], [-0.7, -0.55],
    [-0.2, -0.8], [0.3, -0.9], [0.8, -0.6], [1.0, -0.1],
])


def _true_motion(pose, u):
    """Ground-truth unicycle propagation with the same exact-integration
    branch as the filter (so the only estimation error is injected)."""
    return ekff.motion_update(EKFConfig(), jnp.concatenate(
        [pose, jnp.zeros(0)]), u, jnp.zeros(3))[:3] if pose.shape == (3,) \
        else None


def test_motion_update_straight():
    cfg = EKFConfig(num_landmarks=2)
    st = ekf_init(cfg)
    out = ekff.motion_update(cfg, st.state, jnp.array([0.0, 0.1]),
                             jnp.zeros(3))
    assert np.allclose(np.asarray(out[:3]), [0.0, 0.1, 0.0], atol=1e-12)


def test_motion_update_arc():
    cfg = EKFConfig(num_landmarks=2)
    st = ekf_init(cfg)
    w, vx = 0.5, 0.1
    out = ekff.motion_update(cfg, st.state, jnp.array([w, vx]), jnp.zeros(3))
    # Reference formula: theta' = theta + w; then exact arc increment
    # evaluated at theta' (ekf_filter.cpp:518-531).
    th = w
    ex = (-vx / w) * np.sin(th) + (vx / w) * np.sin(th + w)
    ey = (vx / w) * np.cos(th) - (vx / w) * np.cos(th + w)
    assert np.allclose(np.asarray(out[:3]), [th, ex, ey], atol=1e-12)


def test_known_da_initializes_landmarks():
    cfg = EKFConfig(num_landmarks=4)
    st = ekf_init(cfg)
    # Robot at origin; two landmarks directly visible.
    meas = jnp.array([[1.0, 0.0], [0.0, 2.0], [jnp.nan, jnp.nan],
                      [jnp.nan, jnp.nan]])
    st = known_correspondence_slam(cfg, st, meas, jnp.array([0.0, 0.0]))
    lms, active = landmark_map(cfg, st)
    assert np.asarray(active).tolist() == [True, True, False, False]
    assert np.allclose(np.asarray(lms[0]), [1.0, 0.0], atol=1e-6)
    assert np.allclose(np.asarray(lms[1]), [0.0, 2.0], atol=1e-6)
    # Pose unchanged (zero innovation at init).
    assert np.allclose(np.asarray(robot_pose(st)), [0.0, 0.0, 0.0],
                       atol=1e-6)


def test_known_da_repeated_exact_measurements_keep_pose():
    cfg = EKFConfig(num_landmarks=4)
    st = ekf_init(cfg)
    meas = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    for _ in range(5):
        st = known_correspondence_slam(cfg, st, meas, jnp.array([0.0, 0.0]))
    assert np.allclose(np.asarray(robot_pose(st)), [0.0, 0.0, 0.0],
                       atol=1e-5)
    assert bool(is_spd(st.cov))


def test_known_da_closed_loop_beats_odometry():
    # Drive an arc for 200 steps. The EKF receives BIASED odometry but
    # exact landmark measurements; dead-reckoning the biased odometry
    # drifts. Mirrors the reference's evaluation (nuslam/README.md:24-34).
    cfg = EKFConfig(num_landmarks=12)
    st = ekf_init(cfg)
    u_true = jnp.array([0.05, 0.02])
    bias = jnp.array([0.002, 0.0008])          # systematic odometry error
    u_noisy = u_true + bias

    pad = jnp.zeros(2 * cfg.num_landmarks)

    @jax.jit
    def run(st):
        def body(carry, _):
            true_pose, dead_reckon, st = carry
            true_pose = ekff.motion_update(
                cfg, jnp.concatenate([true_pose, pad]), u_true,
                jnp.zeros(3))[:3]
            dead_reckon = ekff.motion_update(cfg, dead_reckon, u_noisy,
                                             jnp.zeros(3))
            meas = landmark_measurements(LANDMARKS, true_pose, 5.0)
            st = known_correspondence_slam(cfg, st, meas, u_noisy)
            return (true_pose, dead_reckon, st), None

        init = (jnp.zeros(3), ekf_init(cfg).state, st)
        (true_pose, dead_reckon, st), _ = jax.lax.scan(
            body, init, None, length=200)
        return true_pose, dead_reckon, st

    true_pose, dead_reckon, st = run(st)
    err_ekf = np.linalg.norm(np.asarray(robot_pose(st)[1:]) -
                             np.asarray(true_pose[1:]))
    err_odom = np.linalg.norm(np.asarray(dead_reckon[1:3]) -
                              np.asarray(true_pose[1:]))
    assert err_ekf < 0.02, f"EKF error too large: {err_ekf}"
    assert err_ekf < err_odom / 5, (err_ekf, err_odom)
    # All 12 landmarks tracked.
    assert int(st.count) == 12


def test_unknown_da_adds_and_gates():
    # Gates: update if d* <= dmin, add if d* >= dmax (reference uses
    # dmin=2e4, dmax=1e7 with tiny measurement noise, slam_node.cpp:240-243).
    cfg = EKFConfig(num_landmarks=6, dmin=2e4, dmax=1e7)
    st = ekf_init(cfg)
    meas = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    st = slam_unknown_da(cfg, st, meas, jnp.array([0.0, 0.0]))
    assert int(st.count) == 2
    # Re-observing the same landmarks must NOT add new ones.
    st = slam_unknown_da(cfg, st, meas, jnp.array([0.0, 0.0]))
    assert int(st.count) == 2
    lms, active = landmark_map(cfg, st)
    assert np.allclose(np.asarray(lms[0]), [1.0, 0.0], atol=1e-4)
    assert np.allclose(np.asarray(lms[1]), [0.0, 2.0], atol=1e-4)


def test_unknown_da_capacity_cap():
    cfg = EKFConfig(num_landmarks=2)
    st = ekf_init(cfg)
    meas = jnp.array([[1.0, 0.0], [0.0, 2.0], [-3.0, 0.0], [0.0, -4.0]])
    st = slam_unknown_da(cfg, st, meas, jnp.array([0.0, 0.0]))
    assert int(st.count) == 2  # capped at capacity (ref: :228-241)


def test_unknown_da_closed_loop():
    cfg = EKFConfig(num_landmarks=12)
    st = ekf_init(cfg)
    u = jnp.array([0.05, 0.02])

    @jax.jit
    def run(st):
        def body(carry, _):
            true_pose, st = carry
            true_pose = ekff.motion_update(
                cfg, jnp.concatenate([true_pose, jnp.zeros(24)]), u,
                jnp.zeros(3))[:3]
            meas = landmark_measurements(LANDMARKS, true_pose, 5.0)
            st = slam_unknown_da(cfg, st, meas, u)
            return (true_pose, st), None

        (true_pose, st), _ = jax.lax.scan(
            body, (jnp.zeros(3), st), None, length=100)
        return true_pose, st

    true_pose, st = run(st)
    err = np.linalg.norm(np.asarray(robot_pose(st)) - np.asarray(true_pose))
    assert err < 0.05, f"unknown-DA drifted: {err}"
    assert int(st.count) == 12


def test_spd_repair():
    m = jnp.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    assert not bool(is_spd(m))
    fixed = nearest_spd(m)
    assert bool(is_spd(fixed))
    # Already-SPD matrices unchanged by repair_if_needed.
    good = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    from tpunav.estimation.ekf.spd import repair_if_needed
    assert np.allclose(np.asarray(repair_if_needed(good)), np.asarray(good))


def test_landmark_sensor_visibility_and_noise():
    pose = jnp.array([np.pi / 2, 1.0, 0.0])
    lm = jnp.array([[1.0, 1.0], [100.0, 0.0]])
    meas = landmark_measurements(lm, pose, 5.0)
    # Landmark (1,1) is 1 m ahead of a robot at (1,0) facing +y → (1, 0).
    assert np.allclose(np.asarray(meas[0]), [1.0, 0.0], atol=1e-12)
    assert np.all(np.isnan(np.asarray(meas[1])))
    noisy = landmark_measurements(lm, pose, 5.0, key=jax.random.PRNGKey(0),
                                  noise_std=0.01)
    assert not np.allclose(np.asarray(noisy[0]), [1.0, 0.0], atol=1e-6)


def test_sparse_h_algebra_matches_dense_jacobian():
    """The hot paths never materialize H (r5: the update chain runs on
    5-row slices of σ̄, _hc/_psi_hh/_maha_all) — pin them to the dense
    (2, S) reference Jacobian (ref: measurementJacobian
    ekf_filter.cpp:569-597) on a random symmetric covariance."""
    cfg = EKFConfig(num_landmarks=6)
    s = cfg.state_size
    rng = np.random.default_rng(7)
    state = jnp.asarray(rng.normal(0.0, 1.0, s))
    a = rng.normal(0.0, 1.0, (s, s))
    cov = jnp.asarray(a @ a.T + np.eye(s))
    r_m, b_m = 1.3, 0.4
    v_i = jnp.zeros(2, cov.dtype)
    R = jnp.diag(jnp.asarray(cfg.measurement_noise, cov.dtype))

    d_batched = ekff._maha_all(cfg, state, cov, r_m, b_m, v_i,
                               jnp.ones(6, bool))
    for j in range(6):
        jj = jnp.asarray(j, jnp.int32)
        H = ekff._measurement_jacobian(cfg, state, jj)
        hc, terms = ekff._hc(s, state, cov, jj)
        np.testing.assert_allclose(np.asarray(hc), np.asarray(H @ cov),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(ekff._psi_hh(hc, terms, jj)),
            np.asarray(H @ cov @ H.T), rtol=1e-9, atol=1e-9)
        z_hat = ekff._predicted_measurement(state, jj, v_i)
        dz = ekff._innovation(r_m, b_m, z_hat)
        psi = H @ cov @ H.T + R
        np.testing.assert_allclose(
            float(d_batched[j]), float(dz @ ekff._inv2(psi) @ dz),
            rtol=1e-8)


def test_compaction_matches_uncompacted_order():
    """NaN-interleaved measurements must produce the same filter state as
    the same VALID measurements alone (the compacted chain skips padding
    instead of no-op'ing through it)."""
    cfg = EKFConfig(num_landmarks=8, dmin=5e1, dmax=1e4, spd_repair=False)
    u = jnp.asarray([0.02, 0.01])
    rng = np.random.default_rng(3)
    lms = rng.uniform(-1.0, 1.0, (5, 2))

    def meas_at(pose, pad_rows):
        c, s = np.cos(pose[0]), np.sin(pose[0])
        rel = lms - pose[1:3]
        rf = np.stack([c * rel[:, 0] + s * rel[:, 1],
                       -s * rel[:, 0] + c * rel[:, 1]], -1)
        out = np.full((8, 2), np.nan)
        out[pad_rows] = rf[: len(pad_rows)]
        return jnp.asarray(out)

    for step in (known_correspondence_slam, slam_unknown_da):
        st_a = ekf_init(cfg)
        st_b = ekf_init(cfg)
        pose = np.zeros(3)
        for t in range(6):
            pose = np.array([pose[0] + 0.02,
                             pose[1] + 0.01 * np.cos(pose[0]),
                             pose[2] + 0.01 * np.sin(pose[0])])
            # Same 5 valid measurements; A sees them NaN-interleaved at
            # scattered rows, B sees them at the front.
            rows_a = [1, 2, 4, 6, 7] if step is slam_unknown_da \
                else [0, 1, 2, 3, 4]
            st_a = step(cfg, st_a, meas_at(pose, rows_a), u)
            st_b = step(cfg, st_b, meas_at(pose, [0, 1, 2, 3, 4]), u)
        if step is slam_unknown_da:
            # Unknown DA ignores slot ids entirely → identical states.
            np.testing.assert_allclose(np.asarray(st_a.state),
                                       np.asarray(st_b.state), atol=1e-9)
            assert int(st_a.count) == int(st_b.count)
        else:
            # Known DA: row IS the landmark id, so only the pose path
            # must agree (different slots hold the same landmarks).
            np.testing.assert_allclose(np.asarray(st_a.state[:3]),
                                       np.asarray(st_b.state[:3]),
                                       atol=1e-6)
