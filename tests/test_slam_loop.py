"""SLAM-in-the-loop MPPI (BASELINE configs 3/4): the EKF pose estimate —
not ground truth — closes the control loop, fused as one device program."""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.control.mppi import MPPIConfig
from tpunav.control.slam_loop import (SlamLoopConfig, run_slam_loop,
                                      slam_loop_init)
from tpunav.estimation.ekf import EKFConfig
from tpunav.models.cart import CartParams

MODEL = CartParams(0.033, 0.160)
LANDMARKS = jnp.array([[0.6, 0.1], [0.4, 0.5], [-0.2, 0.6], [-0.5, -0.1],
                       [0.0, -0.6], [0.5, -0.4], [0.8, 0.6], [-0.6, 0.5]])
WAYPOINTS = jnp.array([[0.4, 0.0, 0.0], [0.3, 0.4, 1.57],
                       [-0.3, 0.3, 3.0]])


def _run(known_da: bool):
    mppi_cfg = MPPIConfig(horizon=0.4, dt=0.05, rollouts=256,
                          ul_var=4.0, ur_var=4.0)
    ekf_cfg = EKFConfig(num_landmarks=10, dmin=5e1, dmax=1e4,
                        spd_repair=False,
                        motion_noise=(1e-6, 1e-6, 1e-6),
                        measurement_noise=(1e-6, 1e-6))
    cfg = SlamLoopConfig(goal_thresh=0.12, known_da=known_da,
                         sensor_every=4)
    st = slam_loop_init(mppi_cfg, ekf_cfg, seed=1)
    run = jax.jit(lambda s: run_slam_loop(
        mppi_cfg, ekf_cfg, cfg, MODEL, WAYPOINTS, LANDMARKS, s,
        max_ticks=4000))
    return jax.block_until_ready(run(st))


def test_slam_in_the_loop_known_da_completes_course():
    st = _run(known_da=True)
    assert bool(st.done), f"course incomplete: visits={int(st.visits)} " \
                          f"ticks={int(st.ticks)}"
    # The filter must have kept the pose honest DESPITE the odometry bias:
    # estimate vs truth much tighter than dead-reckoning vs truth.
    est = np.asarray(st.ekf.state[:3])          # [theta, x, y]
    tru = np.asarray(st.true_pose)              # [x, y, theta]
    odo = np.asarray(st.odom)                   # [theta, x, y]
    ekf_err = np.hypot(est[1] - tru[0], est[2] - tru[1])
    odo_err = np.hypot(odo[1] - tru[0], odo[2] - tru[1])
    assert ekf_err < 0.05
    assert ekf_err < odo_err


def test_slam_in_the_loop_unknown_da_completes_course():
    st = _run(known_da=False)
    assert bool(st.done)
    est = np.asarray(st.ekf.state[:3])
    tru = np.asarray(st.true_pose)
    ekf_err = np.hypot(est[1] - tru[0], est[2] - tru[1])
    assert ekf_err < 0.1
    assert int(st.ekf.count) >= 4       # gating built a landmark map
