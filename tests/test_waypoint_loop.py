"""Device-resident waypoint course runner (control/waypoint_loop.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.control.mppi import MPPIConfig
from tpunav.control.waypoint_loop import (
    CourseConfig,
    course_init,
    run_course,
    run_course_chunked,
)
from tpunav.models.cart import CartParams

MODEL = CartParams(0.033, 0.160)
CFG = MPPIConfig(horizon=0.5, dt=0.01, rollouts=64)
COURSE = [(0.3, 0.0, 0.0), (0.3, 0.3, 1.57), (0.0, 0.3, 3.14),
          (0.0, 0.0, 0.0)]


def test_run_course_completes():
    course = CourseConfig(goal_thresh=0.1, max_ticks=6000)
    st = course_init(CFG, jnp.zeros(3), seed=0)
    run = jax.jit(lambda st: run_course(CFG, course, MODEL,
                                        jnp.asarray(COURSE), st))
    out = run(st)
    assert bool(out.done), f"course incomplete after {int(out.ticks)} ticks"
    assert int(out.visits) == len(COURSE)
    # Ends near the last waypoint.
    assert float(jnp.hypot(out.pose[0] - COURSE[-1][0],
                           out.pose[1] - COURSE[-1][1])) < 0.15


def test_chunked_matches_fused():
    """Chunked execution is the same program split at chunk boundaries."""
    course = CourseConfig(goal_thresh=0.1, max_ticks=6000)
    st0 = course_init(CFG, jnp.zeros(3), seed=0)
    out_a = jax.jit(lambda st: run_course(CFG, course, MODEL,
                                          jnp.asarray(COURSE), st))(st0)

    paths = []
    out_b = run_course_chunked(CFG, course, MODEL, jnp.asarray(COURSE),
                               st0, chunk=100,
                               on_chunk=lambda s, p: paths.append(p))
    assert bool(out_b.done)
    assert int(out_a.visits) == int(out_b.visits)
    # The chunked run overshoots by < 1 chunk of no-op (done) ticks;
    # poses at completion must agree (done pose is frozen).
    np.testing.assert_allclose(np.asarray(out_a.pose),
                               np.asarray(out_b.pose), atol=1e-5)
    assert len(paths) >= 1
    # Per-tick telemetry stream (the rqt_plot-style metrics feed).
    tel = paths[0]
    assert tel["pose"].shape == (100, 3)
    assert tel["d2g"].shape == (100,)
    assert tel["wpt_idx"].shape == (100,)


def test_done_freezes_pose():
    """After the course completes, further ticks must not move the cart
    (the done branch zeroes the command and freezes the pose)."""
    from tpunav.control.waypoint_loop import course_tick

    course = CourseConfig(goal_thresh=0.1, max_ticks=6000)
    st = course_init(CFG, jnp.zeros(3), seed=0)
    out = jax.jit(lambda st: run_course(CFG, course, MODEL,
                                        jnp.asarray(COURSE), st))(st)
    assert bool(out.done)
    tick = jax.jit(lambda st: course_tick(CFG, course, MODEL,
                                          jnp.asarray(COURSE), st))
    out2 = tick(tick(out))
    np.testing.assert_allclose(np.asarray(out2.pose),
                               np.asarray(out.pose), atol=0)
    assert bool(out2.done)


def test_course_with_motor_dynamics_completes():
    """Torque-capped first-order motor lag between command and plant
    (ref: turtle_drive_plugin.cpp:226-232 velocity targets under
    max_motor_torque): the course must still close all waypoints."""
    from tpunav.sim.motor import MotorParams

    course = CourseConfig(goal_thresh=0.1, max_ticks=8000,
                          motor=MotorParams(time_const=0.05))
    st = course_init(CFG, jnp.zeros(3), seed=0)
    out = jax.jit(lambda st: run_course(CFG, course, MODEL,
                                        jnp.asarray(COURSE), st))(st)
    assert bool(out.done), f"course incomplete after {int(out.ticks)} ticks"
    assert int(out.visits) == len(COURSE)


def test_motor_track_ramps_and_caps():
    from tpunav.sim.motor import MotorParams, track

    p = MotorParams(time_const=0.1, max_torque=1.5, eff_inertia=2.4e-3)
    v = jnp.zeros(2)
    cmd = jnp.asarray([5.0, -5.0])
    dt = 1.0 / 200.0
    v1 = track(p, v, cmd, dt)
    # First-order step response, within the accel cap.
    expected = (1.0 - np.exp(-dt / p.time_const)) * 5.0
    assert abs(float(v1[0]) - min(expected, p.max_accel * dt)) < 1e-6
    assert float(v1[1]) == -float(v1[0])
    # Converges to the command.
    for _ in range(400):
        v = track(p, v, cmd, dt)
    np.testing.assert_allclose(np.asarray(v), np.asarray(cmd), atol=1e-2)
    # tau=0 is exact pass-through (legacy plant).
    assert np.all(np.asarray(track(MotorParams(), v, cmd, dt)) ==
                  np.asarray(cmd))
