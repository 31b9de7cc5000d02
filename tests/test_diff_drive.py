"""Diff-drive kinematics parity tests.

Golden values mirror rigid2d/test/test_diff_drive.cpp (wheel IK/FK,
odometry propagation, feedforward, and the feedforward↔updateOdometry
consistency invariant at lines 391-475).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.core import diff_drive as dd

PI = np.pi

# Reference test geometry: wheel_base=1.0, wheel_radius=0.02
# (test_diff_drive.cpp uses these throughout).
PARAMS = dd.DiffDriveParams(
    wheel_radius=jnp.float64(0.02), wheel_base=jnp.float64(1.0)
)


def _state(theta=0.0, x=0.0, y=0.0):
    return dd.init_state(theta, x, y, dtype=jnp.float64)


def test_twist_to_wheels_pure_translation():
    # vx=0.01 straight: ul = ur = vx/r = 0.5 (ref :14-45).
    wv = dd.twist_to_wheels(PARAMS, jnp.array([0.0, 0.01, 0.0]))
    assert np.allclose(np.asarray(wv), [0.5, 0.5], atol=1e-12)


def test_twist_to_wheels_pure_rotation():
    # w=pi/10: ul = -d*w/r, ur = +d*w/r with d = base/2 = 0.5.
    wv = np.asarray(dd.twist_to_wheels(PARAMS, jnp.array([PI / 10, 0.0, 0.0])))
    expected = (PI / 10) * 0.5 / 0.02
    assert np.allclose(wv, [-expected, expected], atol=1e-12)


def test_wheels_to_twist_roundtrip():
    tw = jnp.array([0.3, 0.05, 0.0])
    back = dd.wheels_to_twist(PARAMS, dd.twist_to_wheels(PARAMS, tw))
    assert np.allclose(np.asarray(back), np.asarray(tw), atol=1e-12)


def test_pure_translation_odom():
    # ref :120-157: both wheels advance pi/30 rad.
    st, vel = dd.update_odometry(PARAMS, _state(), PI / 30, PI / 30)
    vel = np.asarray(vel)
    assert np.allclose(vel, [0.10472, 0.10472], atol=1e-3)
    pose = np.asarray(dd.pose(st))
    assert np.isclose(pose[0], 0.0, atol=1e-3)       # theta
    assert np.isclose(pose[1], 0.0020944, atol=1e-3)  # x
    assert np.isclose(pose[2], 0.0, atol=1e-3)       # y


def test_no_movement_odom():
    st, vel = dd.update_odometry(PARAMS, _state(), 0.0, 0.0)
    assert np.allclose(np.asarray(vel), [0.0, 0.0], atol=1e-12)
    assert np.allclose(np.asarray(dd.pose(st)), [0.0, 0.0, 0.0], atol=1e-12)


def test_pure_rotation_odom():
    # ref :199-238.
    st, vel = dd.update_odometry(PARAMS, _state(), -PI / 30, PI / 30)
    assert np.allclose(np.asarray(vel), [-0.10472, 0.10472], atol=1e-3)
    pose = np.asarray(dd.pose(st))
    assert np.isclose(pose[0], 0.00418879, atol=1e-3)
    assert np.isclose(pose[1], 0.0, atol=1e-3)
    assert np.isclose(pose[2], 0.0, atol=1e-3)


def test_trans_rot_odom():
    # ref :242-276.
    st, vel = dd.update_odometry(PARAMS, _state(), 0.0, PI / 30)
    assert np.allclose(np.asarray(vel), [0.0, 0.10472], atol=1e-3)
    pose = np.asarray(dd.pose(st))
    assert np.isclose(pose[0], 0.0020944, atol=1e-3)
    assert np.isclose(pose[1], 0.0010472, atol=1e-3)
    assert np.isclose(pose[2], 0.0, atol=1e-3)


def test_straight_line_feedforward():
    # ref :281-316.
    st = dd.feedforward(PARAMS, _state(), jnp.array([0.0, 0.01, 0.0]))
    pose = np.asarray(dd.pose(st))
    assert np.allclose(pose, [0.0, 0.01, 0.0], atol=1e-3)


def test_rotation_feedforward():
    # ref :320-352.
    st = dd.feedforward(PARAMS, _state(), jnp.array([PI / 10, 0.0, 0.0]))
    pose = np.asarray(dd.pose(st))
    assert np.isclose(pose[0], 0.314159, atol=1e-3)
    assert np.allclose(pose[1:], [0.0, 0.0], atol=1e-3)


def test_trans_rot_feedforward():
    # ref :357-388.
    st = dd.feedforward(PARAMS, _state(), jnp.array([PI / 10, 0.01, 0.0]))
    pose = np.asarray(dd.pose(st))
    assert np.isclose(pose[0], 0.314159, atol=1e-3)
    assert np.isclose(pose[1], 0.00983632, atol=1e-3)
    assert np.isclose(pose[2], 0.00155792, atol=1e-3)


def test_feedforward_update_odom_consistency():
    # ref :391-475: feedforward on one model must equal updateOdometry fed
    # that model's encoders on a second model — the key invariant.
    cmd = jnp.array([0.0, 0.01, 0.0])
    st1 = dd.feedforward(PARAMS, _state(), cmd)
    st2, _ = dd.update_odometry(PARAMS, _state(), st1.left, st1.right)
    assert np.allclose(np.asarray(dd.pose(st1)), np.asarray(dd.pose(st2)),
                       atol=1e-3)
    assert np.isclose(float(st1.left), float(st2.left), atol=1e-3)
    assert np.isclose(float(st1.right), float(st2.right), atol=1e-3)
    assert np.isclose(float(st1.ul), float(st2.ul), atol=1e-3)
    assert np.isclose(float(st1.ur), float(st2.ur), atol=1e-3)


def test_feedforward_update_odom_consistency_rot():
    # Same invariant under combined motion. The twist is kept small enough
    # that wheel velocities stay inside [-pi, pi): the reference wraps both
    # encoder angles and wheel velocities (diff_drive.cpp:153-168), so the
    # invariant only holds when no 2*pi aliasing occurs (the reference's
    # own test uses a wrap-free straight-line command for the same reason).
    cmd = jnp.array([0.05, 0.01, 0.0])
    st1 = dd.feedforward(PARAMS, _state(), cmd)
    st2, _ = dd.update_odometry(PARAMS, _state(), st1.left, st1.right)
    assert np.allclose(np.asarray(dd.pose(st1)), np.asarray(dd.pose(st2)),
                       atol=1e-3)


def test_vmap_over_robots():
    # The whole odometry chain must vmap over a fleet/particle axis.
    n = 16
    lefts = jnp.linspace(-0.3, 0.3, n)
    rights = jnp.linspace(0.2, -0.1, n)
    batched_state = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (n, *leaf.shape)), _state()
    )
    step = jax.vmap(lambda s, l, r: dd.update_odometry(PARAMS, s, l, r))
    sts, vels = step(batched_state, lefts, rights)
    # Spot-check one lane against the scalar path.
    st5, vel5 = dd.update_odometry(PARAMS, _state(), lefts[5], rights[5])
    assert np.allclose(np.asarray(vels[5]), np.asarray(vel5), atol=1e-12)
    assert np.allclose(np.asarray(sts.pose[5]), np.asarray(st5.pose),
                       atol=1e-12)


def test_reset_keeps_encoders():
    st, _ = dd.update_odometry(PARAMS, _state(), 0.5, 0.7)
    st2 = dd.reset(st, 0.0, 0.0, 0.0)
    assert np.allclose(np.asarray(st2.pose), [0.0, 0.0, 0.0])
    assert np.isclose(float(st2.left), float(st.left))
    assert np.isclose(float(st2.right), float(st.right))
