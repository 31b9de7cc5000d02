"""Angle-utility parity tests.

Golden cases mirror the reference's compile-time static_assert battery
(ref: rigid2d/include/rigid2d/rigid2d.hpp:111-138).
"""

import jax.numpy as jnp
import numpy as np

from tpunav.core import angles

PI = np.pi


def test_deg2rad_rad2deg_roundtrip():
    assert np.isclose(angles.deg2rad(45.0), PI / 4)
    assert np.isclose(angles.rad2deg(PI / 6), 30.0)
    assert np.isclose(angles.deg2rad(angles.rad2deg(2.1)), 2.1)
    assert np.isclose(angles.deg2rad(angles.rad2deg(4.5)), 4.5)


def test_normalize_angle_pi_reference_cases():
    assert np.isclose(angles.normalize_angle_pi(3.0 / 2.0 * PI), -PI / 2.0)
    assert np.isclose(angles.normalize_angle_pi(7.0 / 6.0 * PI), -5.0 / 6.0 * PI)
    assert np.isclose(angles.normalize_angle_pi(8.0 / 3.0 * PI), 2.0 / 3.0 * PI)
    assert np.isclose(
        angles.normalize_angle_pi(angles.deg2rad(350)),
        angles.normalize_angle_pi(angles.deg2rad(-10)),
    )


def test_normalize_angle_pi_half_open_interval():
    # [-pi, pi): the reference formula maps both +pi and -pi to -pi
    # (rigid2d.hpp:53-64: ((rad+pi) mod 2pi) - pi).
    assert np.isclose(angles.normalize_angle_pi(PI), -PI)
    assert np.isclose(angles.normalize_angle_pi(-PI), -PI)
    out = angles.normalize_angle_pi(jnp.linspace(-20.0, 20.0, 1001))
    assert np.all(np.asarray(out) >= -PI - 1e-12)
    assert np.all(np.asarray(out) < PI + 1e-12)


def test_normalize_angle_2pi_reference_cases():
    assert np.isclose(angles.normalize_angle_2pi(2 * PI + PI / 6), PI / 6)
    assert np.isclose(angles.normalize_angle_2pi(PI / 6), PI / 6)
    assert np.isclose(angles.normalize_angle_2pi(0.5), 0.5)
    assert np.isclose(angles.normalize_angle_2pi(-PI / 4), 7 * PI / 4)


def test_batched():
    x = jnp.array([[3.0 / 2.0 * PI, 0.1], [-7.0, 7.0]])
    out = np.asarray(angles.normalize_angle_pi(x))
    expected = np.vectorize(
        lambda v: float(angles.normalize_angle_pi(v))
    )(np.asarray(x))
    assert np.allclose(out, expected)
