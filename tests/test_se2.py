"""SE(2) transform parity tests.

Golden values mirror rigid2d/test/test_rigid2d.cpp (apply/inverse/compose
at 90°, and the IntegrateTwist cases at lines 260-335).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.core import se2
from tpunav.core.angles import deg2rad, rad2deg

# The reference's stream-input transform: theta=90deg, x=-1, y=3.
T90 = se2.make(deg2rad(90.0), -1.0, 3.0)


def test_apply_point():
    # Rotating (1, 0) by 90° about origin then translating (-1, 3).
    p = jnp.array([1.0, 0.0])
    out = np.asarray(se2.apply(T90, p))
    assert np.allclose(out, [-1.0, 4.0], atol=1e-12)


def test_inverse_roundtrip():
    p = jnp.array([0.3, -2.0])
    out = se2.apply(se2.inverse(T90), se2.apply(T90, p))
    assert np.allclose(np.asarray(out), np.asarray(p), atol=1e-12)
    ident = se2.compose(T90, se2.inverse(T90))
    assert np.allclose(np.asarray(ident), [0.0, 0.0, 0.0], atol=1e-12)


def test_compose_associative():
    A = se2.make(0.3, 1.0, -2.0)
    B = se2.make(-1.2, 0.5, 0.7)
    C = se2.make(2.0, -0.1, 0.2)
    left = se2.compose(se2.compose(A, B), C)
    right = se2.compose(A, se2.compose(B, C))
    assert np.allclose(np.asarray(left), np.asarray(right), atol=1e-12)


def test_adjoint_twist():
    # Adjoint must satisfy: Ad_T(V) expressed in new frame equals
    # transforming the motion. Check against the matrix definition.
    V = jnp.array([0.7, 1.1, -0.4])
    out = np.asarray(se2.adjoint(T90, V))
    th, x, y = np.asarray(T90)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    w = float(V[0])
    v = np.asarray(V[1:])
    expected_v = R @ v + w * np.array([y, -x])
    assert np.allclose(out, [w, *expected_v], atol=1e-12)


def test_integrate_twist_translation():
    # ref test_rigid2d.cpp:275-286: twist (w=0, vx=1, vy=1) from T90.
    Tnew = se2.integrate_twist(T90, jnp.array([0.0, 1.0, 1.0]))
    th, x, y = np.asarray(Tnew)
    assert np.isclose(rad2deg(th), 90.0, atol=1e-3)
    assert np.isclose(x, -2.0, atol=1e-3)
    assert np.isclose(y, 4.0, atol=1e-3)


def test_integrate_twist_rot_trans():
    # ref test_rigid2d.cpp:289-300: twist (w=1, vx=1, vy=1) from T90.
    Tnew = se2.integrate_twist(T90, jnp.array([1.0, 1.0, 1.0]))
    th, x, y = np.asarray(Tnew)
    assert np.isclose(rad2deg(th), 147.296, atol=1e-3)
    assert np.isclose(x, -2.30117, atol=1e-3)
    assert np.isclose(y, 3.38177, atol=1e-3)


def test_integrate_zero_twist():
    # ref test_rigid2d.cpp:304-335: zero twist leaves the transform alone.
    Tnew = se2.integrate_twist(T90, jnp.zeros(3))
    assert np.allclose(np.asarray(Tnew), np.asarray(T90), atol=1e-12)


def test_exp_log_roundtrip():
    Vs = jnp.array(
        [[0.5, 1.0, -0.3], [0.0, 0.2, 0.1], [1e-8, -0.5, 0.4], [3.0, 0.0, 2.0]]
    )
    back = se2.log_twist(se2.exp_twist(Vs))
    assert np.allclose(np.asarray(back), np.asarray(Vs), atol=1e-9)


def test_exp_twist_small_angle_continuity():
    # The Taylor guard must agree with the exact formula near the switch.
    for w in [1e-7, 1e-6, 1.0000001e-6, 2e-6, 1e-5]:
        V = jnp.array([w, 1.0, 1.0])
        exact_A = np.sin(w) / w
        exact_B = (1 - np.cos(w)) / w
        out = np.asarray(se2.exp_twist(V))
        assert np.allclose(out[1], exact_A - exact_B, atol=1e-12)
        assert np.allclose(out[2], exact_B + exact_A, atol=1e-12)


def test_vmap_and_jit():
    Ts = jnp.stack([T90, se2.make(0.2, 1.0, 1.0)])
    Vs = jnp.array([[0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    batched = jax.jit(jax.vmap(se2.integrate_twist))(Ts, Vs)
    single0 = se2.integrate_twist(Ts[0], Vs[0])
    assert np.allclose(np.asarray(batched[0]), np.asarray(single0), atol=1e-12)
