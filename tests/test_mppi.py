"""MPPI solver tests: RK4 integration accuracy, cost/softmax semantics
matching the reference algorithm (controller/src/controller/mppi.cpp), and
closed-loop waypoint convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.control import mppi as m
from tpunav.models.cart import CartParams, kinematic_cart
from tpunav.ops.rk4 import rk4_solve, rk4_step

MODEL = CartParams(wheel_radius=jnp.float64(0.033),
                   wheel_base=jnp.float64(0.160))


def small_cfg(**kw):
    defaults = dict(lambda_=0.01, max_wheel_vel=6.35495, ul_var=0.9,
                    ur_var=0.9, horizon=1.0, dt=0.01, rollouts=5)
    defaults.update(kw)
    return m.MPPIConfig(**defaults)


# ---------------------------------------------------------------- RK4 ----

def test_rk4_matches_exact_circle():
    # Constant wheel speeds → constant (v, w) → exact circular arc.
    ul, ur = 1.0, 2.0
    r, b = 0.033, 0.160
    v = r / 2 * (ul + ur)
    w = r / b * (ur - ul)
    dt, n = 0.01, 100
    us = jnp.broadcast_to(jnp.array([ul, ur]), (n, 2))
    f = lambda x, u: kinematic_cart(MODEL, x, u)
    traj = rk4_solve(f, jnp.zeros(3), us, dt)
    t = dt * n
    exact = np.array([v / w * np.sin(w * t), v / w * (1 - np.cos(w * t)),
                      w * t])
    assert np.allclose(np.asarray(traj[-1]), exact, atol=1e-10)


def test_rk4_step_order():
    # Halving dt must reduce error ~16x (4th order).
    f = lambda x, u: kinematic_cart(MODEL, x, u)
    u = jnp.array([3.0, 5.0])

    def endpoint(dt, steps):
        x = jnp.zeros(3)
        for _ in range(steps):
            x = rk4_step(f, x, u, dt)
        return np.asarray(x)

    r, b = 0.033, 0.160
    v = r / 2 * 8.0
    w = r / b * 2.0
    t = 0.8
    exact = np.array([v / w * np.sin(w * t), v / w * (1 - np.cos(w * t)),
                      w * t])
    e1 = np.linalg.norm(endpoint(0.1, 8) - exact)
    e2 = np.linalg.norm(endpoint(0.05, 16) - exact)
    assert e1 / max(e2, 1e-300) > 12.0 or e1 < 1e-12


# ------------------------------------------------------------ solver -----

def _reference_solve_numpy(cfg, model, u, noise, x0, xd):
    """Literal NumPy transcription of the reference solve loop
    (mppi.cpp:72-140) for cross-checking the vectorized JAX version."""
    n, k = cfg.steps, cfg.rollouts
    r, b = float(model.wheel_radius), float(model.wheel_base)
    q = np.asarray(cfg.q_diag)
    rw = np.asarray(cfg.r_diag)
    p1 = np.asarray(cfg.p1_diag)
    loss = np.zeros((n, k))

    def ode(x, u_t):
        fwd = r / 2 * (u_t[0] + u_t[1])
        return np.array([fwd * np.cos(x[2]), fwd * np.sin(x[2]),
                         r / b * (u_t[1] - u_t[0])])

    for kk in range(k):
        u_pert = np.asarray(u) + np.asarray(noise[kk])  # (n, 2)
        x = np.asarray(x0, dtype=float).copy()
        for i in range(n):
            ut = u_pert[i]
            k1 = ode(x, ut)
            k2 = ode(x + cfg.dt / 2 * k1, ut)
            k3 = ode(x + cfg.dt / 2 * k2, ut)
            k4 = ode(x + cfg.dt * k3, ut)
            x = x + cfg.dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            err = x - np.asarray(xd)
            loss[i, kk] = err @ (q * err) + ut @ (rw * ut)
        err = x - np.asarray(xd)
        loss[n - 1, kk] = err @ (p1 * err)

    j = np.flipud(np.cumsum(np.flipud(loss), axis=0))
    u_new = np.asarray(u).copy()
    for i in range(n):
        ji = j[i] - j[i].min()
        w = np.exp(-ji / cfg.lambda_) + 1e-8
        w /= w.sum()
        u_new[i] += w @ np.asarray(noise)[:, i, :]
        u_new[i] = np.clip(u_new[i], -cfg.max_wheel_vel, cfg.max_wheel_vel)
    cmd = u_new[0].copy()
    u_next = np.vstack([u_new[1:], np.asarray(cfg.u_init)[None]])
    return cmd, u_next


def test_solve_matches_reference_algorithm():
    # Same noise in → identical controls out vs the literal loop transcription.
    cfg = small_cfg()
    u = m.init_controls(cfg, dtype=jnp.float64)
    key = jax.random.PRNGKey(42)
    noise = m.sample_perturbations(cfg, key, dtype=jnp.float64)
    x0 = jnp.array([0.1, -0.2, 0.3])
    xd = jnp.array([1.0, 1.0, 0.0])

    loss, _ = m.rollout_losses(cfg, MODEL, x0, u[None] + noise, xd)
    j = m.cost_to_go(loss)
    u_new = m.update_controls(cfg, u, noise, j)
    cmd, u_next = u_new[0], m.shift_controls(cfg, u_new)

    ref_cmd, ref_u_next = _reference_solve_numpy(
        cfg, MODEL, np.asarray(u), np.asarray(noise), np.asarray(x0),
        np.asarray(xd))
    assert np.allclose(np.asarray(cmd), ref_cmd, atol=1e-9)
    assert np.allclose(np.asarray(u_next), ref_u_next, atol=1e-9)


def test_cost_to_go_reverse_cumsum():
    loss = jnp.arange(12.0).reshape(4, 3)
    j = np.asarray(m.cost_to_go(loss))
    expected = np.flipud(np.cumsum(np.flipud(np.asarray(loss)), axis=0))
    assert np.allclose(j, expected)


def test_controls_clamped():
    cfg = small_cfg(ul_var=100.0, ur_var=100.0)
    u = m.init_controls(cfg, dtype=jnp.float64)
    cmd, u_next = m.mppi_solve(cfg, MODEL, u, jax.random.PRNGKey(0),
                               jnp.array([0.0, 0.0, 0.0]),
                               jnp.array([5.0, 5.0, 0.0]))
    assert np.all(np.abs(np.asarray(u_next)) <= cfg.max_wheel_vel + 1e-12)
    assert np.all(np.abs(np.asarray(cmd)) <= cfg.max_wheel_vel + 1e-12)


def test_shift_refills_with_u_init():
    cfg = small_cfg(u_init=(0.7, -0.3))
    u = jnp.arange(2.0 * cfg.steps).reshape(cfg.steps, 2)
    shifted = np.asarray(m.shift_controls(cfg, u))
    assert np.allclose(shifted[:-1], np.asarray(u)[1:])
    assert np.allclose(shifted[-1], [0.7, -0.3])


def test_closed_loop_reaches_waypoint():
    # MPPI at reference defaults (K=5, N=100) must drive the cart from the
    # origin to a 0.5 m goal within a simulated 10 s (ref behavior: the
    # waypoint course completes; goal_thresh=0.1 in mppi_waypoints.launch).
    cfg = small_cfg()
    model = MODEL
    u = m.init_controls(cfg, dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    xd = jnp.array([0.5, 0.5, 0.0])
    solve = jax.jit(lambda u, k, p: m.mppi_solve(cfg, model, u, k, p, xd))

    pose = jnp.array([0.0, 0.0, 0.0])
    hit = False
    for _ in range(600):  # 60 Hz loop for 10 s
        key, sub = jax.random.split(key)
        cmd, u = solve(u, sub, pose)
        # Plant: integrate the commanded wheel speeds for 1/60 s.
        f = lambda x, uu: kinematic_cart(model, x, uu)
        pose = rk4_step(f, pose, cmd, 1.0 / 60.0)
        if float(jnp.linalg.norm(pose[:2] - xd[:2])) < 0.1:
            hit = True
            break
    assert hit, f"never reached goal; final pose {np.asarray(pose)}"
