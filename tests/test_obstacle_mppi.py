"""MPPI with obstacle-avoidance cost (BASELINE config 2): the controller
must steer the cart around a wall between start and goal while plain
waypoint MPPI would drive straight through it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.control.mppi import MPPIConfig, init_controls, mppi_solve
from tpunav.control.obstacle_cost import (
    ObstacleCostConfig,
    distance_field_from_labels,
    make_obstacle_cost,
)
from tpunav.models.cart import CartParams, kinematic_cart
from tpunav.ops.rk4 import rk4_step
from tpunav.planning import PlanningGrid, load_obstacle_map

MODEL = CartParams(0.033, 0.160)

# A wall segment blocking the direct path from (0.2, 1.0) to (1.8, 1.0).
WALL_MAP = load_obstacle_map(
    [[[0.95, 0.7], [1.05, 0.7], [1.05, 1.3], [0.95, 1.3]]],
    bounds=[[0.0, 2.0], [0.0, 2.0]], resolution=0.05)


def _cost_fn():
    grid = PlanningGrid(WALL_MAP, inflation=0.0)
    field = distance_field_from_labels(grid.labels, grid.resolution)
    cfg = ObstacleCostConfig(xmin=grid.xmin, ymin=grid.ymin,
                             resolution=grid.resolution, r_safe=0.1,
                             w_hit=1e7, w_field=5e3, sigma=0.1)
    return make_obstacle_cost(cfg, field)


def test_cost_field_values():
    cost = _cost_fn()
    # On the wall → huge; far away → small.
    assert float(cost(jnp.array([1.0, 1.0]))) > 1e6
    assert float(cost(jnp.array([0.2, 1.9]))) < 1e4


def test_mppi_with_planner_waypoints_avoids_wall():
    """BASELINE config 2 as the framework composes it (like the reference
    architecture: global planner feeds the local controller): Theta*
    waypoints route around the wall, and the obstacle ESDF cost keeps the
    MPPI rollouts clear of it near the corner. A receding 2.5 s horizon
    alone cannot discover the detour (the stall is a horizon-induced
    local minimum, not a solver bug)."""
    from tpunav.planning import RoadMap, theta_star

    cost = _cost_fn()
    rm = RoadMap(WALL_MAP, n_nodes=80, k_neighbors=10, clearance=0.18,
                 seed=2)
    s_idx = rm.add_node([0.2, 1.0])
    g_idx = rm.add_node([1.8, 1.0])
    assert s_idx is not None and g_idx is not None
    route = theta_star(rm, s_idx, g_idx)
    assert route is not None and len(route) >= 3  # detours via waypoints

    cfg = MPPIConfig(lambda_=0.05, ul_var=4.0, ur_var=4.0, horizon=1.0,
                     dt=0.05, rollouts=512,
                     q_diag=(2e3, 2e3, 0.0), r_diag=(0.05, 0.05),
                     p1_diag=(1e3, 1e3, 0.0))
    solve = jax.jit(
        lambda u, k, p, wpt: mppi_solve(cfg, MODEL, u, k, p, wpt, cost))
    u = init_controls(cfg)
    key = jax.random.PRNGKey(0)
    pose = jnp.array([0.2, 1.0, 0.0])
    f = lambda x, uu: kinematic_cart(MODEL, x, uu)

    wp_idx = 1                     # route[0] is the start itself
    reached = False
    for i in range(1500):
        gx, gy = route[wp_idx]
        final = wp_idx == len(route) - 1
        key, sub = jax.random.split(key)
        cmd, u = solve(u, sub, pose, jnp.array([gx, gy, 0.0]))
        pose = rk4_step(f, pose, cmd, 1.0 / 60.0)
        x, y = float(pose[0]), float(pose[1])
        # Never inside the wall — the ESDF cost must hold the rollouts
        # out even while tracking waypoints near the corner.
        assert not (0.95 <= x <= 1.05 and 0.7 <= y <= 1.3), (x, y, i)
        # Intermediate waypoints get a loose arrival radius: near the
        # wall the soft ESDF gradient balances the tracking gradient a
        # little short of the waypoint (by design — the field pushes
        # away from the corner), so only the final goal is tight.
        if np.hypot(x - gx, y - gy) < (0.12 if final else 0.2):
            if final:
                reached = True
                break
            wp_idx += 1
    assert reached, f"never finished route; pose={np.asarray(pose)}"
