"""End-to-end demo: MPPI waypoint following with a simulated diff-drive plant.

TPU-native equivalent of `roslaunch nuturtle_robot mppi_waypoints.launch`
(ref: nuturtle_robot/src/mppi_waypoints_node.cpp): the MPPI controller, the
fake-encoder plant, and the odometer collapse into one jitted tick — there
are no process boundaries, and the whole tick is a single device program
(eager per-op dispatch through the TPU tunnel costs ~100 ms/op, so the tick
MUST be fused).
"""

import time

import jax
import jax.numpy as jnp

from tpunav.control import MPPIConfig, mppi_solve, init_controls
from tpunav.core import diff_drive as dd
from tpunav.models.cart import CartParams


def main():
    cfg = MPPIConfig()  # reference defaults: K=5, N=100, dt=0.01
    cart = CartParams(dd.TURTLEBOT3.wheel_radius, dd.TURTLEBOT3.wheel_base)
    tick = 1.0 / 60.0  # fake-encoder rate (ref: fake_diff_encoders_node.cpp:91)

    @jax.jit
    def step(u, key, state, wpt):
        pose = dd.pose(state)                       # [theta, x, y]
        pose_xyt = jnp.stack([pose[1], pose[2], pose[0]])
        key, sub = jax.random.split(key)
        cmd, u = mppi_solve(cfg, cart, u, sub, pose_xyt, wpt)
        twist = dd.wheels_to_twist(dd.TURTLEBOT3, cmd)
        state = dd.feedforward(dd.TURTLEBOT3, state, twist * tick)
        dist = jnp.hypot(pose[1] - wpt[0], pose[2] - wpt[1])
        return u, key, state, dist

    course = [(0.5, 0.0, 0.0), (0.5, 0.5, 1.57), (0.0, 0.5, 3.14),
              (0.0, 0.0, 0.0)]
    u = init_controls(cfg)
    key = jax.random.PRNGKey(0)
    state = dd.init_state(0.0, 0.0, 0.0)

    print(f"devices: {jax.devices()}")
    t0 = time.time()
    solves = 0
    for wpt_i, wpt in enumerate(course):
        wpt_arr = jnp.asarray(wpt, dtype=jnp.float32)
        for i in range(1200):
            u, key, state, dist = step(u, key, state, wpt_arr)
            solves += 1
            if float(dist) < 0.1:  # goal_thresh (ref: mppi_waypoints.launch)
                print(f"reached waypoint {wpt_i} {wpt} after {i} ticks")
                break
        else:
            raise SystemExit(f"failed to reach {wpt}: pose={dd.pose(state)}")
    wall = time.time() - t0
    print(f"{solves} solves in {wall:.1f}s = {solves / wall:.1f} Hz "
          "(incl. compile + per-tick host sync)")


if __name__ == "__main__":
    main()
