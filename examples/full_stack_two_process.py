"""Full node graph across TWO OS processes over the network bus.

The reference's two-machine deployment
(ref: nuturtle_robot/launch/basic_remote.launch:1-40) runs
{serial_node + turtle_interface} on the turtlebot and {odometry, SLAM,
control, rviz} on the laptop, wired by ROS topics over TCPROS. This is
the tpunav equivalent over runtime/net.py — the SAME node classes as the
single-process graph, with the cross-process topics carried by
NetChannels:

  robot process  (the turtlebot):  DiffDrivePlant (Gazebo-plugin stand-in,
      truth owner) + TurtleInterfaceNode + OdometerNode + the fake
      landmark sensor (analysis-node equivalent)
  laptop process:  PRM/Theta* planner (plans the waypoint course once at
      startup, like the reference's prm_planner node) + EkfSlamNode +
      MPPI waypoint driver

Topics over the bus: cmd_vel ←, joints →, landmarks →, odom →
(arrows = robot→laptop direction). wheel_cmd and sensor ticks stay
in-process on the robot, exactly like the reference's serial link.

Execution is LOCKSTEP (wait_for_new on broker-stamped seqs): each cycle
the laptop waits for the robot's sensor frame, the robot waits for the
laptop's command — which pins the cross-process tick order to the
single-process one, so `--single` (same classes, in-process Channels,
same order) must produce the SAME trajectory. tests/test_net.py runs
both and asserts it.

Run:  python -m examples.full_stack_two_process --out-dir /tmp/x
"""

import argparse
import os

import numpy as np

CYCLES = 150
VISIBILITY = 1.5

# Planner world: two boxes between start and goal region; the Theta*
# path through the gap becomes the waypoint course.
OBSTACLES = [
    [[0.45, -0.3], [0.75, -0.3], [0.75, 0.25], [0.45, 0.25]],
    [[0.2, 0.5], [0.5, 0.5], [0.5, 0.8], [0.2, 0.8]],
]
BOUNDS = [[-0.4, 1.6], [-0.8, 1.3]]      # [[xmin, xmax], [ymin, ymax]]
START = np.array([0.0, 0.0])
GOAL = np.array([1.2, 0.8])

LANDMARKS = np.array([[0.6, 0.1], [0.4, 0.5], [-0.1, 0.6], [0.9, -0.3],
                      [1.1, 0.4], [0.2, -0.4], [1.2, 1.0], [-0.1, -0.4]])


def _pin_cpu():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


def plan_waypoints(jax):
    """PRM + Theta* over the obstacle world (the planner leg of the
    laptop process — planned once at startup like the reference's
    prm_planner node, planner/src/prm_planner_node.cpp:135-187)."""
    from tpunav.planning.prm import RoadMap, theta_star
    from tpunav.planning.world import load_obstacle_map

    obs = load_obstacle_map(OBSTACLES, bounds=BOUNDS)
    rm = RoadMap(obs, n_nodes=80, k_neighbors=8, clearance=0.08, seed=4)
    s = rm.add_node(START)
    g = rm.add_node(GOAL)
    assert s is not None and g is not None, "start/goal not in free space"
    path = theta_star(rm, s, g)
    assert path is not None and len(path) >= 2, "planner found no path"
    # Waypoints with headings toward the next vertex.
    wpts = []
    for i, p in enumerate(path[1:], start=1):
        d = np.asarray(path[i]) - np.asarray(path[i - 1])
        wpts.append([p[0], p[1], float(np.arctan2(d[1], d[0]))])
    return np.asarray(wpts)


def _mppi_law(jax, model_params):
    """MPPI control law for WaypointDriverNode: pose/waypoint → twist.
    Deterministic per-call keys (fold_in on the call counter) so the
    single- and two-process runs draw identical perturbations."""
    import jax.numpy as jnp

    from tpunav.control.mppi import MPPIConfig, init_controls, mppi_solve
    from tpunav.core import diff_drive as dd
    from tpunav.models.cart import CartParams

    cfg = MPPIConfig(horizon=0.3, dt=0.05, rollouts=128,
                     ul_var=4.0, ur_var=4.0)
    cart = CartParams(model_params.wheel_radius, model_params.wheel_base)
    state = {"u": init_controls(cfg), "k": 0}
    solve = jax.jit(lambda u, key, pose, wpt: mppi_solve(
        cfg, cart, u, key, pose, wpt))

    def law(pose_xyt, wpt):
        key = jax.random.fold_in(jax.random.PRNGKey(11), state["k"])
        state["k"] += 1
        wpt3 = jnp.asarray([wpt[0], wpt[1],
                            wpt[2] if len(wpt) > 2 else 0.0], jnp.float32)
        cmd, u = solve(state["u"], key, jnp.asarray(pose_xyt, jnp.float32),
                       wpt3)
        state["u"] = u
        tw = dd.wheels_to_twist(model_params, cmd)
        return np.asarray(tw)

    return law


def _build_robot(params, ch):
    """{plant + turtle_interface + odometer + fake landmark sensor}."""
    from tpunav.runtime.channels import Channel
    from tpunav.runtime.nodes import OdometerNode, TurtleInterfaceNode
    from tpunav.sim.plant import DiffDrivePlant

    wheel_cmd = Channel("wheel_cmd")   # in-process (the serial link)
    sensor = Channel("sensor")
    plant = DiffDrivePlant(params, wheel_cmd, sensor, sensor_rate_hz=60.0)
    ti = TurtleInterfaceNode(params, ch["cmd_vel"], wheel_cmd, sensor,
                             ch["joints"])
    odo = OdometerNode(params, ch["joints"], ch["odom"])

    def cycle(k):
        import jax.numpy as jnp

        from tpunav.sim.landmark_sensor import landmark_measurements

        ti.tick(0.0)       # fresh cmd_vel → wheel_cmd
        plant.tick(0.0)    # advance truth, emit encoder ticks
        ti.tick(0.0)       # fresh sensor → joints
        odo.tick(0.0)      # joints → odom
        meas = landmark_measurements(jnp.asarray(LANDMARKS),
                                     jnp.asarray(plant.pose), VISIBILITY)
        ch["landmarks"].publish(np.asarray(meas))
        return np.asarray(plant.pose).copy()

    return cycle


def _build_laptop(jax, params, ch, waypoints):
    """{EKF SLAM + MPPI driver} (the planner already produced
    ``waypoints``)."""
    from tpunav.estimation.ekf import EKFConfig
    from tpunav.runtime.channels import Channel
    from tpunav.runtime.nodes import WaypointDriverNode
    from tpunav.runtime.slam_nodes import EkfSlamNode

    slam_pose = Channel("slam_pose")
    odom_local = Channel("odom_local")
    ekf_cfg = EKFConfig(num_landmarks=LANDMARKS.shape[0], spd_repair=False,
                        motion_noise=(1e-8, 1e-8, 1e-8),
                        measurement_noise=(1e-6, 1e-6))
    ekf = EkfSlamNode(ekf_cfg, params, ch["joints"], ch["landmarks"],
                      slam_pose, odom_local, known_da=True)
    driver = WaypointDriverNode(slam_pose, ch["cmd_vel"], waypoints,
                                _mppi_law(jax, params), goal_thresh=0.12)
    driver.start()

    def cycle(k):
        ekf.tick(0.0)
        prev = ch["cmd_vel"].seq
        driver.tick(0.0)
        if ch["cmd_vel"].seq == prev:
            # Keep the lockstep clock advancing after course completion.
            ch["cmd_vel"].publish(np.zeros(3))
        p = slam_pose.latest()
        return (np.asarray(p).copy() if p is not None
                else np.zeros(3))

    return cycle


def run_single(cycles=CYCLES):
    """The same graph, in one process, same tick order."""
    jax = _pin_cpu()
    from tpunav.core import diff_drive as dd
    from tpunav.runtime.channels import Channel

    params = dd.DiffDriveParams(wheel_radius=0.033, wheel_base=0.16)
    ch = {n: Channel(n) for n in
          ("cmd_vel", "joints", "landmarks", "odom")}
    waypoints = plan_waypoints(jax)
    robot = _build_robot(params, ch)
    laptop = _build_laptop(jax, params, ch, waypoints)
    truth, slam = [], []
    for k in range(cycles):
        truth.append(robot(k))
        slam.append(laptop(k))
    return np.asarray(truth), np.asarray(slam), waypoints


def _robot_main(port, cycles, out_path):
    jax = _pin_cpu()
    from tpunav.core import diff_drive as dd
    from tpunav.runtime.net import BusClient, wait_for_new

    params = dd.DiffDriveParams(wheel_radius=0.033, wheel_base=0.16)
    client = BusClient("127.0.0.1", port)
    ch = {
        "cmd_vel": client.subscribe("cmd_vel"),
        "joints": client.advertise("joints"),
        "landmarks": client.advertise("landmarks"),
        "odom": client.advertise("odom"),
    }
    robot = _build_robot(params, ch)
    truth = []
    last_cmd = 0
    for k in range(cycles):
        if k > 0:   # lockstep: laptop commanded on the previous frame
            _, last_cmd = wait_for_new(ch["cmd_vel"], last_cmd, timeout=60)
        truth.append(robot(k))
    np.savez(out_path, truth=np.asarray(truth))
    client.close()


def _laptop_main(port, cycles, out_path):
    jax = _pin_cpu()
    from tpunav.core import diff_drive as dd
    from tpunav.runtime.net import BusClient, wait_for_new

    params = dd.DiffDriveParams(wheel_radius=0.033, wheel_base=0.16)
    client = BusClient("127.0.0.1", port)
    ch = {
        "cmd_vel": client.advertise("cmd_vel"),
        "joints": client.subscribe("joints"),
        "landmarks": client.subscribe("landmarks"),
        "odom": client.subscribe("odom"),
    }
    waypoints = plan_waypoints(jax)
    laptop = _build_laptop(jax, params, ch, waypoints)
    slam = []
    last_j = last_m = 0
    t_warm = None
    for k in range(cycles):
        _, last_j = wait_for_new(ch["joints"], last_j, timeout=60)
        _, last_m = wait_for_new(ch["landmarks"], last_m, timeout=60)
        slam.append(laptop(k))
        if k == 0:
            import time
            t_warm = time.perf_counter()   # after compile/first dispatch
    import time
    steady = (cycles - 1) / (time.perf_counter() - t_warm)
    np.savez(out_path, slam=np.asarray(slam), waypoints=waypoints,
             steady_cycles_per_sec=steady)
    client.close()


def run_two_process(out_dir, cycles=CYCLES):
    import multiprocessing as mp
    import time

    from tpunav.runtime.net import BusServer

    srv = BusServer()
    ctx = mp.get_context("spawn")
    robot_out = os.path.join(out_dir, "fs2p_robot.npz")
    laptop_out = os.path.join(out_dir, "fs2p_laptop.npz")
    t0 = time.perf_counter()
    procs = [
        ctx.Process(target=_robot_main, args=(srv.port, cycles, robot_out)),
        ctx.Process(target=_laptop_main, args=(srv.port, cycles,
                                               laptop_out)),
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=600)
        assert p.exitcode == 0, f"worker exit {p.exitcode}"
    wall = time.perf_counter() - t0
    srv.close()
    truth = np.load(robot_out)["truth"]
    lap = np.load(laptop_out)
    return (truth, lap["slam"], lap["waypoints"], wall,
            float(lap["steady_cycles_per_sec"]))


def _robot_free(port, duration, out_path):
    """Free-running robot process: every node on its own wall-clock rate
    (the reference's actual deployment semantics — nodes free-spin at
    ros::Rate, no lockstep)."""
    _pin_cpu()
    import jax.numpy as jnp

    from tpunav.core import diff_drive as dd
    from tpunav.runtime.channels import Node, Scheduler
    from tpunav.runtime.net import BusClient
    from tpunav.sim.landmark_sensor import landmark_measurements

    params = dd.DiffDriveParams(wheel_radius=0.033, wheel_base=0.16)
    client = BusClient("127.0.0.1", port)
    ch = {
        "cmd_vel": client.subscribe("cmd_vel"),
        "joints": client.advertise("joints"),
        "landmarks": client.advertise("landmarks"),
        "odom": client.advertise("odom"),
    }
    from tpunav.runtime.channels import Channel
    from tpunav.runtime.nodes import OdometerNode, TurtleInterfaceNode
    from tpunav.sim.plant import DiffDrivePlant

    wheel_cmd = Channel("wheel_cmd")
    sensor = Channel("sensor")
    plant = DiffDrivePlant(params, wheel_cmd, sensor, sensor_rate_hz=60.0)
    ti = TurtleInterfaceNode(params, ch["cmd_vel"], wheel_cmd, sensor,
                             ch["joints"])
    odo = OdometerNode(params, ch["joints"], ch["odom"])

    def sense(t):
        meas = landmark_measurements(jnp.asarray(LANDMARKS),
                                     jnp.asarray(plant.pose), VISIBILITY)
        ch["landmarks"].publish(np.asarray(meas))

    # Publish one sensor frame so the laptop can boot, then wait for its
    # first command before starting the clock — bringup handshake (the
    # laptop pays its jit compiles before either side's window starts;
    # the reference's nodes similarly idle until topics connect).
    ch["joints"].publish((0.0, 0.0, 0.0, 0.0))
    sense(0.0)
    from tpunav.runtime.net import wait_for_new
    wait_for_new(ch["cmd_vel"], 0, timeout=120)

    sched = Scheduler(realtime=True)
    sched.add(Node("turtle_interface", 60.0, ti.tick))
    sched.add(Node("plant", 60.0, plant.tick))
    sched.add(Node("odometer", 60.0, odo.tick))
    sched.add(Node("landmark_sensor", 10.0, sense))
    sched.run(duration)
    np.savez(out_path, truth=np.asarray(plant.pose),
             joints_seq=ch["joints"].seq, cmd_seq=ch["cmd_vel"].seq)
    client.close()


def _laptop_free(port, duration, out_path):
    """Free-running laptop process: EKF + MPPI driver at 60 Hz each."""
    jax = _pin_cpu()
    from tpunav.core import diff_drive as dd
    from tpunav.runtime.channels import Node, Scheduler
    from tpunav.runtime.net import BusClient, wait_for_new

    params = dd.DiffDriveParams(wheel_radius=0.033, wheel_base=0.16)
    client = BusClient("127.0.0.1", port)
    ch = {
        "cmd_vel": client.advertise("cmd_vel"),
        "joints": client.subscribe("joints"),
        "landmarks": client.subscribe("landmarks"),
        "odom": client.subscribe("odom"),
    }
    waypoints = plan_waypoints(jax)
    laptop = _build_laptop(jax, params, ch, waypoints)
    # Wait for the first sensor frame, run one warm tick (pays the EKF +
    # MPPI jit compiles), and answer the robot's handshake.
    wait_for_new(ch["joints"], 0, timeout=30)
    wait_for_new(ch["landmarks"], 0, timeout=30)
    laptop(0)
    if ch["cmd_vel"].seq == 0:
        ch["cmd_vel"].publish(np.zeros(3))

    n = {"ticks": 1}

    def tick(t):
        laptop(n["ticks"])
        n["ticks"] += 1

    # Live view fed by a NetChannel (the robot's odom topic ACROSS the
    # bus) — the rviz stand-in watching a remote machine's stream, like
    # the reference's laptop rviz in basic_remote.launch.
    from tpunav.runtime.live import LiveViewNode
    view = LiveViewNode(
        os.path.join(os.path.dirname(out_path), "fs2p_live.png"),
        odom_pose=ch["odom"], landmarks_true=LANDMARKS,
        waypoints=waypoints, obstacles=[np.asarray(o) for o in OBSTACLES],
        bounds=(-0.4, 1.6, -0.8, 1.3), title="2-process stack (live)")

    import matplotlib                      # pay the import before the
    matplotlib.use("Agg")                  # clock starts, not mid-run

    sched = Scheduler(realtime=True)
    sched.add(Node("slam+driver", 60.0, tick))
    # 1 Hz: a matplotlib render costs ~0.3-0.5 s on a contended host and
    # the Scheduler is single-threaded (like every reference node) — at
    # 2 Hz the renders crowd out control ticks in short runs.
    sched.add(Node("live_view", 1.0, view.tick))
    sched.run(duration)
    # slam_pose lives inside the laptop closure; re-derive from cmd count.
    np.savez(out_path, ticks=n["ticks"], cmd_seq=ch["cmd_vel"].seq,
             joints_seq=ch["joints"].seq, view_frames=view.frames)
    client.close()


def run_free(out_dir, duration=5.0):
    """Free-running 2-process stack for ``duration`` wall seconds;
    returns achieved rates (the non-lockstep deployment mode — no parity
    assert, liveness + rate report)."""
    import multiprocessing as mp

    from tpunav.runtime.net import BusServer

    srv = BusServer()
    ctx = mp.get_context("spawn")
    robot_out = os.path.join(out_dir, "fs2p_free_robot.npz")
    laptop_out = os.path.join(out_dir, "fs2p_free_laptop.npz")
    procs = [
        ctx.Process(target=_robot_free,
                    args=(srv.port, duration, robot_out)),
        ctx.Process(target=_laptop_free,
                    args=(srv.port, duration, laptop_out)),
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=600)
        assert p.exitcode == 0, f"worker exit {p.exitcode}"
    srv.close()
    rob = np.load(robot_out)
    lap = np.load(laptop_out)
    return {
        "joints_rate": float(rob["joints_seq"]) / duration,
        "cmd_rate": float(rob["cmd_seq"]) / duration,
        "laptop_ticks": int(lap["ticks"]),
        "view_frames": int(lap["view_frames"]),
        "truth": rob["truth"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="examples/out")
    ap.add_argument("--cycles", type=int, default=CYCLES)
    ap.add_argument("--free-run", type=float, default=0.0,
                    help="ALSO run the free-running (wall-clock, "
                         "non-lockstep) mode for N seconds")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    truth2, slam2, wpts, wall, steady = run_two_process(args.out_dir,
                                                        args.cycles)
    truth1, slam1, _ = run_single(args.cycles)
    d_truth = float(np.max(np.abs(truth2 - truth1)))
    d_slam = float(np.max(np.abs(slam2 - slam1)))
    print(f"2-process vs single-process: max |truth diff| = {d_truth:.2e},"
          f" max |slam diff| = {d_slam:.2e}; {args.cycles} cycles, "
          f"{wall:.1f}s wall incl. spawn/compile, steady-state "
          f"{steady:.0f} cycles/s over the bus (lockstep: each cycle = "
          f"2 full cross-process round trips)")
    np.savez(os.path.join(args.out_dir, "fs2p_compare.npz"),
             truth2=truth2, truth1=truth1, slam2=slam2, slam1=slam1,
             waypoints=wpts, wall=wall, steady=steady)
    assert d_truth < 1e-9 and d_slam < 1e-9, "trajectory mismatch"
    print("PASS: identical trajectories across the process boundary")

    if args.free_run > 0:
        fr = run_free(args.out_dir, args.free_run)
        print(f"free-run {args.free_run:.0f}s: joints "
              f"{fr['joints_rate']:.0f}/s (nominal 60), cmd_vel "
              f"{fr['cmd_rate']:.0f}/s, laptop ticks "
              f"{fr['laptop_ticks']}, truth pose "
              f"{np.round(fr['truth'], 3)}")


if __name__ == "__main__":
    main()
