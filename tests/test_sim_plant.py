"""Plant + tsim tests: the full hardware-in-the-loop chain
(twist → turtle_interface → integer wheel commands → plant → encoder
ticks → joint states → odometry) and the rectangle-course controllers.
"""

import numpy as np

from tpunav.core import diff_drive as dd
from tpunav.runtime import Channel, Node, Scheduler
from tpunav.runtime.nodes import OdometerNode, TurtleInterfaceNode
from tpunav.sim.plant import DiffDrivePlant
from tpunav.sim.tsim import (
    TurtleRectBangBang,
    TurtleRectConfig,
    TurtleRectFeedForward,
)


def _hw_chain():
    cmd_vel, wheel_cmd, sensor, joints, odom = (
        Channel("cmd"), Channel("wheel"), Channel("sensor"),
        Channel("joints"), Channel("odom"))
    iface = TurtleInterfaceNode(dd.TURTLEBOT3, cmd_vel, wheel_cmd, sensor,
                                joints)
    plant = DiffDrivePlant(dd.TURTLEBOT3, wheel_cmd, sensor)
    odometer = OdometerNode(dd.TURTLEBOT3, joints, odom)
    s = Scheduler()
    s.add(Node("iface", 200.0, iface.tick))
    s.add(Node("plant", 200.0, plant.tick))
    s.add(Node("odometer", 200.0, odometer.tick))
    return cmd_vel, odom, plant, s


def test_hw_chain_straight_line():
    # Command 0.1 m/s straight for 2 s → odometry ≈ plant truth ≈ 0.2 m.
    cmd_vel, odom, plant, s = _hw_chain()
    cmd_vel.publish([0.0, 0.1, 0.0])
    s.run(2.0)
    pose = np.asarray(odom.latest())
    # Integer motor quantization: 0.1 m/s → wheel cmd 126 → actual speed
    # 126/265·6.35495·0.033 ≈ 0.0997 m/s.
    assert abs(pose[1] - 0.2) < 0.01, pose
    assert abs(pose[2]) < 1e-3
    assert np.allclose(pose[1:], plant.pose[1:], atol=5e-3)


def test_hw_chain_rotation():
    # Command 1 rad/s for 1.5 s → heading ≈ 1.5 rad.
    cmd_vel, odom, plant, s = _hw_chain()
    cmd_vel.publish([1.0, 0.0, 0.0])
    s.run(1.5)
    pose = np.asarray(odom.latest())
    assert abs(pose[0] - 1.5) < 0.05, pose
    assert np.hypot(pose[1], pose[2]) < 5e-3


def test_turtle_rect_bang_bang_completes_lap():
    cfg = TurtleRectConfig(x=0.0, y=0.0, width=1.0, height=1.0,
                           trans_vel=0.5, rot_vel=1.0, frequency=100.0)
    pose_ch, cmd_vel = Channel(), Channel()
    ctrl = TurtleRectBangBang(cfg, pose_ch, cmd_vel)

    # Ideal unicycle plant at 100 Hz.
    pose = np.zeros(3)

    def plant_tick(t):
        nonlocal pose
        cmd = cmd_vel.latest()
        if cmd is not None:
            w, vx = float(cmd[0]), float(cmd[1])
            pose = pose + np.asarray(
                [w, vx * np.cos(pose[0]), vx * np.sin(pose[0])]) / 100.0
        pose_ch.publish(pose)

    s = Scheduler()
    s.add(Node("plant", 100.0, plant_tick))
    s.add(Node("ctrl", 100.0, ctrl.tick))
    pose_ch.publish(pose)
    s.run(40.0, until=lambda: ctrl.laps >= 1)
    assert ctrl.laps >= 1, f"no lap completed; pose={pose}, ctr={ctrl.ctr}"


def test_turtle_rect_feedforward_returns_near_start():
    cfg = TurtleRectConfig(x=0.0, y=0.0, width=1.0, height=1.0,
                           trans_vel=0.5, rot_vel=1.0, frequency=200.0)
    cmd_vel = Channel()
    ctrl = TurtleRectFeedForward(cfg, cmd_vel)
    pose = np.zeros(3)

    def plant_tick(t):
        nonlocal pose
        cmd = cmd_vel.latest()
        if cmd is not None:
            w, vx = float(cmd[0]), float(cmd[1])
            pose = pose + np.asarray(
                [w, vx * np.cos(pose[0]), vx * np.sin(pose[0])]) / 200.0
        pass

    s = Scheduler()
    s.add(Node("ctrl", 200.0, ctrl.tick))
    s.add(Node("plant", 200.0, plant_tick))
    s.run(ctrl.lap_time)
    # Open loop: one lap returns near the start (discretization drift ok).
    assert np.hypot(pose[1], pose[2]) < 0.1, pose
    assert abs((pose[0]) % (2 * np.pi)) < 0.15 or \
        abs((pose[0]) % (2 * np.pi) - 2 * np.pi) < 0.15


# ------------------------------------------------------- turtle_way ------

def test_turtle_way_pentagon():
    """Pentagon follower: the internal model completes the cycle and the
    plant tracks it (ref: tsim/src/turtle_way_node.cpp — PoseError stays
    bounded when the plant integrates the same commands)."""
    import numpy as np

    from tpunav.core import diff_drive as dd
    from tpunav.runtime.channels import Channel
    from tpunav.sim.tsim import TurtleWay

    # Pentagon (ref: tsim/config/turtle_way.yaml-style course).
    pts = [(3.0, 2.0), (5.0, 2.5), (5.5, 4.0), (4.0, 5.0), (2.5, 4.0)]
    pose_ch, cmd_ch = Channel("pose"), Channel("cmd_vel")
    tw = TurtleWay(pts, rot_vel=1.0, trans_vel=1.5, frequency=60.0,
                   pose_in=pose_ch, cmd_vel=cmd_ch)

    # The "plant" integrates the published commands with the same model.
    plant = dd.init_state(0.0, pts[0][0], pts[0][1])
    seen = 0
    for i in range(12000):
        tw.tick(i / 60.0)
        cmd, seen = cmd_ch.take_new(seen)
        if cmd is not None:
            import jax.numpy as jnp
            plant = dd.feedforward(dd.TURTLEBOT3, plant,
                                   jnp.asarray(cmd) * (1.0 / 60.0))
        pose_ch.publish(np.asarray(dd.pose(plant)))
        if tw.done:
            break
    assert tw.done, "pentagon cycle incomplete"
    s = tw.metrics.summary()
    # Model and plant integrate identical commands → tiny drift.
    assert s["x_error"]["p99"] < 0.05 and s["y_error"]["p99"] < 0.05


def test_plant_motor_dynamics_ramp():
    """With motor dynamics enabled the plant's wheel speed ramps instead
    of stepping; the vehicle still converges to the commanded speed."""
    from tpunav.runtime.nodes import TurtleInterfaceNode
    from tpunav.sim.motor import MotorParams

    cmd_vel, wheel_cmd, sensor, joints, odom = (
        Channel("cmd"), Channel("wheel"), Channel("sensor"),
        Channel("joints"), Channel("odom"))
    iface = TurtleInterfaceNode(dd.TURTLEBOT3, cmd_vel, wheel_cmd, sensor,
                                joints)
    plant = DiffDrivePlant(dd.TURTLEBOT3, wheel_cmd, sensor,
                           motor=MotorParams(time_const=0.1))
    odometer = OdometerNode(dd.TURTLEBOT3, joints, odom)
    s = Scheduler()
    s.add(Node("iface", 200.0, iface.tick))
    s.add(Node("plant", 200.0, plant.tick))
    s.add(Node("odometer", 200.0, odometer.tick))

    cmd_vel.publish([0.0, 0.1, 0.0])
    s.run(0.05)                       # ~half a time constant in
    v_early = plant._wl
    s.run(1.0)                        # settled
    v_late = plant._wl
    assert 0.0 < v_early < 0.8 * v_late   # ramping, not stepping
    # Settled wheel speed matches the ideal plant's (integer-quantized)
    # to the exponential-tail tolerance (~e^{-10} of the step remains).
    assert abs(v_late - plant._ul) < 1e-3
