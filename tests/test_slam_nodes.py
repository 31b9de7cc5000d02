"""L4 SLAM node graph tests (ref: nuslam/src/slam_node.cpp,
bmapping/src/turtle_mapping_node.cpp): the estimation kernels wired as
channel-driven runtime nodes, closed-loop against the simulated plant."""

import jax.numpy as jnp
import numpy as np

from tpunav.core import diff_drive as dd
from tpunav.core import se2
from tpunav.estimation.ekf import EKFConfig
from tpunav.estimation.rbpf import GridConfig, PFConfig
from tpunav.estimation.rbpf.icp import ICPConfig
from tpunav.runtime import Channel, Node, Scheduler
from tpunav.runtime.nodes import FakeDiffEncodersNode
from tpunav.runtime.slam_nodes import (EkfSlamNode, RbpfMappingNode,
                                       map_to_odom)
from tpunav.sim import landmark_measurements
from tpunav.sim.lidar import box_segments, scan_segments

LANDMARKS = jnp.array([[0.6, 0.1], [0.4, 0.5], [-0.2, 0.6], [-0.5, -0.1],
                       [0.0, -0.6], [0.5, -0.4]])


def test_map_to_odom_composition():
    """Tmo must satisfy Tmo·Tor = Tmr (ref: slam_node.cpp:306-339)."""
    slam_pose = jnp.asarray([0.3, 1.0, -0.5])
    odom_pose = jnp.asarray([-0.2, 0.8, -0.4])
    tmo = map_to_odom(slam_pose, odom_pose)
    T = se2.compose(se2.make(tmo[0], tmo[1], tmo[2]),
                    se2.make(odom_pose[0], odom_pose[1], odom_pose[2]))
    xy = se2.translation_of(T)
    np.testing.assert_allclose(
        [float(se2.theta_of(T)), float(xy[0]), float(xy[1])],
        np.asarray(slam_pose), atol=1e-6)


def _run_ekf_graph(known_da: bool):
    cmd_vel, joints, lm = Channel(), Channel(), Channel()
    slam_pose, odom_pose, map_odom = Channel(), Channel(), Channel()
    lm_est, truth, errors = Channel(), Channel(), Channel()

    encoders = FakeDiffEncodersNode(dd.TURTLEBOT3, cmd_vel, joints,
                                    rate_hz=60.0)
    cfg = EKFConfig(num_landmarks=8)
    node = EkfSlamNode(cfg, dd.TURTLEBOT3, joints, lm, slam_pose,
                       odom_pose, map_odom=map_odom, landmark_est=lm_est,
                       truth=truth, errors=errors, known_da=known_da,
                       dtype=jnp.float64)

    def sensor_tick(t):
        pose = dd.pose(encoders.state)
        truth.publish(np.asarray(pose))
        lm.publish(np.asarray(
            landmark_measurements(LANDMARKS, pose, 2.0)))

    s = Scheduler()
    s.add(Node("cmd", 60.0, lambda t: cmd_vel.publish(
        np.asarray([0.3, 0.08, 0.0]))))
    s.add(Node("encoders", 60.0, encoders.tick))
    s.add(Node("sensor", 10.0, sensor_tick))
    s.add(Node("slam", 10.0, node.tick))
    s.run(6.0)
    return node, slam_pose, map_odom, lm_est, truth, errors, odom_pose


def test_ekf_slam_node_known_da_tracks_truth():
    node, slam_pose, map_odom, lm_est, truth, errors, odom_pose = \
        _run_ekf_graph(known_da=True)
    est = np.asarray(slam_pose.latest())
    tru = np.asarray(truth.latest())
    assert np.hypot(est[1] - tru[1], est[2] - tru[2]) < 0.05
    # Noise-free odometry input: dead-reckoning should agree too.
    odo = np.asarray(odom_pose.latest())
    assert np.hypot(odo[1] - tru[1], odo[2] - tru[2]) < 0.05

    # map→odom correction published and consistent.
    tmo = np.asarray(map_odom.latest())
    T = se2.compose(se2.make(*[float(v) for v in tmo]),
                    se2.make(odo[0], odo[1], odo[2]))
    xy = se2.translation_of(T)
    np.testing.assert_allclose([float(xy[0]), float(xy[1])],
                               [est[1], est[2]], atol=1e-5)

    centers, active = lm_est.latest()
    assert active.sum() >= 4      # visibility radius covers most landmarks
    # Known DA: slot i IS landmark i; capacity slots beyond M stay inactive.
    m = len(LANDMARKS)
    assert not active[m:].any()
    sel = np.asarray(active[:m])
    err = np.linalg.norm(centers[:m][sel] - np.asarray(LANDMARKS)[sel],
                         axis=1)
    assert err.max() < 0.05

    pe = errors.latest()
    assert abs(pe.x_error) < 0.05 and abs(pe.y_error) < 0.05


def test_ekf_slam_node_unknown_da():
    node, slam_pose, _, lm_est, truth, _, _ = _run_ekf_graph(known_da=False)
    est = np.asarray(slam_pose.latest())
    tru = np.asarray(truth.latest())
    assert np.hypot(est[1] - tru[1], est[2] - tru[2]) < 0.1
    _, active = lm_est.latest()
    assert active.sum() >= 1      # Mahalanobis gating added landmarks


def test_rbpf_mapping_node_builds_map():
    grid = GridConfig(resolution=0.1, xmin=-1.5, xmax=1.5, ymin=-1.5,
                      ymax=1.5, num_beams=60, beam_delta=2 * np.pi / 60,
                      range_max=3.0)
    cfg = PFConfig(num_particles=4, k_samples=8,
                   motion_noise=(1e-6, 1e-5, 1e-5),
                   sample_range=(1e-6, 1e-5, 1e-5),
                   grid=grid, icp=ICPConfig(max_iter=8))
    segs = box_segments(-1.2, -1.2, 1.2, 1.2, jnp.float32)

    cmd_vel, joints, scan = Channel(), Channel(), Channel()
    slam_pose, grid_out, map_odom, truth = (Channel(), Channel(),
                                            Channel(), Channel())
    encoders = FakeDiffEncodersNode(dd.TURTLEBOT3, cmd_vel, joints,
                                    rate_hz=30.0)
    node = RbpfMappingNode(cfg, dd.TURTLEBOT3, joints, scan, slam_pose,
                           grid_out, map_odom=map_odom, truth=truth,
                           seed=3)

    tick_n = [0]

    def scan_tick(t):
        pose = dd.pose(encoders.state)
        truth.publish(np.asarray(pose))
        scan.publish(np.asarray(scan_segments(
            jnp.asarray(pose, jnp.float32), segs, num_beams=grid.num_beams,
            max_range=grid.range_max)))
        tick_n[0] += 1

    s = Scheduler()
    s.add(Node("cmd", 30.0, lambda t: cmd_vel.publish(
        np.asarray([0.2, 0.06, 0.0]))))
    s.add(Node("encoders", 30.0, encoders.tick))
    s.add(Node("scan", 4.0, scan_tick))
    s.add(Node("slam", 4.0, node.tick))
    s.run(1.5)

    est = np.asarray(slam_pose.latest())
    tru = np.asarray(truth.latest())
    assert np.all(np.isfinite(est))
    assert np.hypot(est[1] - tru[1], est[2] - tru[2]) < 0.3

    omap = grid_out.latest()
    assert omap.shape == (grid.height, grid.width)
    assert (omap == 100).sum() > 0        # walls observed as occupied
    assert (omap == 0).sum() > 0          # interior carved free
    assert map_odom.latest() is not None


def test_rbpf_mapping_node_reverse_drive():
    """Driving BACKWARDS must propagate the particles backwards: the node
    feeds the filter a signed body twist from wheel deltas, not an
    unsigned pose-difference norm (ref: turtle_mapping_node.cpp:469-474
    derives vb from pf_drive.updateOdometry). Regression for the round-1
    bug where u = [dθ, hypot(dx,dy)] lost the translation sign."""
    grid = GridConfig(resolution=0.1, xmin=-1.5, xmax=1.5, ymin=-1.5,
                      ymax=1.5, num_beams=60, beam_delta=2 * np.pi / 60,
                      range_max=3.0)
    cfg = PFConfig(num_particles=4, k_samples=8,
                   motion_noise=(1e-8, 1e-8, 1e-8),
                   sample_range=(1e-8, 1e-8, 1e-8),
                   grid=grid, icp=ICPConfig(max_iter=8))
    segs = box_segments(-1.2, -1.2, 1.2, 1.2, jnp.float32)

    cmd_vel, joints, scan = Channel(), Channel(), Channel()
    slam_pose, grid_out = Channel(), Channel()
    encoders = FakeDiffEncodersNode(dd.TURTLEBOT3, cmd_vel, joints,
                                    rate_hz=30.0)
    node = RbpfMappingNode(cfg, dd.TURTLEBOT3, joints, scan, slam_pose,
                           grid_out, seed=3)

    def scan_tick(t):
        pose = dd.pose(encoders.state)
        scan.publish(np.asarray(scan_segments(
            jnp.asarray(pose, jnp.float32), segs,
            num_beams=grid.num_beams, max_range=grid.range_max)))

    # Reverse at -0.08 m/s; the FIRST filter update (no previous scan)
    # always takes the motion-model fallback branch, which consumes u.
    s = Scheduler()
    s.add(Node("cmd", 30.0, lambda t: cmd_vel.publish(
        np.asarray([0.0, -0.08, 0.0]))))
    s.add(Node("encoders", 30.0, encoders.tick))
    s.add(Node("scan", 2.0, scan_tick))
    s.add(Node("slam", 2.0, node.tick))
    s.run(1.2)

    tru = np.asarray(dd.pose(encoders.state))
    est = np.asarray(slam_pose.latest())
    assert tru[1] < -0.05                 # robot really went backwards
    assert est[1] < -0.02                 # ...and so did the estimate
    assert abs(est[1] - tru[1]) < 0.1
