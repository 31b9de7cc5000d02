"""End-to-end perception tests: lidar raycast → circle detector → EKF.

The reference's non-debug SLAM chain — landmarks node (scan →
featureDetection → TurtleMap, ref: nuslam/src/landmarks_node.cpp:84-104)
feeding the slam node (ref: nuslam/src/slam_node.cpp:109-123) — closed
with NO ground-truth landmark sensor: every EKF measurement comes from
raycast ranges through the clustering + circle-fit detector. Pass
criterion mirrors the reference README error tables
(nuslam/README.md:24-50): final SLAM pose error far below dead-reckoned
odometry error.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tpunav.estimation.ekf import (EKFConfig, ekf_init,
                                   known_correspondence_slam, robot_pose,
                                   slam_unknown_da)
from tpunav.estimation.ekf import filter as ekff
from tpunav.estimation.landmarks import (LandmarkConfig,
                                         circles_to_measurements,
                                         feature_detection)
from tpunav.runtime.channels import Channel
from tpunav.runtime.slam_nodes import LandmarksNode
from tpunav.sim import associate_known, scan_cylinders

LANDMARKS = jnp.array([
    [0.75, 0.1], [0.95, 0.6], [0.5, 0.8], [0.1, 0.75],
    [-0.4, 0.9], [-0.8, 0.5], [-0.9, 0.0], [-0.7, -0.55],
    [-0.2, -0.8], [0.3, -0.9], [0.8, -0.6], [1.0, -0.1]])
RADII = jnp.full((12,), 0.04)


def _run(slam_step, cfg, known, steps=300, seed=0):
    lm_cfg = LandmarkConfig(max_clusters=16)
    u_true = jnp.asarray([0.03, 0.015])
    bias = jnp.asarray([0.001, 0.0005])

    @jax.jit
    def sim(key):
        def body(carry, _):
            key, true_pose, odom, st = carry
            key, k1 = jax.random.split(key)
            true_pose = ekff.motion_update(
                cfg, jnp.concatenate([true_pose,
                                      jnp.zeros(2 * cfg.num_landmarks)]),
                u_true, jnp.zeros(3))[:3]
            odom = ekff.motion_update(cfg, odom, u_true + bias, jnp.zeros(3))
            ranges = scan_cylinders(true_pose, LANDMARKS, RADII,
                                    key=k1, noise_std=1e-3)
            meas = circles_to_measurements(
                feature_detection(lm_cfg, ranges))
            if known:
                meas = associate_known(meas, LANDMARKS, true_pose)
            st = slam_step(cfg, st, meas, u_true + bias)
            return (key, true_pose, odom, st), None

        init = (key, jnp.zeros(3),
                ekf_init(cfg).state,
                ekf_init(cfg))
        (key, true_pose, odom, st), _ = jax.lax.scan(
            body, init, None, length=steps)
        return true_pose, odom, st

    true_pose, odom, st = jax.block_until_ready(sim(jax.random.PRNGKey(seed)))
    return (np.asarray(robot_pose(st) - true_pose),
            np.asarray(odom[:3] - true_pose), int(st.count))


def test_lidar_to_ekf_known_da():
    cfg = EKFConfig(num_landmarks=12, spd_repair=False,
                    motion_noise=(1e-6, 1e-6, 1e-6),
                    measurement_noise=(1e-5, 1e-5))
    slam_err, odo_err, count = _run(known_correspondence_slam, cfg, True)
    # Reference ballpark (nuslam/README.md:24-34): mm-level position, sub-
    # degree heading, while odometry drifts visibly.
    assert np.linalg.norm(slam_err[1:]) < 0.05
    assert abs(slam_err[0]) < 0.05
    assert np.linalg.norm(slam_err[1:]) < 0.25 * np.linalg.norm(odo_err[1:])
    assert abs(slam_err[0]) < 0.25 * abs(odo_err[0])
    assert count >= 10   # nearly all 12 cylinders found by the detector


def test_lidar_to_ekf_unknown_da_capacity50():
    # BASELINE config 4: unknown DA at 50-landmark capacity.
    cfg = EKFConfig(num_landmarks=50, dmin=5e1, dmax=1e4, spd_repair=False,
                    motion_noise=(1e-5, 1e-5, 1e-5),
                    measurement_noise=(1e-5, 1e-5))
    slam_err, odo_err, count = _run(slam_unknown_da, cfg, False)
    assert np.linalg.norm(slam_err[1:]) < 0.05
    assert abs(slam_err[0]) < 0.05
    assert np.linalg.norm(slam_err[1:]) < 0.25 * np.linalg.norm(odo_err[1:])
    # Gating must neither explode with duplicates nor starve.
    assert 8 <= count <= 16


def test_landmarks_node_channel_chain():
    """LandmarksNode publishes detector output onto the TurtleMap channel
    in the EKF's NaN-masked measurement format."""
    scan_ch, lm_ch, map_ch = Channel("scan"), Channel("lm"), Channel("map")
    node = LandmarksNode(LandmarkConfig(max_clusters=8), scan_ch, lm_ch,
                         turtle_map=map_ch)
    node.tick(0.0)                       # no scan yet → no publish
    assert lm_ch.latest() is None

    pose = jnp.zeros(3)
    centers = jnp.array([[0.6, 0.1], [-0.3, 0.5]])
    radii = jnp.full((2,), 0.04)
    scan_ch.publish(np.asarray(scan_cylinders(pose, centers, radii)))
    node.tick(0.1)

    meas = lm_ch.latest()
    assert meas.shape == (8, 2)
    got = meas[np.all(np.isfinite(meas), axis=-1)]
    assert got.shape[0] == 2
    # Each detection within 1 cm of a true center (robot frame == world
    # frame at the origin pose).
    d = np.linalg.norm(got[:, None, :] - np.asarray(centers)[None], axis=-1)
    assert np.all(d.min(axis=1) < 0.01)
    cx, r, valid = map_ch.latest()
    assert valid.sum() == 2 and np.all(np.abs(r[valid] - 0.04) < 0.01)


def test_dense_world_closed_loop_smoke():
    """Config 4 at scale, shrunk for CI: the 44-cylinder dense world
    driven by MPPI off the FILTER's pose, all measurements through the
    lidar → clustering → circle-fit → unknown-DA chain
    (examples/dense_world_slam_demo.py; full-scale stats in RESULTS.md).
    The filter must track a growing map and beat dead-reckoning."""
    import sys
    sys.path.insert(0, REPO)
    from examples.dense_world_slam_demo import run

    ekf_err, odo_err, n_lm, wall, steps, tel = run(seed=0, steps=600,
                                                   rollouts=256)
    slam_xy = float(np.hypot(ekf_err[1], ekf_err[2]))
    odo_xy = float(np.hypot(odo_err[1], odo_err[2]))
    assert n_lm >= 10, n_lm                 # map is growing
    assert slam_xy < 0.15, slam_xy
    assert slam_xy < 0.5 * odo_xy, (slam_xy, odo_xy)
