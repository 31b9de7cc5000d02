"""SLAM runtime nodes: EKF landmark SLAM and RBPF grid mapping.

These complete the reference's L4 process graph (SURVEY.md §2.3/§2.4):
channel-driven node classes wrapping the jitted estimation kernels, with
the same wiring the reference nodes use — dual odometry models (a
dead-reckoning one and a filter-input one), the map→odom frame
correction Tmo = Tmr·(Tor)⁻¹, and PoseError against ground truth.

ref: nuslam/src/slam_node.cpp:164-464 (EKF node),
     bmapping/src/turtle_mapping_node.cpp:203-666 (RBPF node).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diff_drive as dd
from ..core import se2
from ..estimation.ekf import (EKFConfig, ekf_init, known_correspondence_slam,
                              landmark_map, robot_pose, slam_unknown_da)
from ..estimation.landmarks import (LandmarkConfig, circles_to_measurements,
                                    feature_detection)
from ..estimation.rbpf import (PFConfig, best_particle, pf_init,
                               pf_slam_step)
from ..estimation.rbpf.grid import occupancy_grid
from .channels import Channel
from .metrics import PoseError


def map_to_odom(slam_pose, odom_pose):
    """Frame correction Tmo = Tmr · (Tor)⁻¹ so that map→odom→base chains
    to the SLAM estimate (ref: slam_node.cpp:306-339). Poses are
    [theta, x, y]; returns the same triple for the map→odom transform."""
    tmr = se2.make(slam_pose[0], slam_pose[1], slam_pose[2])
    tor = se2.make(odom_pose[0], odom_pose[1], odom_pose[2])
    tmo = se2.compose(tmr, se2.inverse(tor))
    xy = se2.translation_of(tmo)
    return jnp.stack([se2.theta_of(tmo), xy[0], xy[1]])


class LandmarksNode:
    """Lidar feature-detection node (ref: nuslam/src/landmarks_node.cpp):
    subscribes a raw range scan, runs the jitted clustering + circle-fit
    pipeline, and publishes the (C, 2) NaN-masked robot-frame measurement
    array (the TurtleMap equivalent) for the EKF node — plus, optionally,
    the full (centers, radii, valid) triple for map drawing
    (ref: nuslam/src/draw_map_node.cpp:59-102).
    """

    def __init__(self, cfg: LandmarkConfig, scan: Channel,
                 landmarks: Channel, turtle_map: Optional[Channel] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.scan = scan
        self.landmarks = landmarks
        self.turtle_map = turtle_map
        self.dtype = dtype
        self._detect = jax.jit(lambda r: feature_detection(cfg, r))
        self._seen_scan = 0

    def tick(self, t: float) -> None:
        ranges, self._seen_scan = self.scan.take_new(self._seen_scan)
        if ranges is None:
            return
        circles = self._detect(jnp.asarray(ranges, self.dtype))
        self.landmarks.publish(np.asarray(circles_to_measurements(circles)))
        if self.turtle_map is not None:
            self.turtle_map.publish((np.asarray(circles.centers),
                                     np.asarray(circles.radii),
                                     np.asarray(circles.valid)))


class EkfSlamNode:
    """EKF landmark-SLAM node (ref: nuslam/src/slam_node.cpp).

    Subscribes wheel joint angles and robot-frame landmark measurements
    (the TurtleMap equivalent: an (M, 2) array, NaN rows invisible);
    maintains TWO odometry models exactly like the reference (:234-236) —
    ``drive`` dead-reckons continuously, ``ekf_drive`` advances only on
    measurement arrival and supplies the filter's control input; publishes
    the SLAM pose, the dead-reckoned odometry pose, the map→odom
    correction, the landmark map estimate, and PoseError vs ground truth
    when a truth channel is wired (:436-463).
    """

    def __init__(self, cfg: EKFConfig, params: dd.DiffDriveParams,
                 joints: Channel, landmarks: Channel,
                 slam_pose: Channel, odom_pose: Channel,
                 map_odom: Optional[Channel] = None,
                 landmark_est: Optional[Channel] = None,
                 truth: Optional[Channel] = None,
                 errors: Optional[Channel] = None,
                 known_da: bool = True, dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.joints = joints
        self.landmarks = landmarks
        self.slam_pose = slam_pose
        self.odom_pose = odom_pose
        self.map_odom = map_odom
        self.landmark_est = landmark_est
        self.truth = truth
        self.errors = errors
        self.drive = dd.init_state(dtype=dtype)       # odometry path
        self.ekf_drive = dd.init_state(dtype=dtype)   # filter input path
        self.ekf = ekf_init(cfg, dtype=dtype)
        step = known_correspondence_slam if known_da else slam_unknown_da
        self._step = jax.jit(
            lambda st, meas, u: step(cfg, st, meas, u))
        self._seen_joints = 0
        self._seen_map = 0

    def tick(self, t: float) -> None:
        msg, self._seen_joints = self.joints.take_new(self._seen_joints)
        if msg is not None:
            left, right = msg[0], msg[1]
            self.drive, _ = dd.update_odometry(self.params, self.drive,
                                               left, right)
            self.odom_pose.publish(np.asarray(dd.pose(self.drive)))

        meas, self._seen_map = self.landmarks.take_new(self._seen_map)
        if meas is None:
            return
        # Advance the filter-input odometry to the latest wheel angles and
        # feed the resulting body twist to the EKF (ref: :282-284).
        left, right = (float(self.drive.left), float(self.drive.right))
        self.ekf_drive, wheel_vel = dd.update_odometry(
            self.params, self.ekf_drive, left, right)
        tw = dd.wheels_to_twist(self.params, wheel_vel)
        u = jnp.stack([tw[0], tw[1]])                 # [w, vx]
        self.ekf = self._step(self.ekf, jnp.asarray(meas), u)

        pose = np.asarray(robot_pose(self.ekf))
        self.slam_pose.publish(pose)
        if self.map_odom is not None:
            odom = dd.pose(self.drive)
            self.map_odom.publish(np.asarray(map_to_odom(pose, odom)))
        if self.landmark_est is not None:
            centers, active = landmark_map(self.cfg, self.ekf)
            self.landmark_est.publish((np.asarray(centers),
                                       np.asarray(active)))
        if self.errors is not None and self.truth is not None \
                and self.truth.latest() is not None:
            self.errors.publish(PoseError.between(pose,
                                                  self.truth.latest()))


class RbpfMappingNode:
    """RBPF FastSLAM grid-mapping node
    (ref: bmapping/src/turtle_mapping_node.cpp:203-666).

    Runs the particle-filter SLAM update whenever a scan AND fresh
    odometry coincide (:456-487); publishes the best-particle pose, its
    occupancy grid, the map→odom correction, and PoseError vs truth.
    """

    def __init__(self, cfg: PFConfig, params: dd.DiffDriveParams,
                 joints: Channel, scan: Channel,
                 slam_pose: Channel, grid_out: Channel,
                 odom_pose: Optional[Channel] = None,
                 map_odom: Optional[Channel] = None,
                 truth: Optional[Channel] = None,
                 errors: Optional[Channel] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.joints = joints
        self.scan = scan
        self.slam_pose = slam_pose
        self.grid_out = grid_out
        self.odom_pose = odom_pose
        self.map_odom = map_odom
        self.truth = truth
        self.errors = errors
        self.dtype = dtype
        self.drive = dd.init_state(dtype=dtype)       # dead-reckoning path
        self.pf_drive = dd.init_state(dtype=dtype)    # filter input path
        self.pf = pf_init(cfg, seed=seed, dtype=dtype)
        self.prev_odom = np.zeros(3, dtype)
        self._step = jax.jit(
            lambda st, ranges, u, cur, prev: pf_slam_step(
                cfg, st, ranges, u, cur, prev))
        self._seen_joints = 0
        self._seen_scan = 0
        self._have_odom = False

    def tick(self, t: float) -> None:
        msg, self._seen_joints = self.joints.take_new(self._seen_joints)
        if msg is not None:
            left, right = msg[0], msg[1]
            self.drive, _ = dd.update_odometry(self.params, self.drive,
                                               left, right)
            self._have_odom = True
            if self.odom_pose is not None:
                self.odom_pose.publish(np.asarray(dd.pose(self.drive)))

        ranges, self._seen_scan = self.scan.take_new(self._seen_scan)
        if ranges is None or not self._have_odom:
            return
        cur_odom = np.asarray(dd.pose(self.drive), self.dtype)
        # Signed body twist over the inter-scan interval: advance a second
        # odometry model (pf_drive) to the latest wheel angles and convert
        # the wrapped wheel deltas, exactly like the reference's
        # pf_drive.updateOdometry → wheelsToTwist
        # (ref: turtle_mapping_node.cpp:469-474). A pose-difference twist
        # would lose the translation sign when reversing and blow up ~2π
        # when the heading wraps across ±π.
        left, right = (float(self.drive.left), float(self.drive.right))
        self.pf_drive, wheel_vel = dd.update_odometry(
            self.params, self.pf_drive, left, right)
        tw = dd.wheels_to_twist(self.params, wheel_vel)
        u = jnp.stack([tw[0], tw[1]])                 # [w, vx]
        self.pf = self._step(self.pf, jnp.asarray(ranges, self.dtype), u,
                             jnp.asarray(cur_odom),
                             jnp.asarray(self.prev_odom))
        self.prev_odom = cur_odom

        pose, grid = best_particle(self.pf)
        pose = np.asarray(pose)
        self.slam_pose.publish(pose)
        self.grid_out.publish(np.asarray(occupancy_grid(self.cfg.grid,
                                                        grid)))
        if self.map_odom is not None:
            self.map_odom.publish(np.asarray(map_to_odom(pose, cur_odom)))
        if self.errors is not None and self.truth is not None \
                and self.truth.latest() is not None:
            self.errors.publish(PoseError.between(pose,
                                                  self.truth.latest()))
