"""The shipped configs/ files load into the typed configs and carry the
reference's canonical values (SURVEY.md §5 config system; schemas match
the reference yaml files key-for-key so its configs port verbatim)."""

import os

import numpy as np

from tpunav.runtime.config import (
    load_landmarks,
    load_lidar_config,
    load_mppi_config,
    load_robot_config,
    load_waypoints,
    load_world,
    load_yaml_config,
)

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _p(name):
    return os.path.join(CONFIGS, name)


def test_robot_config_canonical_constants():
    # ref: nuturtle_description/config/diff_params.yaml:1-28
    rc = load_robot_config(_p("diff_params.yaml"))
    assert rc.wheel_radius == 0.033
    assert rc.wheel_base == 0.160
    assert rc.encoder_ticks_per_rev == 4096
    assert rc.max_trans == 0.22
    assert rc.max_rot == 2.84
    assert rc.max_rot_motor == 6.35495
    assert rc.max_motor_power == 265
    dd = rc.diff_drive
    assert float(dd.wheel_radius) == 0.033
    assert float(dd.wheel_base) == 0.160


def test_mppi_config_reference_keys_port():
    # ref: controller/config/mppi_params.yaml:1-26 (keys lambda,
    # time_step, Q/R/P1, ul_init/ur_init all remap).
    cfg = load_mppi_config(_p("mppi_params.yaml"))
    assert cfg.lambda_ == 0.01
    assert cfg.ul_var == 0.9 and cfg.ur_var == 0.9
    assert cfg.horizon == 1.0 and cfg.dt == 0.01
    assert cfg.steps == 100
    assert cfg.rollouts == 5
    assert tuple(cfg.q_diag) == (10000.0, 10000.0, 1.0)
    assert tuple(cfg.r_diag) == (0.1, 0.1)
    assert tuple(cfg.p1_diag) == (1000.0, 1000.0, 1000.0)
    assert cfg.u_init == (0.0, 0.0)
    # Overrides win, like per-node <param> tags.
    assert load_mppi_config(_p("mppi_params.yaml"), rollouts=1024).rollouts \
        == 1024


def test_lidar_config():
    # ref: bmapping/config/LDS_01_lidar.yaml:1-11
    lc = load_lidar_config(_p("lds01_lidar.yaml"))
    assert lc.num_beams == 360
    assert np.isclose(lc.beam_delta_rad, np.pi / 180.0)
    assert lc.range_min == 0.12 and lc.range_max == 3.5


def test_waypoints_pentagon():
    # ref: nuturtle_robot/config/real_waypoints.yaml:1-8
    wp = load_waypoints(_p("real_waypoints.yaml"))
    assert wp.shape == (5, 3)
    assert np.allclose(wp[:, 0], [0, 1, 1, 0.5, 0])
    assert np.allclose(wp[:, 1], [0, 0, 1, 2, 1])


def test_landmarks_block_world():
    # ref: nuslam/config/block_world_landmarks.yaml:1-7
    centers, ids = load_landmarks(_p("block_world_landmarks.yaml"))
    assert centers.shape == (12, 2)
    assert list(ids) == list(range(12))
    assert np.isclose(centers[0, 0], -0.81738)


def test_world_map_boundaries():
    # ref: planner/config/map_boundaries.yaml:1-22 at the launch files'
    # 0.1 coordinate scale → a 3.4 x 4.8 m world, 11 polygons/41 verts.
    world = load_world(_p("map_boundaries.yaml"), scale=0.1)
    assert world.polygons.shape[0] == 11
    assert int(world.n_vertices.sum()) == 41
    assert np.allclose(world.bounds, [[0.0, 3.4], [0.0, 4.8]])
    assert np.isclose(world.resolution, 0.01)


def test_turtle_rect_config_from_yaml():
    # ref: tsim/config/turtle_params.yaml:1-15
    from tpunav.sim.tsim import TurtleRectConfig

    cfg = load_yaml_config(TurtleRectConfig, _p("turtle_params.yaml"))
    assert (cfg.x, cfg.y, cfg.width, cfg.height) == (3.0, 2.0, 4.0, 5.0)
    assert cfg.trans_vel == 2.0 and cfg.rot_vel == 1.0
    assert cfg.frequency == 100.0
