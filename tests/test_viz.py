"""Visualization smoke tests (the rviz-replacement layer, tpunav/viz.py)."""

import numpy as np

from tpunav import viz
from tpunav.estimation.rbpf import GridConfig


def test_compose_and_save(tmp_path):
    cfg = GridConfig(resolution=0.1, xmin=-2, xmax=2, ymin=-2, ymax=2)
    prob = np.random.default_rng(0).random((cfg.height, cfg.width))
    ax = viz.draw_occupancy(cfg, prob)
    viz.draw_landmarks([(0.5, 0.5), (-1.0, 0.2)], radii=[0.1, 0.2], ax=ax,
                       truth=[(0.52, 0.52)])
    viz.draw_world([[(0, 0), (1, 0), (1, 1)]], bounds=[(-2, 2), (-2, 2)],
                   ax=ax)
    t = np.linspace(0, 2 * np.pi, 50)
    viz.draw_path(np.stack([np.cos(t), np.sin(t)], -1), ax=ax,
                  label="path")
    out = viz.save(ax, str(tmp_path / "map.png"), title="test")
    import os
    assert os.path.getsize(out) > 1000


def test_plot_series(tmp_path):
    """The shared per-tick metrics panel every demo streams into."""
    import os

    t = np.linspace(0, 10, 200)
    out = viz.plot_series(
        {"a": np.sin(t), "b": np.cos(t), "n": np.arange(200)},
        [("amp", ["a", "b"]), ("count", ["n"])],
        str(tmp_path / "series.png"), title="test", xlabel="step")
    assert os.path.getsize(out) > 1000


def test_robot_model_matches_xacro_formulas():
    """The link tree reproduces the URDF's derived quantities
    (ref: nuturtle_description/urdf/diff_drive.urdf.xacro:15-69,
    143-180) from the diff_params constants."""
    import numpy as np

    from tpunav.robot_model import (CHASSIS_MASS, WHEEL_MASS,
                                    TURTLEBOT3_MODEL, build_model)

    m = TURTLEBOT3_MODEL
    c = m.config
    # caster_radius = (wheel_radius - wheel_axle_offset)/2 (xacro :15)
    assert np.isclose(m.caster_radius, (0.033 - 0.02) / 2)
    # chassis box inertia izz = M/12 (l^2 + w^2) (xacro :36)
    chassis = m.links["base_body"]
    l, w, t = chassis.size
    assert np.isclose(l, c.chassis_length)
    assert np.isclose(w, c.wheel_base - c.wheel_width)
    assert np.isclose(chassis.inertia_diag[2],
                      CHASSIS_MASS / 12 * (l * l + w * w))
    # wheel cylinder: spin-axis inertia = m r^2 / 2 (xacro :67)
    wheel = m.links["left_wheel"]
    assert np.isclose(wheel.inertia_diag[2],
                      0.5 * WHEEL_MASS * c.wheel_radius ** 2)
    # wheel joint origins mirror the xacro (+-wheel_base/2 in y, :161/:170)
    assert np.isclose(wheel.origin_xyz[1], c.wheel_base / 2)
    assert np.isclose(m.links["right_wheel"].origin_xyz[1],
                      -c.wheel_base / 2)
    # footprint: CCW hexagon bounding the chassis + wheels
    fp = m.footprint()
    assert fp.shape == (6, 2)
    x = fp[:, 0]
    area = 0.5 * np.sum(x * np.roll(fp[:, 1], -1) -
                        np.roll(x, -1) * fp[:, 1])
    assert area > 0, "footprint must be CCW"
    assert np.isclose(x.max() - x.min(), c.chassis_length)
    assert np.isclose(fp[:, 1].max(), (c.wheel_base + c.wheel_width) / 2)
    assert 0.1 < m.bounding_radius() < 0.2

    # A scaled config flows through every derived quantity.
    from tpunav.runtime.config import RobotConfig
    big = build_model(RobotConfig(wheel_radius=0.066, wheel_base=0.32))
    assert np.isclose(big.links["left_wheel"].origin_xyz[1], 0.16)


def test_draw_robot(tmp_path):
    import matplotlib
    matplotlib.use("Agg")

    from tpunav.viz import draw_robot, save

    ax = draw_robot([0.8, 0.5, 0.25])    # [theta, x, y]
    out = save(ax, str(tmp_path / "robot.png"), "robot model")
    import os
    assert os.path.getsize(out) > 0
