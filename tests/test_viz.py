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
