"""Device-mesh construction helpers.

Replaces the reference's multi-machine roslaunch scale-out
(ref: nuturtle_robot/launch/basic_remote.launch:1-40 — ssh + ROS master)
with a ``jax.sharding.Mesh``: the rollout axis of MPPI and the particle
axis of the RBPF shard across chips over ICI, and ``jax.distributed``
handles multi-host (DCN) initialization.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def rollout_mesh(devices=None, axis_name: str = "k") -> Mesh:
    """1-D mesh over all (or given) devices for data-parallel rollouts
    (SURVEY.md §2.7: DP over the K rollout axis / P particle axis)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))
