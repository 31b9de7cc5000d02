"""Obstacle-avoidance cost fields for MPPI (BASELINE config 2).

The reference controller only tracks waypoints (its LQR loss,
controller/include/controller/mppi.hpp:57-111); obstacle awareness lives
in the global planners. For MPPI-with-obstacles the TPU-native design
evaluates a distance-field cost at EVERY rollout state in the same fused
solve: the planning grid's polygons (or a SLAM occupancy grid) become an
ESDF once, and each of the K×N trajectory points pays

    cost(p) = w_hit·[d(p) ≤ r_safe] · BIG + w_field·exp(−(d(p)−r_safe)/σ)

via a bilinear ESDF lookup — pure gathers + VPU math, so K=10k rollouts
price obstacles with no extra passes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.distance_transform import euclidean_distance_field


@dataclasses.dataclass(frozen=True)
class ObstacleCostConfig:
    xmin: float
    ymin: float
    resolution: float
    r_safe: float = 0.12          # robot bounding radius
    w_hit: float = 1e6            # collision penalty
    w_field: float = 1e3          # decay-field weight
    sigma: float = 0.2            # decay length (meters)


def distance_field_from_labels(labels, resolution: float,
                               max_dist: float = 10.0):
    """ESDF of a planning grid's labels (OBSTACLE==1 cells are seeds;
    inflated cells are handled by r_safe instead)."""
    occ = jnp.asarray(labels) == 1
    return euclidean_distance_field(occ, resolution, max_dist,
                                    dtype=jnp.float32)


def make_obstacle_cost(cfg: ObstacleCostConfig, dist_field):
    """Returns ``cost_fn(xy) -> cost`` for (..., 2) world positions,
    suitable as ``mppi_solve``'s extra running cost."""
    h, w = dist_field.shape

    def cost_fn(xy):
        fx = (xy[..., 0] - cfg.xmin) / cfg.resolution - 0.5
        fy = (xy[..., 1] - cfg.ymin) / cfg.resolution - 0.5
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
        tx = jnp.clip(fx - x0, 0.0, 1.0)
        ty = jnp.clip(fy - y0, 0.0, 1.0)
        d00 = dist_field[y0, x0]
        d01 = dist_field[y0, x0 + 1]
        d10 = dist_field[y0 + 1, x0]
        d11 = dist_field[y0 + 1, x0 + 1]
        d = (d00 * (1 - tx) * (1 - ty) + d01 * tx * (1 - ty) +
             d10 * (1 - tx) * ty + d11 * tx * ty)
        hit = (d <= cfg.r_safe).astype(d.dtype)
        return cfg.w_hit * hit + cfg.w_field * jnp.exp(
            -(d - cfg.r_safe) / cfg.sigma)

    return cost_fn
