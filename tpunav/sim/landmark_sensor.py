"""Simulated landmark sensor: ground-truth cylinders → robot-frame
measurements with visibility gating and optional Gaussian noise.

TPU-native re-design of the reference's fake-sensor ``analysis`` node
(ref: nuslam/src/nuslam/analysis_node.cpp:56-182): it transforms world
landmarks into the robot frame (:106-137), NaNs out landmarks beyond the
visibility radius (:140-166), and optionally corrupts them with Gaussian
noise (:142-151). Pure function — vmappable over particles/robots and
usable inside ``lax.scan`` closed loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def landmark_measurements(landmarks_world, pose, visibility_radius,
                          key: Optional[jax.Array] = None,
                          noise_std: float = 0.0,
                          pose_noise_std: float = 0.0):
    """Return (M, 2) robot-frame landmark positions; NaN rows are outside
    the visibility radius.

    landmarks_world: (M, 2) world coordinates (ref config:
    nuslam/config/block_world_landmarks.yaml).
    pose: (3,) [theta, x, y] ground-truth robot pose.
    pose_noise_std: Gaussian noise added to the robot pose BEFORE the
    world→robot transform, like the reference's fake sensor corrupting
    the gazebo pose (ref: analysis_node.cpp:169-178).
    """
    if key is not None and pose_noise_std > 0.0:
        key, k_pose = jax.random.split(key)
        pose = pose + pose_noise_std * jax.random.normal(
            k_pose, pose.shape, pose.dtype)
    theta, x, y = pose[0], pose[1], pose[2]
    d = landmarks_world - jnp.stack([x, y])
    c, s = jnp.cos(theta), jnp.sin(theta)
    # World → robot frame: R(-theta) @ d.
    local = jnp.stack(
        [c * d[..., 0] + s * d[..., 1], -s * d[..., 0] + c * d[..., 1]],
        axis=-1)
    if key is not None and noise_std > 0.0:
        local = local + noise_std * jax.random.normal(
            key, local.shape, local.dtype)
    dist = jnp.linalg.norm(d, axis=-1)
    visible = dist <= visibility_radius
    return jnp.where(visible[..., None], local, jnp.nan)
