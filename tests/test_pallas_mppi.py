"""Fused Pallas MPPI kernel vs the XLA reference path.

Runs in Pallas interpret mode (CPU CI has no TPU); the external-noise
input bypasses the on-core PRNG so the comparison is deterministic.
The real-chip path is exercised by bench.py and the verify drive.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpunav.control.mppi import (
    MPPIConfig,
    cost_to_go,
    init_controls,
    rollout_losses,
    shift_controls,
    update_controls,
)
from tpunav.models.cart import CartParams
from tpunav.ops.pallas_mppi import mppi_solve_fused

MODEL = CartParams(0.033, 0.160)


def _noise_pair(cfg, seed=0):
    """Returns (kernel-layout noise (N,S,128,2), flat noise (K,N,2))."""
    rng = np.random.default_rng(seed)
    sig = np.sqrt([cfg.ul_var, cfg.ur_var]).astype(np.float32)
    flat = rng.standard_normal(
        (cfg.rollouts, cfg.steps, 2)).astype(np.float32) * sig
    kern = flat.reshape(cfg.rollouts // 128, 128, cfg.steps, 2
                        ).transpose(2, 0, 1, 3)
    return jnp.asarray(kern), jnp.asarray(flat)


@pytest.mark.parametrize("k,n", [(128, 10), (256, 25)])
def test_fused_solve_matches_xla(k, n):
    cfg = MPPIConfig(horizon=n * 0.01, dt=0.01, rollouts=k)
    u = init_controls(cfg)
    pose = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    xd = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    noise_kern, noise_flat = _noise_pair(cfg)

    cmd_p, u_p = mppi_solve_fused(cfg, MODEL, u, 0, pose, xd,
                                  noise=noise_kern, interpret=True)

    loss, _ = rollout_losses(cfg, MODEL, pose, u[None] + noise_flat, xd)
    u_x = update_controls(cfg, u, noise_flat, cost_to_go(loss))
    cmd_x, u_next_x = u_x[0], shift_controls(cfg, u_x)

    np.testing.assert_allclose(np.asarray(cmd_p), np.asarray(cmd_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_next_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_solve_nonzero_nominal():
    cfg = MPPIConfig(horizon=0.2, dt=0.01, rollouts=128)
    u = init_controls(cfg) + jnp.asarray([1.5, -0.5], jnp.float32)
    pose = jnp.zeros(3, jnp.float32)
    xd = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)
    noise_kern, noise_flat = _noise_pair(cfg, seed=3)

    cmd_p, u_p = mppi_solve_fused(cfg, MODEL, u, 0, pose, xd,
                                  noise=noise_kern, interpret=True)
    loss, _ = rollout_losses(cfg, MODEL, pose, u[None] + noise_flat, xd)
    u_x = update_controls(cfg, u, noise_flat, cost_to_go(loss))
    np.testing.assert_allclose(np.asarray(cmd_p), np.asarray(u_x[0]),
                               rtol=1e-4, atol=1e-5)


def test_rollouts_must_be_lane_multiple():
    cfg = MPPIConfig(rollouts=100)
    with pytest.raises(ValueError):
        mppi_solve_fused(cfg, MODEL, init_controls(cfg), 0,
                         jnp.zeros(3), jnp.zeros(3), interpret=True)
