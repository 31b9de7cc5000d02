"""Fused Pallas MPPI kernel vs the XLA reference path.

Runs in Pallas interpret mode (CPU CI has no TPU); the external-noise
input bypasses the on-core PRNG so the comparison is deterministic.
The real-chip path is exercised by bench.py and the verify drive.
"""

import jax
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


def test_fused_solve_with_obstacles_matches_xla():
    """In-kernel primitive obstacle cost (BASELINE config 2 fused) vs the
    XLA path with the same analytic segment cost."""
    from tpunav.control.mppi import mppi_solve  # noqa: F401
    from tpunav.control.obstacle_cost import (SegmentCostParams,
                                              make_segment_obstacle_cost,
                                              segments_from_circles)

    cfg = MPPIConfig(horizon=0.25, dt=0.01, rollouts=128)
    params = SegmentCostParams(r_safe=0.1, w_hit=1e6, w_field=1e3,
                               sigma=0.2)
    segs = jnp.concatenate([
        segments_from_circles(jnp.array([[0.5, 0.1]]), jnp.array([0.05])),
        jnp.array([[0.3, -0.4, 0.3, 0.4, 0.0]], jnp.float32),  # wall
    ])
    u = init_controls(cfg)
    pose = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    xd = jnp.asarray([1.0, 0.2, 0.0], jnp.float32)
    noise_kern, noise_flat = _noise_pair(cfg, seed=7)

    cmd_p, u_p = mppi_solve_fused(cfg, MODEL, u, 0, pose, xd,
                                  noise=noise_kern, obstacles=segs,
                                  obs_cfg=params, interpret=True)

    extra = make_segment_obstacle_cost(params, segs)
    loss, _ = rollout_losses(cfg, MODEL, pose, u[None] + noise_flat, xd,
                             extra_cost=extra)
    u_x = update_controls(cfg, u, noise_flat, cost_to_go(loss))
    # Slightly looser than the no-obstacle parity: the obstacle field is
    # steep (w_field/sigma) and the λ=0.01 softmax turns last-ulp f32
    # rollout differences into e^(100Δ) weight ratios near obstacles.
    np.testing.assert_allclose(np.asarray(cmd_p), np.asarray(u_x[0]),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_p),
                               np.asarray(shift_controls(cfg, u_x)),
                               rtol=1e-2, atol=1e-3)


def test_partials_decomposition_matches_full_update():
    """The sharded-fused path's math: per-shard (N,6) partials with LOCAL
    min, rescaled by exp((m_g-m_l)/lambda) and summed across shards, must
    reproduce the single-device softmax update exactly (the combine in
    parallel/mppi_sharded.py:_fused_sharded_body)."""
    import dataclasses

    from tpunav.ops.pallas_mppi import mppi_solve_partials

    cfg = MPPIConfig(horizon=0.15, dt=0.01, rollouts=256)
    half = dataclasses.replace(cfg, rollouts=128)
    u = init_controls(cfg) + jnp.asarray([0.5, -0.2], jnp.float32)
    pose = jnp.asarray([0.05, -0.1, 0.2], jnp.float32)
    xd = jnp.asarray([0.8, 0.4, 0.0], jnp.float32)
    noise_kern, noise_flat = _noise_pair(cfg, seed=11)

    parts = [
        np.asarray(mppi_solve_partials(
            half, MODEL, u, 0, pose, xd,
            noise=noise_kern[:, s:s + 1], interpret=True))
        for s in range(2)
    ]
    m_g = np.minimum(parts[0][:, 0], parts[1][:, 0])
    red = np.zeros((cfg.steps, 5), np.float64)
    for p in parts:
        s = np.exp((m_g - p[:, 0]) / cfg.lambda_)
        red[:, 0] += s * p[:, 1]
        red[:, 1] += s * p[:, 2]
        red[:, 2] += s * p[:, 3]
        red[:, 3] += p[:, 4]
        red[:, 4] += p[:, 5]
    denom = red[:, 0] + 1e-8 * cfg.rollouts
    du = np.stack([(red[:, 1] + 1e-8 * red[:, 3]) / denom,
                   (red[:, 2] + 1e-8 * red[:, 4]) / denom], axis=1)
    u_sharded = np.clip(np.asarray(u) + du, -cfg.max_wheel_vel,
                        cfg.max_wheel_vel)

    loss, _ = rollout_losses(cfg, MODEL, pose, u[None] + noise_flat, xd)
    u_x = update_controls(cfg, u, noise_flat, cost_to_go(loss))
    np.testing.assert_allclose(u_sharded, np.asarray(u_x), rtol=1e-4,
                               atol=1e-5)


def test_rollouts_must_be_lane_multiple():
    cfg = MPPIConfig(rollouts=100)
    with pytest.raises(ValueError):
        mppi_solve_fused(cfg, MODEL, init_controls(cfg), 0,
                         jnp.zeros(3), jnp.zeros(3), interpret=True)


def test_blocked_fused_matches_xla_with_external_noise():
    """mppi_solve_fused_blocked splits K into sequential kernel blocks
    and recombines softmax partials with the sharded path's algebra —
    identical noise through 2 blocks must reproduce the XLA solver
    (the single-chip beyond-VMEM-envelope path)."""
    from tpunav.control import mppi as m
    from tpunav.models.cart import CartParams
    from tpunav.ops.pallas_mppi import mppi_solve_fused_blocked

    model = CartParams(0.033, 0.160)
    cfg = m.MPPIConfig(rollouts=1024, horizon=0.3, dt=0.01)
    blocks = 2
    sub = cfg.rollouts // 128
    u = m.init_controls(cfg)
    pose = jnp.array([0.1, -0.2, 0.3], jnp.float32)
    xd = jnp.array([1.0, 1.0, 0.0], jnp.float32)
    sig = jnp.sqrt(jnp.asarray([cfg.ul_var, cfg.ur_var], jnp.float32))
    noise = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.steps, sub, 128, 2), jnp.float32) * sig

    # Per-block layout: split the rollout-tile axis S across blocks.
    noise_blk = noise.reshape(cfg.steps, blocks, sub // blocks, 128, 2)
    noise_blk = jnp.moveaxis(noise_blk, 1, 0)   # (B, N, S/B, 128, 2)

    cmd_b, u_next_b = mppi_solve_fused_blocked(
        cfg, model, u, 0, pose, xd, blocks, noise=noise_blk,
        interpret=True)

    noise_xla = noise.transpose(1, 2, 0, 3).reshape(cfg.rollouts,
                                                    cfg.steps, 2)
    loss, _ = m.rollout_losses(cfg, model, pose, u[None] + noise_xla, xd)
    j = m.cost_to_go(loss)
    u_new = m.update_controls(cfg, u, noise_xla, j)
    np.testing.assert_allclose(np.asarray(cmd_b), np.asarray(u_new[0]),
                               atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(u_next_b[:-1]),
        np.asarray(m.shift_controls(cfg, u_new)[:-1]), atol=2e-4)


def test_blocked_fused_rejects_misaligned_blocks():
    import pytest

    from tpunav.control import mppi as m
    from tpunav.models.cart import CartParams
    from tpunav.ops.pallas_mppi import mppi_solve_fused_blocked

    cfg = m.MPPIConfig(rollouts=1024, horizon=0.3, dt=0.01)
    with pytest.raises(ValueError):
        mppi_solve_fused_blocked(cfg, CartParams(0.033, 0.16),
                                 m.init_controls(cfg), 0,
                                 jnp.zeros(3), jnp.ones(3), blocks=3)
