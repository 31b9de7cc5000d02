"""MPPI with the rollout axis K sharded over a device mesh.

This is the project's data-parallel + collective story (SURVEY.md §2.7):
the reference runs K rollouts in a sequential loop on one core
(ref: controller/src/controller/mppi.cpp:81-106); here each device rolls
out K/D trajectories and the per-timestep softmax-weighted control update
is reduced across the mesh with ``pmin``/``psum`` collectives riding ICI.

The math matches :func:`tpunav.control.mppi.mppi_solve` exactly:
- global row-min subtraction (mppi.cpp:112-114) → ``lax.pmin`` over K-shards;
- softmax normalizer and the weighted perturbation sum (mppi.cpp:116-121)
  → one fused ``lax.psum`` of the stacked (denominator, numerator) pair —
  a single latency-bound collective per solve, not one per timestep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..control.mppi import (
    MPPIConfig,
    cost_to_go,
    rollout_losses,
    shift_controls,
)
from ..models.cart import CartParams


def _sharded_body(cfg: MPPIConfig, model: CartParams, axis: str,
                  u, key, pose_xyt, xd):
    """Per-shard computation; runs under shard_map with K split over
    ``axis``. u/key/pose/xd are replicated; noise is generated locally from
    a device-folded key so no (K, N, 2) array ever lives on one chip."""
    idx = jax.lax.axis_index(axis)
    nshards = jax.lax.axis_size(axis)
    k_local = cfg.rollouts // nshards

    sig = jnp.sqrt(jnp.asarray([cfg.ul_var, cfg.ur_var], dtype=u.dtype))
    local_key = jax.random.fold_in(key, idx)
    noise = jax.random.normal(
        local_key, (k_local, cfg.steps, 2), u.dtype) * sig


    loss, _ = rollout_losses(cfg, model, pose_xyt, u[None] + noise, xd)
    j = cost_to_go(loss)                                   # (N, K/D)

    # Global per-timestep min (ref: mppi.cpp:112-114).
    row_min = jax.lax.pmin(jnp.min(j, axis=1), axis)       # (N,)
    w = jnp.exp(-(j - row_min[:, None]) / cfg.lambda_) + 1e-8

    # Fuse numerator (N, 2) and denominator (N, 1) into ONE psum.
    numer = jnp.einsum("nk,knc->nc", w, noise)
    denom = jnp.sum(w, axis=1, keepdims=True)
    reduced = jax.lax.psum(
        jnp.concatenate([numer, denom], axis=1), axis)     # (N, 3)

    u_new = u + reduced[:, :2] / reduced[:, 2:3]
    u_new = jnp.clip(u_new, -cfg.max_wheel_vel, cfg.max_wheel_vel)
    return u_new[0], shift_controls(cfg, u_new)


def mppi_solve_sharded(cfg: MPPIConfig, model: CartParams, mesh: Mesh,
                       axis: str = "k"):
    """Build a jitted sharded solve: (u, key, pose_xyt, xd) → (cmd, u_next).

    ``cfg.rollouts`` must be divisible by the mesh size. All arguments and
    results are replicated; only the rollout working set is sharded.
    """
    if cfg.rollouts % mesh.devices.size != 0:
        raise ValueError(
            f"rollouts={cfg.rollouts} not divisible by mesh size "
            f"{mesh.devices.size}")
    body = partial(_sharded_body, cfg, model, axis)
    # check_vma=False: outputs are replicated by construction (the psum
    # reduces over the only mesh axis), which the varying-manual-axes
    # checker cannot infer statically.
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))
