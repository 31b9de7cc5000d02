"""Benchmark: MPPI solve throughput at H=50 steps, K=10k rollouts on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ controller sustains 50 solves/s at K=5, N=100
on CPU (ref: controller/README.md:4) ≈ 2,500 rollouts/s (BASELINE.md).
Here K=49,152 rollouts of a 50-step horizon run as ONE fused Pallas kernel
per solve (sampling + RK4 + loss + cost-to-go + softmax update, all in
VMEM — tpunav/ops/pallas_mppi.py); solves are chained in a lax.scan so the
measurement reflects back-to-back device throughput with zero host
round-trips.
"""

import json
import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.control.mppi import MPPIConfig, init_controls
from tpunav.models.cart import CartParams
from tpunav.ops.pallas_mppi import mppi_solve_fused

K = 49_152
N_STEPS = 50
SOLVES_PER_CALL = 20


def main():
    cfg = MPPIConfig(horizon=0.5, dt=0.01, rollouts=K)  # N = 50 steps
    cart = CartParams(0.033, 0.160)
    pose = jnp.zeros(3, jnp.float32)
    xd = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    @jax.jit
    def many_solves(u, seed0):
        def body(carry, i):
            (u,) = carry
            cmd, u = mppi_solve_fused(cfg, cart, u, seed0 + i, pose, xd)
            return (u,), cmd

        (u,), cmds = jax.lax.scan(
            body, (u,), jnp.arange(SOLVES_PER_CALL))
        return u, cmds

    u = init_controls(cfg)

    # Warmup / compile.
    u, cmds = many_solves(u, 0)
    jax.block_until_ready(cmds)

    reps = 5
    t0 = time.perf_counter()
    for r in range(reps):
        u, cmds = many_solves(u, r + 1)
    jax.block_until_ready(cmds)
    dt = time.perf_counter() - t0

    solves_per_s = reps * SOLVES_PER_CALL / dt
    rollouts_per_s = solves_per_s * K
    print(json.dumps({
        "metric": f"mppi_rollouts_per_sec_per_chip (K={K}, H={N_STEPS} steps,"
                  f" {solves_per_s:.1f} solves/s, fused pallas)",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / 2500.0, 2),
    }))


if __name__ == "__main__":
    main()
