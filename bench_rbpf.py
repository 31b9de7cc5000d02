"""RBPF grid-SLAM benchmark: pf_slam_step throughput at BASELINE scale.

BASELINE config 5 is 500 particles (the reference runs 40 on CPU at scan
rate, bmapping/launch/slam.launch:19-46 — its hottest loop is the
per-particle full-ESDF rebuild after every scan,
bmapping/src/bmapping/grid_mapper.cpp:333-435). Here every stage is
particle-batched on one chip and the whole measured window is a single
fused lax.scan (no per-update dispatch).

Prints one JSON line like bench.py. vs_baseline is against the
reference's CPU budget of 40 particles x 5 Hz scan rate = 200
particle-updates/s (LDS-01 spins at 5 Hz; the reference must finish all
40 particle updates, incl. 40 FMM ESDF rebuilds, within one scan period
to keep up, which its README run does).
"""

import json
import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.estimation.rbpf import GridConfig, PFConfig, pf_init, pf_slam_step
from tpunav.estimation.rbpf.icp import ICPConfig
from tpunav.runtime.profiling import SolveProfiler
from tpunav.sim.lidar import box_segments, scan_segments

REF_PARTICLE_UPDATES_PER_SEC = 40 * 5.0


def bench(p=500, updates=30):
    grid = GridConfig()                      # 4x4 m @ 0.05, 360 beams
    cfg = PFConfig(num_particles=p, k_samples=50,
                   sample_range=(1e-6, 1e-5, 1e-5),
                   motion_noise=(1e-6, 1e-5, 1e-5),
                   grid=grid, icp=ICPConfig(max_iter=25))
    segs = box_segments(-1.8, -1.8, 1.8, 1.8, jnp.float32)
    u = jnp.array([0.03, 0.02], jnp.float32)

    def true_step(pose):
        th = pose[0] + u[0]
        return jnp.stack([th, pose[1] + u[1] * jnp.cos(th),
                          pose[2] + u[1] * jnp.sin(th)])

    @jax.jit
    def run(st, pose0):
        def body(carry, i):
            st, true_pose, prev_odom = carry
            new_pose = true_step(true_pose)
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            scan = scan_segments(new_pose, segs, num_beams=grid.num_beams,
                                 max_range=grid.range_max, key=key,
                                 noise_std=0.002)
            st = pf_slam_step(cfg, st, scan, u, new_pose, prev_odom)
            return (st, new_pose, new_pose), None

        (st, _, _), _ = jax.lax.scan(body, (st, pose0, pose0),
                                     jnp.arange(updates))
        return st

    st = pf_init(cfg, seed=0)
    pose0 = jnp.zeros(3, jnp.float32)
    jax.block_until_ready(run(st, pose0).poses)      # compile + warm
    prof = SolveProfiler(run, name=f"rbpf_p{p}")
    prof(pf_init(cfg, seed=0), pose0)
    prof(pf_init(cfg, seed=0), pose0)
    wall = prof.summary()["mean"] / 1e3              # ms → s per window
    return updates / wall, p


def main():
    print("devices:", jax.devices(), flush=True)
    for p in (40, 500):
        rate, _ = bench(p)
        particle_rate = rate * p
        out = {
            "metric": f"rbpf_slam_updates_per_sec (P={p} particles, "
                      f"80x80 map, 360 beams, k=50, fused scan)",
            "value": round(rate, 2),
            "unit": "updates/s",
            "vs_baseline": round(
                particle_rate / REF_PARTICLE_UPDATES_PER_SEC, 2),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
