"""Is pf_slam_step slower inside lax.scan than dispatched? Slope probe:
time fused scans of M = 1, 2, 4, 8 updates; the slope is the true
per-update cost, the intercept is dispatch+sync overhead."""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.estimation.rbpf import GridConfig, PFConfig, pf_init, pf_slam_step
from tpunav.estimation.rbpf.icp import ICPConfig
from tpunav.sim.lidar import box_segments, scan_segments


def main(p=500):
    grid = GridConfig()
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

    def make(updates):
        @jax.jit
        def run(st, pose0):
            def body(carry, i):
                st, true_pose, prev_odom = carry
                new_pose = true_step(true_pose)
                key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                scan = scan_segments(new_pose, segs,
                                     num_beams=grid.num_beams,
                                     max_range=grid.range_max, key=key,
                                     noise_std=0.002)
                st = pf_slam_step(cfg, st, scan, u, new_pose, prev_odom)
                return (st, new_pose, new_pose), None
            (st, _, _), _ = jax.lax.scan(body, (st, pose0, pose0),
                                         jnp.arange(updates))
            return st
        return run

    pose0 = jnp.zeros(3, jnp.float32)
    times = {}
    for m in (1, 2, 4, 8):
        run = make(m)
        jax.block_until_ready(run(pf_init(cfg, seed=0), pose0).poses)
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(run(pf_init(cfg, seed=0), pose0).poses)
        times[m] = (time.time() - t0) / 3
        print(f"M={m}: {times[m] * 1e3:8.1f} ms total, "
              f"{times[m] / m * 1e3:7.1f} ms/update", flush=True)
    slope = (times[8] - times[1]) / 7
    print(f"slope (true per-update): {slope * 1e3:.1f} ms; "
          f"intercept: {(times[1] - slope) * 1e3:.1f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
