"""Component-level RBPF timing on the real chip: where does a 500-particle
pf_slam_step spend its time? (VERDICT r1 item 2: profile EDT vs ICP.)"""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.estimation.rbpf import GridConfig, PFConfig, pf_init, pf_slam_step
from tpunav.estimation.rbpf.grid import esdf, integrate_scan, likelihood_field_log
from tpunav.estimation.rbpf.icp import ICPConfig, icp_match, scan_to_points
from tpunav.sim.lidar import box_segments, scan_segments


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps, out


def main(p=500):
    grid = GridConfig()
    cfg = PFConfig(num_particles=p, k_samples=50,
                   sample_range=(1e-6, 1e-5, 1e-5),
                   motion_noise=(1e-6, 1e-5, 1e-5),
                   grid=grid, icp=ICPConfig(max_iter=25))
    segs = box_segments(-1.8, -1.8, 1.8, 1.8, jnp.float32)
    pose = jnp.array([0.1, 0.2, 0.1], jnp.float32)
    scan = scan_segments(pose, segs, num_beams=grid.num_beams,
                         max_range=grid.range_max,
                         key=jax.random.PRNGKey(0), noise_std=0.002)
    st = pf_init(cfg, seed=0)
    u = jnp.array([0.03, 0.02], jnp.float32)

    # Full step.
    step = jax.jit(lambda s: pf_slam_step(cfg, s, scan, u, pose,
                                          jnp.zeros(3, jnp.float32)))
    dt_full, st2 = timeit(step, st)
    print(f"P={p}: full pf_slam_step        {dt_full * 1e3:8.2f} ms")

    # ESDF over all particles.
    f_esdf = jax.jit(lambda g: jax.vmap(lambda x: esdf(grid, x))(g))
    dt, _ = timeit(f_esdf, st2.grids)
    print(f"P={p}: esdf (all particles)     {dt * 1e3:8.2f} ms")

    # integrate_scan over all particles.
    f_int = jax.jit(lambda g, ps: jax.vmap(
        lambda x, q: integrate_scan(grid, x, scan, q))(g, ps))
    dt, _ = timeit(f_int, st2.grids, st2.poses)
    print(f"P={p}: integrate_scan           {dt * 1e3:8.2f} ms")

    # likelihood field over P*k samples.
    k = cfg.k_samples
    samples = jnp.broadcast_to(pose, (p, k, 3))
    f_lik = jax.jit(lambda d, s: jax.vmap(jax.vmap(
        lambda si, di: likelihood_field_log(grid, di, scan, si),
        in_axes=(0, None)))(s, d))
    dt, _ = timeit(f_lik, st2.dists, samples)
    print(f"P={p}: likelihood (P*k={p * k})  {dt * 1e3:8.2f} ms")

    # ICP (once per step, not per particle).
    src, src_ok = scan_to_points(scan, grid.range_min, grid.range_max,
                                 grid.beam_min, grid.beam_delta)
    f_icp = jax.jit(lambda a, b: icp_match(cfg.icp, a, src_ok, b, src_ok,
                                           jnp.zeros(3, jnp.float32)))
    dt, _ = timeit(f_icp, src, src)
    print(f"P={p}: icp_match (1x)           {dt * 1e3:8.2f} ms")

    print(f"P={p}: updates/s = {1.0 / dt_full:.2f}, "
          f"particle-ESDF rebuilds/s = {p / dt_full:.1f}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main(40)
    main(500)
