"""Stage-by-stage cost decomposition of the RBPF SLAM update on the TPU.

The one profiling probe kept from the round-2/3 optimization work
(consolidating seven scratch scripts): times each stage of
``pf_slam_step`` at BASELINE scale (P=500, k=50, 360 beams, 80×80 maps)
with pipelined dispatch (this environment's TPU tunnel adds ~24 ms per
blocking call — async-dispatch N reps and block once, or you measure the
tunnel).

Round-3 reference numbers on a v5e chip (for regression eyeballing):

    likelihood kernel P*K              ~6 ms   (XLA gather was 130 ms)
    map update kernel (integrate+EDT) ~20 ms   (XLA pair was ~110 ms)
    icp (25 iters)                     ~3 ms
    pose_lik P*K                       ~3 ms
    gauss fit+draw                     ~3 ms
    resample gather                    ~3 ms
    FULL pf step                      ~27 ms pipelined / ~23 ms chained
"""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.estimation.rbpf import GridConfig, PFConfig, pf_init, pf_slam_step
from tpunav.estimation.rbpf.icp import ICPConfig, icp_match, scan_to_points
from tpunav.estimation.rbpf.particle_filter import (
    _draw_samples,
    _gaussian_from_samples,
    _low_variance_resample,
    pose_likelihood_odom,
)
from tpunav.ops.pallas_likelihood import likelihood_field_batch
from tpunav.ops.pallas_map_update import map_update_batch
from tpunav.sim.lidar import box_segments, scan_segments

P, K = 500, 50


def timeit(label, fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]   # async; one terminal block
    jax.block_until_ready(outs[-1])
    print(f"{label:32s} {(time.time() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    grid = GridConfig()
    cfg = PFConfig(num_particles=P, k_samples=K,
                   sample_range=(1e-6, 1e-5, 1e-5),
                   motion_noise=(1e-6, 1e-5, 1e-5),
                   grid=grid, icp=ICPConfig(max_iter=25))
    segs = box_segments(-1.8, -1.8, 1.8, 1.8, jnp.float32)
    u = jnp.array([0.03, 0.02], jnp.float32)
    pose = jnp.array([0.06, 0.04, 0.01], jnp.float32)
    prev = jnp.zeros(3, jnp.float32)
    scan = scan_segments(pose, segs, num_beams=grid.num_beams,
                         max_range=grid.range_max,
                         key=jax.random.PRNGKey(0), noise_std=0.002)

    step = jax.jit(lambda s: pf_slam_step(cfg, s, scan, u, pose, prev,
                                          backend="pallas"))
    st = jax.block_until_ready(step(pf_init(cfg, seed=0)))
    st = jax.block_until_ready(step(st))      # warm maps

    samples = st.poses[:, None, :] + jax.random.normal(
        jax.random.PRNGKey(9), (P, K, 3), jnp.float32) * 0.003

    lik = jax.jit(lambda d, s: likelihood_field_batch(
        grid, d, scan, s, backend="pallas"))
    timeit("likelihood kernel P*K", lik, st.dists, samples)

    timeit("map update kernel",
           jax.jit(lambda g, ps: map_update_batch(grid, g, scan, ps)),
           st.grids, st.poses)

    timeit("icp (25 iters)",
           jax.jit(lambda a, b: icp_match(
               cfg.icp,
               *scan_to_points(a, grid.range_min, grid.range_max,
                               grid.beam_min, grid.beam_delta),
               *scan_to_points(b, grid.range_min, grid.range_max,
                               grid.beam_min, grid.beam_delta),
               jnp.zeros(3, jnp.float32))),
           scan, st.prev_scan)

    timeit("pose_lik P*K",
           jax.jit(lambda s, p: jax.vmap(jax.vmap(
               lambda si, pi: pose_likelihood_odom(cfg, si, pi, pose,
                                                   prev),
               in_axes=(0, None)))(s, p)),
           samples, st.poses)

    lp = lik(st.dists, samples)
    ks = jax.random.split(jax.random.PRNGKey(3), P)
    timeit("gauss fit+draw",
           jax.jit(lambda s, w, ps, kk: jax.vmap(
               lambda a, b, c, d: _gaussian_from_samples(
                   cfg, a, b, c, pose, prev, d))(s, w, ps, kk)),
           samples, lp, st.poses, ks)

    timeit("draw samples",
           jax.jit(lambda ps, kk: jax.vmap(
               lambda a, b: _draw_samples(cfg, a,
                                          jnp.zeros(3, jnp.float32), b)
           )(ps, kk)),
           st.poses, ks)

    timeit("resample gather",
           jax.jit(lambda s: _low_variance_resample(
               cfg, s, jax.random.PRNGKey(1))),
           st)

    timeit("FULL pf step (pallas)", step, st, reps=5)


if __name__ == "__main__":
    main()
