"""Decompose the P=500 pf_slam_step cost with REALISTIC (non-empty) maps:
which stage actually costs 194 ms/update?"""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.core import se2
from tpunav.core.angles import normalize_angle_pi
from tpunav.estimation.rbpf import GridConfig, PFConfig, pf_init, pf_slam_step
from tpunav.estimation.rbpf.grid import esdf, integrate_scan, likelihood_field_log
from tpunav.estimation.rbpf.icp import ICPConfig
from tpunav.estimation.rbpf.particle_filter import pose_likelihood_odom
from tpunav.sim.lidar import box_segments, scan_segments

P, K = 500, 50


def timeit(fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def main():
    grid = GridConfig()
    cfg = PFConfig(num_particles=P, k_samples=K,
                   sample_range=(1e-6, 1e-5, 1e-5),
                   motion_noise=(1e-6, 1e-5, 1e-5),
                   grid=grid, icp=ICPConfig(max_iter=25))
    segs = box_segments(-1.8, -1.8, 1.8, 1.8, jnp.float32)
    u = jnp.array([0.03, 0.02], jnp.float32)
    step = jax.jit(lambda s, scan, cur, prev: pf_slam_step(cfg, s, scan,
                                                           u, cur, prev))
    # Warm state: 3 real updates so maps are occupied.
    st = pf_init(cfg, seed=0)
    pose = jnp.zeros(3, jnp.float32)
    prev = pose
    for i in range(3):
        th = pose[0] + 0.03
        pose = jnp.stack([th, pose[1] + 0.02 * jnp.cos(th),
                          pose[2] + 0.02 * jnp.sin(th)])
        scan = scan_segments(pose, segs, num_beams=grid.num_beams,
                             max_range=grid.range_max,
                             key=jax.random.PRNGKey(i), noise_std=0.002)
        st = step(st, scan, pose, prev)
        prev = pose
    jax.block_until_ready(st.poses)

    dt = timeit(step, st, scan, pose, prev)
    print(f"full pf_slam_step (warm maps): {dt * 1e3:8.2f} ms", flush=True)

    samples = st.poses[:, None, :] + jax.random.normal(
        jax.random.PRNGKey(9), (P, K, 3), jnp.float32) * 0.003

    lik = jax.jit(lambda d, s: jax.vmap(jax.vmap(
        lambda si, di: likelihood_field_log(grid, di, scan, si),
        in_axes=(0, None)))(s, d))
    print(f"likelihood P*K: {timeit(lik, st.dists, samples) * 1e3:8.2f} ms",
          flush=True)

    po = jax.jit(lambda s, p: jax.vmap(jax.vmap(
        lambda si, pi: pose_likelihood_odom(cfg, si, pi, pose, prev),
        in_axes=(0, None)))(s, p))
    print(f"pose_lik P*K:   {timeit(po, samples, st.poses) * 1e3:8.2f} ms",
          flush=True)

    @jax.jit
    def gauss(samples, p):
        def per(s, w):
            eta = jnp.sum(w)
            mu = jnp.sum(s * w[:, None], axis=0) / eta
            diff = s - mu
            sig = jnp.einsum("ki,kj,k->ij", diff, diff, w) / eta
            chol = jnp.linalg.cholesky(sig + 1e-12 * jnp.eye(3))
            return mu + chol @ jnp.ones(3, jnp.float32)
        w = jnp.ones((P, K), jnp.float32)
        return jax.vmap(per)(samples, w)
    print(f"gauss prop:     {timeit(gauss, samples, st.poses) * 1e3:8.2f} ms",
          flush=True)

    integ = jax.jit(lambda g, ps: jax.vmap(
        lambda x, q: integrate_scan(grid, x, scan, q))(g, ps))
    print(f"integrate_scan: {timeit(integ, st.grids, st.poses) * 1e3:8.2f} ms",
          flush=True)

    f_esdf = jax.jit(lambda g: jax.vmap(lambda x: esdf(grid, x))(g))
    print(f"esdf:           {timeit(f_esdf, st.grids) * 1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
