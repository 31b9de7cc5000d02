"""Bisect the likelihood sweep: endpoints vs gather vs exp/log vs sum."""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

from tpunav.estimation.rbpf import GridConfig
from tpunav.estimation.rbpf.grid import scan_end_points, world_to_cell

P, K, B = 500, 50, 360


def timeit(fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def main():
    grid = GridConfig()
    H, W = grid.height, grid.width
    dists = jax.random.uniform(jax.random.PRNGKey(0), (P, H, W), jnp.float32)
    ranges = jax.random.uniform(jax.random.PRNGKey(1), (B,), jnp.float32,
                                0.2, 3.4)
    samples = jax.random.normal(jax.random.PRNGKey(2), (P, K, 3),
                                jnp.float32) * 0.3

    def endpoints(pose):
        return scan_end_points(grid, ranges, pose)

    @jax.jit
    def only_endpoints(samples):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        return jnp.sum(pts) + jnp.sum(valid)

    @jax.jit
    def endpoints_cells(samples):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)
        return jnp.sum(iy) + jnp.sum(ix)

    @jax.jit
    def through_gather(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)            # (P, K, B)
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, iy, ix)
        return jnp.sum(d)

    @jax.jit
    def full(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, iy, ix)
        var = grid.sigma_hit ** 2
        norm = 1.0 / jnp.sqrt(2.0 * jnp.pi * var)
        pz = grid.z_hit * norm * jnp.exp(-0.5 * d * d / var) + \
            grid.z_rand / grid.z_max
        return jnp.sum(jnp.where(valid, jnp.log(pz), 0.0), axis=-1)

    for name, fn, args in [
        ("endpoints only ", only_endpoints, (samples,)),
        ("+ world_to_cell", endpoints_cells, (samples,)),
        ("+ gather       ", through_gather, (samples, dists)),
        ("+ exp/log/sum  ", full, (samples, dists)),
    ]:
        print(f"{name}: {timeit(fn, *args) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()


def extra():
    grid = GridConfig()
    H, W = grid.height, grid.width
    dists = jax.random.uniform(jax.random.PRNGKey(0), (P, H, W), jnp.float32)
    ranges = jax.random.uniform(jax.random.PRNGKey(1), (B,), jnp.float32,
                                0.2, 3.4)
    samples = jax.random.normal(jax.random.PRNGKey(2), (P, K, 3),
                                jnp.float32) * 0.3

    def endpoints(pose):
        return scan_end_points(grid, ranges, pose)

    @jax.jit
    def barrier_gather(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)
        iy, ix = jax.lax.optimization_barrier((iy, ix))
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, iy, ix)
        return jnp.sum(d)

    @jax.jit
    def barrier_flat_take(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)
        idx = jax.lax.optimization_barrier((iy * W + ix).reshape(P, -1))
        d = jnp.take_along_axis(dists.reshape(P, -1), idx, axis=1)
        return jnp.sum(d)

    @jax.jit
    def full_barrier(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)
        iy, ix = jax.lax.optimization_barrier((iy, ix))
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, iy, ix)
        var = grid.sigma_hit ** 2
        norm = 1.0 / jnp.sqrt(2.0 * jnp.pi * var)
        pz = grid.z_hit * norm * jnp.exp(-0.5 * d * d / var) + \
            grid.z_rand / grid.z_max
        return jnp.sum(jnp.where(valid, jnp.log(pz), 0.0), axis=-1)

    for name, fn in [("barrier+gather ", barrier_gather),
                     ("barrier+flat   ", barrier_flat_take),
                     ("full w/ barrier", full_barrier)]:
        print(f"{name}: {timeit(fn, samples, dists) * 1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    extra()
