"""Decisive gather variants: producer-dependent vs independent indices."""

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
    riy = jax.random.randint(jax.random.PRNGKey(3), (P, K, B), 0, H)
    rix = jax.random.randint(jax.random.PRNGKey(4), (P, K, B), 0, W)

    def endpoints(pose):
        return scan_end_points(grid, ranges, pose)

    @jax.jit
    def independent(samples, dists, riy, rix):
        """Trig AND gather in one program, but gather uses input indices."""
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, riy, rix)
        return jnp.sum(pts) + jnp.sum(d)

    @jax.jit
    def float_producer(samples, dists):
        """Indices from cheap float math (no trig) on the samples."""
        base = samples[:, :, :1] * 100.0 + samples[:, :, 1:2]
        v = base + jnp.arange(B, dtype=jnp.float32)
        iy = jnp.clip(jnp.floor(v).astype(jnp.int32) % H, 0, H - 1)
        ix = jnp.clip(jnp.floor(v * 1.7).astype(jnp.int32) % W, 0, W - 1)
        d = jax.vmap(lambda f, y, x: f[y, x])(dists, iy, ix)
        return jnp.sum(d)

    @jax.jit
    def dep_flat_single_vmap(samples, dists):
        """Trig producer, but flatten sample axis before the gather."""
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)                 # (P, K, B)
        d = jax.vmap(lambda f, y, x: f[y, x])(
            dists, iy.reshape(P, -1), ix.reshape(P, -1))
        return jnp.sum(d)

    for name, fn, args in [
        ("independent      ", independent, (samples, dists, riy, rix)),
        ("float-producer   ", float_producer, (samples, dists)),
        ("dep flat 1-vmap  ", dep_flat_single_vmap, (samples, dists)),
    ]:
        print(f"{name}: {timeit(fn, *args) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
