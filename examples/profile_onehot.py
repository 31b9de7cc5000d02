"""One-hot MXU contraction vs native gather, inside COMPOSITE programs
(standalone-gather programs measure fast, composite ones collapse to a
~105 ms slow path — so all comparisons here keep the producers in)."""

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
    def lik_onehot(samples, dists):
        pts, valid = jax.vmap(jax.vmap(endpoints))(samples)
        iy, ix = world_to_cell(grid, pts)                 # (P, K, B)

        def chunk(carry, sl):
            y, x, v = sl                                   # (P, B) each
            oy = jax.nn.one_hot(y, H, dtype=jnp.float32)   # (P, B, H)
            ox = jax.nn.one_hot(x, W, dtype=jnp.float32)   # (P, B, W)
            rows = jnp.einsum('pbh,phw->pbw', oy, dists)
            d = jnp.sum(rows * ox, axis=-1)                # (P, B)
            var = grid.sigma_hit ** 2
            norm = 1.0 / jnp.sqrt(2.0 * jnp.pi * var)
            pz = grid.z_hit * norm * jnp.exp(-0.5 * d * d / var) + \
                grid.z_rand / grid.z_max
            return carry, jnp.sum(jnp.where(v, jnp.log(pz), 0.0), axis=-1)

        _, lp = jax.lax.scan(
            chunk, 0.0,
            (iy.transpose(1, 0, 2), ix.transpose(1, 0, 2),
             valid.transpose(1, 0, 2)))
        return lp.T                                        # (P, K)

    @jax.jit
    def integ_onehot(dists, poses):
        """integrate_scan free-mask via one-hot matmul over the beam table."""
        res = grid.resolution
        cx = grid.xmin + (jnp.arange(W, dtype=jnp.float32) + 0.5) * res
        cy = grid.ymin + (jnp.arange(H, dtype=jnp.float32) + 0.5) * res

        def per_p(pose):
            dx = cx[None, :] - pose[1]
            dy = cy[:, None] - pose[2]
            r_c = jnp.sqrt(dx * dx + dy * dy)
            two_pi = 2.0 * jnp.pi
            alpha = jnp.mod(jnp.arctan2(dy, dx) - pose[0], two_pi)
            b = jnp.round(alpha / grid.beam_delta).astype(jnp.int32) % B
            ob = jax.nn.one_hot(b.reshape(-1), B, dtype=jnp.float32)
            r_beam = (ob @ ranges).reshape(H, W)
            return jnp.sum(jnp.where(r_c < r_beam, 1.0, 0.0))

        return jax.vmap(per_p)(poses)

    @jax.jit
    def integ_gather(dists, poses):
        res = grid.resolution
        cx = grid.xmin + (jnp.arange(W, dtype=jnp.float32) + 0.5) * res
        cy = grid.ymin + (jnp.arange(H, dtype=jnp.float32) + 0.5) * res

        def per_p(pose):
            dx = cx[None, :] - pose[1]
            dy = cy[:, None] - pose[2]
            r_c = jnp.sqrt(dx * dx + dy * dy)
            two_pi = 2.0 * jnp.pi
            alpha = jnp.mod(jnp.arctan2(dy, dx) - pose[0], two_pi)
            b = jnp.round(alpha / grid.beam_delta).astype(jnp.int32) % B
            r_beam = ranges[b]
            return jnp.sum(jnp.where(r_c < r_beam, 1.0, 0.0))

        return jax.vmap(per_p)(poses)

    poses = jax.random.normal(jax.random.PRNGKey(5), (P, 3), jnp.float32)
    for name, fn, args in [
        ("lik one-hot scan ", lik_onehot, (samples, dists)),
        ("integ one-hot    ", integ_onehot, (dists, poses)),
        ("integ gather     ", integ_gather, (dists, poses)),
    ]:
        print(f"{name}: {timeit(fn, *args) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
