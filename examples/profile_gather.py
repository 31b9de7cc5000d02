"""Which lowering wins for the RBPF likelihood's (P·k·B) ESDF lookups?

V1: direct 2D gather   d = field[iy, ix]
V2: row gather + take_along_axis (contiguous 320 B rows)
V3: one-hot einsum (gather as two MXU contractions)
"""

import time

import jax

from tpunav.runtime import cache as _cache
_cache.enable()
import jax.numpy as jnp

P, K, B, H, W = 500, 50, 360, 80, 80


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    fields = jax.random.uniform(key, (P, H, W), jnp.float32)
    iy = jax.random.randint(jax.random.PRNGKey(1), (P, K, B), 0, H)
    ix = jax.random.randint(jax.random.PRNGKey(2), (P, K, B), 0, W)

    @jax.jit
    def v1(fields, iy, ix):
        def per_p(f, y, x):
            return f[y, x]                      # (K, B) 2D gather
        return jnp.sum(jax.vmap(per_p)(fields, iy, ix))

    @jax.jit
    def v2(fields, iy, ix):
        def per_p(f, y, x):
            rows = f[y.reshape(-1)]             # (K*B, W) row gather
            return jnp.take_along_axis(
                rows, x.reshape(-1)[:, None], axis=1)
        return jnp.sum(jax.vmap(per_p)(fields, iy, ix))

    @jax.jit
    def v3(fields, iy, ix):
        def per_p(f, y, x):
            oy = jax.nn.one_hot(y.reshape(-1), H, dtype=f.dtype)  # (KB, H)
            ox = jax.nn.one_hot(x.reshape(-1), W, dtype=f.dtype)  # (KB, W)
            rows = oy @ f                        # (KB, W) on the MXU
            return jnp.sum(rows * ox, axis=1)
        return jnp.sum(jax.vmap(per_p)(fields, iy, ix))

    @jax.jit
    def v4(fields, iy, ix):
        flat = fields.reshape(P, H * W)
        idx = (iy * W + ix).reshape(P, -1)
        return jnp.sum(jnp.take_along_axis(flat, idx, axis=1))

    for name, fn in [("v1 2d-gather", v1), ("v2 row-gather", v2),
                     ("v3 onehot-mxu", v3), ("v4 flat-take", v4)]:
        dt = timeit(fn, fields, iy, ix)
        print(f"{name}: {dt * 1e3:7.2f} ms for {P * K * B / 1e6:.1f}M lookups",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
