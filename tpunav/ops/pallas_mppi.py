"""Fused MPPI solve as a single Pallas TPU kernel.

The XLA path (tpunav.control.mppi) lowers the solve to a scan whose carry
round-trips HBM every horizon step plus separate kernels for sampling,
cost-to-go, and the softmax update. Here the WHOLE solve — Gaussian
sampling (on-core PRNG + Box-Muller), K-wide RK4 rollouts, the LQR loss,
the reverse cost-to-go accumulation, and the softmax-weighted control
update (ref semantics: controller/src/controller/mppi.cpp:72-140) — is one
kernel with every rollout resident in VMEM:

- K rollouts are laid out as an (S, 128) block (S = K/128 sublanes), the
  natural VPU shape; all per-step math is elementwise on that block.
- Noise is generated inside the kernel (pltpu.prng_random_bits →
  Box-Muller), so the (K, N, 2) perturbation tensor never touches HBM —
  and never touches VMEM either: the softmax-update phase RE-SEEDS the
  on-core PRNG and replays the identical stream instead of storing the
  (N, S, 128) perturbation blocks. Only the loss/cost-to-go block lives
  in scratch, so K scales to the VMEM limit (~50k rollouts at N=50)
  rather than a third of it.
- The only HBM traffic for the entire solve is u (N,2) in and u_new
  (N,2) out — ~800 bytes.

Measured scaling is latency-dominated: the ~150 short sequential VPU ops
(N rollout steps + N cost-to-go adds + N softmax reductions) cost more
than the per-rollout math, so quadrupling K costs only ~20% — which is
why the kernel maximizes K per chip instead of micro-optimizing flops.

Tried and rejected (r5): Python-unrolling the horizon loops the way the
map-update kernel unrolls its beam gather. The full rollout unroll keeps
~N iterations of temporaries live and blows the Mosaic VMEM stack
(29 MB > 16 MB at K=49,152); unrolling only the small cost-to-go/update
loops measured +0.3% (inside tunnel noise) while compile time went
2.6 s → 23 s. The rollout body is large enough that fori bookkeeping is
noise here — unlike the map kernel's 360 two-op select iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..control.mppi import MPPIConfig, shift_controls
from ..models.cart import CartParams

_LANES = 128


def _uniform01(shape):
    """Uniform in (0, 1] from raw PRNG bits: stuff 23 random mantissa bits
    under exponent 0 → [1, 2), then 2 - f (int-only ops + bitcast; Mosaic
    has no uint→float cast)."""
    bits = pltpu.prng_random_bits(shape)
    mant = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
    f = pltpu.bitcast(jnp.bitwise_or(mant, jnp.int32(0x3F800000)),
                      jnp.float32)
    return 2.0 - f  # (0, 1] — safe for log


def _box_muller(shape):
    """Two independent standard-normal blocks of ``shape``."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * jnp.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _mppi_kernel(cfg: MPPIConfig, model: CartParams, sub: int,
                 external_noise: bool, n_obs: int, partial_out: bool,
                 *refs):
    refs = list(refs)
    u_ref, pose_ref, xd_ref, seed_ref = refs[:4]
    refs = refs[4:]
    if external_noise:
        en0_ref, en1_ref = refs[:2]
        refs = refs[2:]
    if n_obs:
        obs_ref = refs.pop(0)
    uout_ref, loss_ref = refs

    n = cfg.steps
    wr, wb = model.wheel_radius, model.wheel_base
    dt = cfg.dt
    sig0 = float(cfg.ul_var) ** 0.5
    sig1 = float(cfg.ur_var) ** 0.5
    shape = (sub, _LANES)

    def noise_at(t):
        """Per-step perturbation blocks. The internal path draws from the
        on-core PRNG — deterministic given the seed, so the update phase
        replays the identical stream instead of buffering (N,S,128)×2 in
        VMEM (the external-noise parity path just reads its inputs; prng
        ops don't lower on CPU/interpret)."""
        if external_noise:
            return en0_ref[t], en1_ref[t]
        g0, g1 = _box_muller(shape)
        return g0 * sig0, g1 * sig1

    if not external_noise:
        pltpu.prng_seed(seed_ref[0, 0])

    # ── Rollout all K trajectories over the horizon, loss row per step ──
    def step(t, carry):
        x, y, th = carry
        z0, z1 = noise_at(t)
        ul = u_ref[t, 0] + z0
        ur = u_ref[t, 1] + z1

        # Classical RK4 with zero-order-hold control (rk4.cpp:95-115).
        # For the diff-drive cart, theta-dot depends only on the (held)
        # controls, so k1t=k2t=k3t=k4t=w and the k2/k3 stage inputs are
        # bitwise identical — evaluate 3 trig pairs instead of 4 and keep
        # the exact accumulation expressions (k3 := k2) so results match
        # the naive 4-stage kernel bit-for-bit.
        w = (wr / wb) * (ur - ul)
        fwd = (0.5 * wr) * (ul + ur)
        k1x = fwd * jnp.cos(th)
        k1y = fwd * jnp.sin(th)
        th2 = th + 0.5 * dt * w
        k2x = fwd * jnp.cos(th2)
        k2y = fwd * jnp.sin(th2)
        th4 = th + dt * w
        k4x = fwd * jnp.cos(th4)
        k4y = fwd * jnp.sin(th4)
        s = dt / 6.0
        x = x + s * (k1x + 2.0 * (k2x + k2x) + k4x)
        y = y + s * (k1y + 2.0 * (k2y + k2y) + k4y)
        th = th + s * (w + 2.0 * (w + w) + w)

        # Running LQR loss (mppi.hpp:87-93); the terminal row is
        # overwritten after the loop (mppi.cpp:105 replaces, not adds).
        ex = x - xd_ref[0, 0]
        ey = y - xd_ref[0, 1]
        et = th - xd_ref[0, 2]
        q0, q1, q2 = cfg.q_diag
        r0, r1 = cfg.r_diag
        loss_ref[t] = (q0 * ex * ex + q1 * ey * ey + q2 * et * et +
                       r0 * ul * ul + r1 * ur * ur)

        @pl.when(t == n - 1)
        def _():
            p0, p1_, p2 = cfg.p1_diag
            loss_ref[t] = p0 * ex * ex + p1_ * ey * ey + p2 * et * et

        if n_obs:
            # Analytic primitive-set obstacle cost, evaluated in-register
            # on the (S, 128) position block — the fused-kernel form of
            # control/obstacle_cost.py:make_segment_obstacle_cost. Added
            # AFTER the terminal overwrite, matching the XLA path's
            # `loss.at[-1].set(terminal); loss += extra_cost(traj)`.
            # Weights live in SMEM (row n_obs of the obstacle array), so
            # tuning the cost field never recompiles the kernel.
            d = jnp.full(shape, jnp.inf, jnp.float32)
            for o in range(n_obs):       # static unroll; scalars from SMEM
                ax, ay = obs_ref[o, 0], obs_ref[o, 1]
                abx = obs_ref[o, 2] - ax
                aby = obs_ref[o, 3] - ay
                rr = obs_ref[o, 4]
                inv = 1.0 / jnp.maximum(abx * abx + aby * aby, 1e-12)
                tp = jnp.clip(((x - ax) * abx + (y - ay) * aby) * inv,
                              0.0, 1.0)
                px = x - (ax + tp * abx)
                py = y - (ay + tp * aby)
                d = jnp.minimum(d, jnp.sqrt(px * px + py * py) - rr)
            r_safe = obs_ref[n_obs, 0]
            w_hit = obs_ref[n_obs, 1]
            w_field = obs_ref[n_obs, 2]
            inv_sigma = obs_ref[n_obs, 3]
            hit = (d <= r_safe).astype(jnp.float32)
            loss_ref[t] = loss_ref[t] + w_hit * hit + \
                w_field * jnp.exp(-(d - r_safe) * inv_sigma)

        return x, y, th

    x0 = jnp.full(shape, pose_ref[0, 0], jnp.float32)
    y0 = jnp.full(shape, pose_ref[0, 1], jnp.float32)
    t0 = jnp.full(shape, pose_ref[0, 2], jnp.float32)
    jax.lax.fori_loop(0, n, step, (x0, y0, t0))

    # ── Reverse cumulative sum → cost-to-go (mppi.cpp:15-25) ──
    def acc(i, _):
        t = n - 2 - i
        loss_ref[t] = loss_ref[t] + loss_ref[t + 1]
        return 0

    jax.lax.fori_loop(0, n - 1, acc, 0)

    # ── Per-step softmax over K + weighted control update (mppi.cpp:
    # 112-126). Each step reduces the (S, 128) block to scalars; u lives
    # in SMEM so the updates are scalar stores. Re-seed and replay the
    # PRNG stream for the perturbations (see noise_at).
    if not external_noise:
        pltpu.prng_seed(seed_ref[0, 0])

    if partial_out:
        # Sharded mode: emit per-shard softmax partials instead of the
        # final update. With the local min m_l and e_k = exp((m_l−j_k)/λ),
        # the GLOBAL update decomposes exactly (w = e·exp((m_g−m_l)/λ)
        # + 1e-8): rows are [m_l, Σe, Σe·z0, Σe·z1, Σz0, Σz1] and the
        # caller rescales by exp((m_g−m_l)/λ) and psums across shards
        # (parallel/mppi_sharded.py:mppi_solve_fused_sharded).
        def upd(t, _):
            jt = loss_ref[t]
            z0, z1 = noise_at(t)
            m = jnp.min(jt)
            e = jnp.exp((m - jt) * (1.0 / cfg.lambda_))
            uout_ref[t, 0] = m
            uout_ref[t, 1] = jnp.sum(e)
            uout_ref[t, 2] = jnp.sum(e * z0)
            uout_ref[t, 3] = jnp.sum(e * z1)
            uout_ref[t, 4] = jnp.sum(z0)
            uout_ref[t, 5] = jnp.sum(z1)
            return 0
    else:
        def upd(t, _):
            jt = loss_ref[t]
            z0, z1 = noise_at(t)
            m = jnp.min(jt)
            w = jnp.exp((m - jt) * (1.0 / cfg.lambda_)) + 1e-8
            inv = 1.0 / jnp.sum(w)
            du0 = jnp.sum(w * z0) * inv
            du1 = jnp.sum(w * z1) * inv
            lim = cfg.max_wheel_vel
            uout_ref[t, 0] = jnp.clip(u_ref[t, 0] + du0, -lim, lim)
            uout_ref[t, 1] = jnp.clip(u_ref[t, 1] + du1, -lim, lim)
            return 0

    jax.lax.fori_loop(0, n, upd, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "model", "partial_out", "interpret"))
def _solve_update(cfg: MPPIConfig, model: CartParams, u, seed, pose_xyt,
                  xd, noise=None, obstacles=None,
                  partial_out=False, interpret=False):
    """Run the fused kernel; returns the updated (N,2) controls pre-shift
    (or the (N,6) per-shard softmax partials when ``partial_out``).
    ``obstacles`` is the PACKED (O+1, 5) array from :func:`pack_obstacles`
    — primitives plus a trailing runtime-weights row."""
    if cfg.rollouts % _LANES != 0:
        raise ValueError(f"rollouts must be a multiple of {_LANES}")
    sub = cfg.rollouts // _LANES
    n = cfg.steps
    # Single-kernel VMEM envelope: the (N, S, 128) loss/cost-to-go
    # scratch is the big resident block (N·K·4 bytes), and the other
    # resident blocks (controls, poses, per-step temporaries) leave only
    # ~10 MB for it — measured: K=49,152 at N=50 (9.8 MB) compiles,
    # K=65,536 (12.5 MB) OOMs inside Mosaic. Fail with a pointer to the
    # sharded path instead of a Mosaic stack OOM.
    scratch_bytes = n * cfg.rollouts * 4
    if scratch_bytes > 10 << 20:
        raise ValueError(
            f"K={cfg.rollouts} x N={n} needs ~{scratch_bytes >> 20} MB of "
            "VMEM scratch — beyond the single-kernel envelope. Use "
            "mppi_solve_fused_blocked (sequential blocks on one chip), "
            "shard K over a mesh "
            "(parallel/mppi_sharded.mppi_solve_fused_sharded), or the "
            "XLA path (control/mppi.mppi_solve)")
    external = noise is not None
    n_obs = 0 if obstacles is None else obstacles.shape[0] - 1

    kern = functools.partial(_mppi_kernel, cfg, model, sub, external,
                             n_obs, partial_out)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # u (N,2)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # pose (1,3)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # xd (1,3)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # seed (1,1)
    ]
    args = [u.astype(jnp.float32),
            pose_xyt.astype(jnp.float32).reshape(1, 3),
            xd.astype(jnp.float32).reshape(1, 3),
            jnp.asarray(seed, jnp.int32).reshape(1, 1)]
    if external:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        args += [noise[..., 0].astype(jnp.float32),
                 noise[..., 1].astype(jnp.float32)]
    if n_obs:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]   # (O+1, 5)
        args += [obstacles.astype(jnp.float32)]

    out_cols = 6 if partial_out else 2
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, out_cols), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n, sub, _LANES), jnp.float32),   # loss / cost-to-go
        ],
        interpret=interpret,
    )(*args)


def pack_obstacles(obstacles, obs_cfg):
    """Pack (O, 5) segment primitives [ax, ay, bx, by, r] and the cost
    weights (:class:`tpunav.control.obstacle_cost.SegmentCostParams`) into
    the kernel's (O+1, 5) SMEM layout: weights ride in the trailing row as
    RUNTIME scalars [r_safe, w_hit, w_field, 1/sigma, 0], so tuning the
    field never recompiles the kernel. Returns None when obstacles is
    None."""
    if obstacles is None:
        return None
    if obs_cfg is None:
        raise ValueError("pass obstacles and obs_cfg together")
    row = jnp.asarray([[obs_cfg.r_safe, obs_cfg.w_hit, obs_cfg.w_field,
                        1.0 / obs_cfg.sigma, 0.0]], jnp.float32)
    return jnp.concatenate([jnp.asarray(obstacles, jnp.float32), row])


def mppi_solve_partials(cfg: MPPIConfig, model: CartParams, u, seed,
                        pose_xyt, xd, noise=None, obstacles=None,
                        obs_cfg=None, interpret=False):
    """Per-shard fused solve returning the (N, 6) softmax partials
    [m_l, Σe, Σe·z0, Σe·z1, Σz0, Σz1] (e = exp((m_l−j)/λ)) for the
    cross-device reduction in
    :func:`tpunav.parallel.mppi_sharded.mppi_solve_fused_sharded`."""
    return _solve_update(cfg, model, u, seed, pose_xyt, xd, noise,
                         pack_obstacles(obstacles, obs_cfg),
                         partial_out=True, interpret=interpret)


def combine_softmax_partials(cfg: MPPIConfig, u, part, min_fn, sum_fn):
    """Recombine (…, N, 6) softmax partials [m_l, Σe, Σe·z0, Σe·z1, Σz0,
    Σz1] into the updated controls — the ONE implementation of the
    rescaled-exponential algebra shared by the cross-device path
    (min_fn/sum_fn = pmin/psum over a mesh axis,
    parallel/mppi_sharded.py) and the single-chip blocked path
    (jnp.min/jnp.sum over the leading block axis). The reference softmax
    (mppi.cpp:112-121) is w = exp((m_g−j)/λ) + 1e-8 with the GLOBAL min
    m_g; exp((m_g−j)/λ) = exp((m_g−m_l)/λ)·exp((m_l−j)/λ), so each
    contribution rescales by s = exp((m_g−m_l)/λ) and the 1e-8 floor
    adds the plain noise sums."""
    m_l = part[..., 0]
    m_g = min_fn(m_l)                                       # (N,)
    s = jnp.exp((m_g - m_l) * (1.0 / cfg.lambda_))
    contrib = s[..., None] * part[..., 1:4]
    red = sum_fn(jnp.concatenate([contrib, part[..., 4:6]], axis=-1))
    denom = red[:, 0] + 1e-8 * cfg.rollouts                 # red: (N, 5)
    du0 = (red[:, 1] + 1e-8 * red[:, 3]) / denom
    du1 = (red[:, 2] + 1e-8 * red[:, 4]) / denom
    u_new = u + jnp.stack([du0, du1], axis=1)
    u_new = jnp.clip(u_new, -cfg.max_wheel_vel, cfg.max_wheel_vel)
    return u_new[0], shift_controls(cfg, u_new)


def mppi_solve_fused(cfg: MPPIConfig, model: CartParams, u, seed, pose_xyt,
                     xd, noise=None, obstacles=None, obs_cfg=None,
                     interpret=False):
    """Drop-in fused replacement for :func:`tpunav.control.mppi.mppi_solve`.

    ``seed`` is an int32 scalar (per-solve PRNG seed) instead of a jax
    PRNG key — the kernel uses the on-core PRNG. Pass ``noise``
    ((N, S, 128, 2) time-major std-normal scaled perturbations) to bypass
    in-kernel sampling for deterministic parity tests.
    ``obstacles`` ((O, 5) segment primitives [ax, ay, bx, by, r]) +
    ``obs_cfg`` (:class:`tpunav.control.obstacle_cost.SegmentCostParams`,
    static) add the analytic obstacle cost to every rollout step
    in-kernel (BASELINE config 2 on the fused path).
    Returns (wheel_cmd (2,), u_next (N, 2)) like ``mppi_solve``.
    """
    u_new = _solve_update(cfg, model, u, seed, pose_xyt, xd, noise,
                          pack_obstacles(obstacles, obs_cfg),
                          interpret=interpret)
    return u_new[0], shift_controls(cfg, u_new)


def mppi_solve_fused_blocked(cfg: MPPIConfig, model: CartParams, u, seed,
                             pose_xyt, xd, blocks: int, noise=None,
                             obstacles=None, obs_cfg=None,
                             interpret=False):
    """Fused solve for K beyond the single-kernel VMEM envelope on ONE
    chip: split K into ``blocks`` sequential kernel invocations emitting
    softmax partials, combined with the exact same rescaled-exponential
    algebra as the cross-device path
    (parallel/mppi_sharded.py:_fused_sharded_body — there via pmin/psum,
    here via plain reductions over the block axis). Block 0 keeps the
    caller's seed, so ``blocks=1`` reproduces :func:`mppi_solve_fused`'s
    PRNG stream exactly.

    ``noise``: optional (blocks, N, S/blocks, 128, 2) per-block
    perturbations for deterministic parity tests (the rollout-tile axis
    of the unsharded layout, split across blocks).
    """
    import dataclasses

    if blocks < 1:
        raise ValueError(f"blocks must be >= 1, got {blocks}")
    if cfg.rollouts % (blocks * _LANES) != 0:
        raise ValueError(
            f"rollouts={cfg.rollouts} must split into {blocks} blocks "
            f"of whole {_LANES}-lane tiles")
    cfg_local = dataclasses.replace(cfg, rollouts=cfg.rollouts // blocks)
    packed = pack_obstacles(obstacles, obs_cfg)
    # Distinct PRNG stream per block (golden-ratio stride, matching the
    # sharded path's per-shard seeds).
    seeds = (jnp.asarray(seed, jnp.int32) +
             jnp.arange(blocks, dtype=jnp.int32) * jnp.int32(-0x61C88647))

    def one_block(args):
        s, nz = args
        return _solve_update(cfg_local, model, u, s, pose_xyt, xd, nz,
                             packed, partial_out=True,
                             interpret=interpret)

    if noise is None:
        parts = jax.lax.map(lambda s: one_block((s, None)), seeds)
    else:
        parts = jax.lax.map(one_block, (seeds, noise))      # (B, N, 6)

    return combine_softmax_partials(
        cfg, u, parts,
        min_fn=lambda m: jnp.min(m, axis=0),
        sum_fn=lambda x: jnp.sum(x, axis=0))
