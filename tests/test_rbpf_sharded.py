"""Sharded RBPF vs the single-chip path on an 8-device CPU mesh.

The sharded step uses the same per-particle key table as the unsharded
one (rbpf_sharded.py), so both runs must agree to float-reduction
tolerance — including through resampling events that exchange whole maps
across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.estimation.rbpf import (
    GridConfig,
    PFConfig,
    pf_init,
    pf_slam_step,
)
from tpunav.estimation.rbpf.icp import ICPConfig
from tpunav.parallel.mesh import rollout_mesh
from tpunav.parallel.rbpf_sharded import (
    pf_init_sharded,
    pf_slam_step_sharded,
)
from tpunav.sim.lidar import box_segments, scan_segments

GRID = GridConfig(resolution=0.1, xmin=-2.0, xmax=2.0, ymin=-2.0,
                  ymax=2.0, num_beams=90, beam_delta=2 * jnp.pi / 90)
CFG = PFConfig(num_particles=16, k_samples=10,
               sample_range=(1e-6, 1e-5, 1e-5),
               motion_noise=(1e-6, 1e-5, 1e-5),
               grid=GRID, icp=ICPConfig(max_iter=20))

U = jnp.array([0.02, 0.01], jnp.float32)      # [w, vx] per tick


def _true_step(pose):
    th = pose[0] + U[0]
    return jnp.stack([th, pose[1] + U[1] * jnp.cos(th),
                      pose[2] + U[1] * jnp.sin(th)])


def _drive(n_steps, step_fn, st):
    segs = box_segments(-1.5, -1.5, 1.5, 1.5, jnp.float32)
    true_pose = jnp.zeros(3, jnp.float32)
    prev_odom = true_pose
    for _ in range(n_steps):
        true_pose = _true_step(true_pose)
        scan = scan_segments(true_pose, segs, num_beams=GRID.num_beams,
                             beam_delta=GRID.beam_delta,
                             max_range=GRID.range_max)
        st = step_fn(st, scan, U, true_pose, prev_odom)
        prev_odom = true_pose
    return st


def test_sharded_matches_unsharded():
    mesh = rollout_mesh(jax.devices()[:8], axis_name="p")

    step_ref = jax.jit(
        lambda st, r, u, co, po: pf_slam_step(CFG, st, r, u, co, po))
    step_shd = pf_slam_step_sharded(CFG, mesh)

    st_ref = _drive(8, step_ref, pf_init(CFG, seed=5))
    st_shd = _drive(8, step_shd, pf_init_sharded(CFG, mesh, seed=5))

    np.testing.assert_allclose(np.asarray(st_shd.poses),
                               np.asarray(st_ref.poses), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_shd.log_weights),
                               np.asarray(st_ref.log_weights), atol=1e-3)
    np.testing.assert_allclose(np.asarray(st_shd.grids),
                               np.asarray(st_ref.grids), atol=1e-3)
    # The particle axis really is sharded over the mesh.
    assert len(st_shd.grids.sharding.device_set) == 8


def test_sharded_resample_exchange():
    """Force a resample (one particle hogs all weight) and check the
    cross-shard map exchange copies that particle's map everywhere."""
    mesh = rollout_mesh(jax.devices()[:8], axis_name="p")
    st = pf_init_sharded(CFG, mesh, seed=1)
    lw = jnp.full((CFG.num_particles,), -1e3, jnp.float32).at[3].set(0.0)
    grids = jnp.asarray(st.grids).at[3].add(1.5)
    st = st._replace(
        log_weights=jax.device_put(lw, st.log_weights.sharding),
        grids=jax.device_put(grids, st.grids.sharding),
        has_prev=jnp.asarray(True))

    segs = box_segments(-1.5, -1.5, 1.5, 1.5, jnp.float32)
    pose = jnp.asarray([0.0, 0.05, 0.0], jnp.float32)
    scan = scan_segments(pose, segs, num_beams=GRID.num_beams,
                         beam_delta=GRID.beam_delta,
                         max_range=GRID.range_max)
    step = pf_slam_step_sharded(CFG, mesh)
    st2 = step(st, scan, U, pose, jnp.zeros(3, jnp.float32))

    # Nearly every post-resample particle descends from particle 3: its
    # +1.5 log-odds offset dominates the map means. (The reference's
    # resampler draws its partition offset from a NORMAL, ref :478 — a
    # negative draw lets the first slot keep itself, so require ≥ P-2
    # clones rather than all P.)
    base = float(jnp.mean(jnp.asarray(st.grids)[0]))
    means = np.asarray(jnp.mean(st2.grids, axis=(1, 2)))
    assert (means > base + 0.5).sum() >= CFG.num_particles - 2, means
