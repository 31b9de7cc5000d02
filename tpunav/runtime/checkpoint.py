"""Pytree checkpoint/resume.

The reference has NO state persistence (SURVEY.md §5 — its closest
mechanism is the runtime set_pose reset). For benchmark reproducibility
and long-running SLAM sessions, any framework state pytree (EKFState,
PFState, MPPI control sequence, sim state) round-trips through a single
.npz file; structure is rebuilt from a matching template on load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, _ = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, **arrays)


def load_pytree(path: str, template):
    """Load into the structure of ``template`` (same treedef; leaf dtypes
    follow the template's leaves)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has "
            f"{len(leaves)}")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(jnp.asarray(
            arr, dtype=getattr(leaf, "dtype", arr.dtype)))
    return jax.tree.unflatten(treedef, new_leaves)
