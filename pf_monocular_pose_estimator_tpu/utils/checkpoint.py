"""Checkpoint / resume for tracker state.

The reference has none (SURVEY.md §5: all state in mutable members,
recovery only via re-initialisation).  Here the whole tracker state is a
pytree of arrays, so persistence is a flatten + savez — enabling long-run
checkpointing and deterministic replay.
"""

from __future__ import annotations

import numpy as np
import jax


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path: str, like):
    """Load a checkpoint into the structure of `like` (same pytree def)."""
    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len(jax.tree_util.tree_leaves(like)))]
    treedef = jax.tree_util.tree_structure(like)
    import jax.numpy as jnp

    ref_leaves = jax.tree_util.tree_leaves(like)
    cast = [jnp.asarray(l, ref.dtype) for l, ref in zip(leaves, ref_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
