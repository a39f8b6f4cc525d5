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
    """Load a checkpoint into the structure of `like`.

    The stored treedef string must match `like`'s — a mismatched structure
    (different TargetState version, multi- vs single-target) raises
    immediately instead of silently reinterpreting leaves.
    """
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(like)
    if "treedef" in data:
        stored = bytes(data["treedef"]).decode()
        if stored != str(treedef):
            raise ValueError(
                "checkpoint treedef mismatch:\n"
                f"  stored: {stored}\n  expected: {treedef}"
            )
    ref_leaves = jax.tree_util.tree_leaves(like)
    n_stored = len([k for k in data.files if k.startswith("leaf_")])
    if n_stored != len(ref_leaves):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, expected {len(ref_leaves)}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(len(ref_leaves))]
    import jax.numpy as jnp

    cast = [jnp.asarray(l, ref.dtype) for l, ref in zip(leaves, ref_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
