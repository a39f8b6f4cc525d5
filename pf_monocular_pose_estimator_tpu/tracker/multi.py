"""Multi-target tracking: a batch axis over targets.

Functional parity target: the reference's per-object state vectors and
serial loop (`*_Vec` members, pose_estimator.h:65-118; loop at
pose_estimator.cpp:89-736; YAML splitting via numberOfMarkersUAVk,
monocular_pose_estimator.cpp:91-124).  Targets with fewer markers are
padded to a common M with a mask; the serial loop becomes `vmap`, so all
targets' detection + PF work batches onto the chip together (and shards
over a 'targets' mesh axis via parallel.mesh.make_sharded_multi_tracker).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera
from ..utils.config import TrackerConfig
from .state import TargetState
from .step import tracker_step


def pad_marker_sets(marker_sets: Sequence[np.ndarray]):
    """Pad per-target (M_i, 4) marker arrays to ((T, M_max, 4), (T, M_max))."""
    m_max = max(m.shape[0] for m in marker_sets)
    t = len(marker_sets)
    out = np.zeros((t, m_max, 4), np.float32)
    mask = np.zeros((t, m_max), bool)
    for i, m in enumerate(marker_sets):
        out[i, : m.shape[0]] = m
        mask[i, : m.shape[0]] = True
        # padded rows keep w=1 so projection stays finite
        out[i, m.shape[0] :, 3] = 1.0
    return jnp.asarray(out), jnp.asarray(mask)


def make_multi_tracker(
    camera: Camera,
    markers_h: jnp.ndarray,  # (T, M, 4)
    marker_masks: jnp.ndarray,  # (T, M)
    config: TrackerConfig,
    sequential: bool = True,
):
    """Jitted `step(states, image, t) -> (states', results)` over targets.

    sequential=True (default) iterates targets with `lax.map`, matching
    the reference's per-object loop: `lax.cond` branches stay real
    conditionals, so a tracking target never pays for the brute-force
    init branch.  sequential=False uses `vmap` — all targets advance in
    one batched program (conds become selects: every target executes
    both branches every frame), which is what the mesh-sharded path in
    parallel/mesh.py wants, where each device owns its target anyway.
    """
    markers_h = jnp.asarray(markers_h)
    marker_masks = jnp.asarray(marker_masks, bool)

    def _one(state, image, t, markers, mask):
        return tracker_step(state, image, t, camera, markers, mask, config)

    if sequential:

        @jax.jit
        def step(states, image, t):
            return jax.lax.map(
                lambda args: _one(args[0], image, t, args[1], args[2]),
                (states, markers_h, marker_masks),
            )

    else:

        @jax.jit
        def step(states, image, t):
            return jax.vmap(_one, in_axes=(0, None, None, 0, 0))(
                states, image, t, markers_h, marker_masks
            )

    return step


def create_states(n_targets: int, n_particles: int, seed: int = 0, image_size=(752, 480)):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_targets)
    return jax.vmap(lambda k: TargetState.create(n_particles, k, image_size))(keys)
