"""Deterministic, PRNG-keyed fault injection for robustness testing.

Functional parity target: LEDDetector::occludeDetections /
insertFalseDetections (pf_mpe_lib/src/led_detector.cpp:417-488), which the
reference drives from `number_of_occlusions` / `number_of_false_detections`
(cfg:23-24) as its robustness-testing mechanism (SURVEY.md §4).

Deltas (intentional, documented): the reference seeds `rand()` with
`time(NULL)` on every call — non-reproducible by construction.  Here the
caller passes an explicit `jax.random` key, making every fault pattern
replayable.  Occlusions drop detections via the validity mask (plus an
`occluded` flag for visualisation) instead of negating coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blob import Detections


def inject_faults(
    key: jax.Array,
    detections: Detections,
    num_occlusions: int,
    num_false_detections: int,
    false_offset_max: float = 5.0,
) -> Detections:
    """Occlude up to `num_occlusions` true detections (each with
    probability 1/2, as in the reference's coin flip at
    led_detector.cpp:434) and fabricate `num_false_detections` spurious
    blobs within +-false_offset_max px of random real ones (:484).

    Both counts are static; zero for both returns the input unchanged.
    Fabricated detections fill invalid slots of the fixed-capacity bank
    (capacity permitting), so shapes never change.
    """
    if num_occlusions == 0 and num_false_detections == 0:
        return detections

    k_cap = detections.mask.shape[0]
    key_occ, key_coin, key_pick, key_off = jax.random.split(key, 4)

    mask = detections.mask
    occluded = detections.occluded
    n_true = jnp.sum(mask.astype(jnp.int32))

    # --- Occlusions: pick distinct random true detections, coin-flip each.
    if num_occlusions > 0:
        # Random priority over true detections; the top `num_occlusions`
        # are the occlusion candidates (distinct by construction).
        prio = jax.random.uniform(key_occ, (k_cap,))
        prio = jnp.where(mask, prio, -1.0)
        order = jnp.argsort(-prio)  # true detections first, random order
        coins = jax.random.bernoulli(key_coin, 0.5, (num_occlusions,))
        hit = jnp.zeros((k_cap,), bool)
        for i in range(num_occlusions):
            idx = order[i]
            take = coins[i] & (i < n_true)
            hit = hit.at[idx].set(jnp.where(take, True, hit[idx]))
        mask = mask & ~hit
        occluded = occluded | hit

    # --- False detections: offset copies of random true detections.
    injected = detections.injected
    xy = detections.xy
    xy_d = detections.xy_distorted
    area = detections.area
    if num_false_detections > 0:
        base_n = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
        picks = jax.random.randint(key_pick, (num_false_detections,), 0, base_n)
        # Map pick i to the i-th currently-valid slot.
        valid_order = jnp.argsort(~mask)  # valid slots first, stable
        src_idx = valid_order[picks]
        sign = jax.random.rademacher(key_off, (num_false_detections, 2)).astype(jnp.float32)
        mag = jax.random.randint(
            jax.random.fold_in(key_off, 1), (num_false_detections, 2), 1, int(false_offset_max) + 1
        ).astype(jnp.float32)
        offsets = sign * mag

        # free slots first; occluded slots keep their coordinates so the
        # visualisation can still draw them (red circles, viz parity)
        free_order = jnp.argsort(mask | injected | occluded)
        for i in range(num_false_detections):
            slot = free_order[i]
            can = ~(mask[slot] | injected[slot]) & jnp.any(detections.mask)
            new_xy_d = xy_d[src_idx[i]] + offsets[i]
            xy_d = xy_d.at[slot].set(jnp.where(can, new_xy_d, xy_d[slot]))
            xy = xy.at[slot].set(jnp.where(can, xy[src_idx[i]] + offsets[i], xy[slot]))
            area = area.at[slot].set(jnp.where(can, area[src_idx[i]], area[slot]))
            mask = mask.at[slot].set(jnp.where(can, True, mask[slot]))
            injected = injected.at[slot].set(jnp.where(can, True, injected[slot]))

    return Detections(
        xy=xy, xy_distorted=xy_d, mask=mask, area=area, occluded=occluded, injected=injected
    )
