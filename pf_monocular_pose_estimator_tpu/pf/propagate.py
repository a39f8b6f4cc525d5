"""Particle propagation (the PF motion model), batched over the bank.

Functional parity target: the propagation block of the reference PF loop
(pf_mpe_lib/src/pose_estimator.cpp:543-588):

  * particle 0 pinned to the current optimised pose,
  * particle 1 pinned to the constant-velocity predicted pose,
  * every other particle: camMoveInv @ resampled @ predictionMatrix
    (prediction skipped right after initialisation, and on every 10th
    retry iteration), then perturbed by uniform rotation noise composed
    as pose @ Rz @ Ry @ Rx and *independent* additive translation noise
    (the reference overwrites the translation column, :585-587 — the
    rotation noise deliberately does not rotate the translation).
  * noise inflated by (1 + 0.025 * floor(iter / 10)) every 10 retries.

The reference's per-particle std::uniform_real_distribution draws become a
single batched `jax.random.uniform` over the bank.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import rotation_rpy


class NoiseBounds(NamedTuple):
    """Uniform propagation-noise bounds (cfg:27-31 dynamic params)."""

    min_translation: float = -0.02
    max_translation: float = 0.02
    min_angular: float = -0.015
    max_angular: float = 0.015


def propagation_noise_factors(
    freshly_initialised: jnp.ndarray,
    prediction_matrix: jnp.ndarray,
    dt_frames: jnp.ndarray,
):
    """Per-axis noise scale factors (pose_estimator.cpp:488-506).

    Right after initialisation all factors are 1 (wide search); once
    tracking, translation noise scales with the *x-translation speed* of
    the prediction (the reference uses predictionMatrix(0,3) for all three
    axes — a quirk kept for parity) clipped to [0.2, 1]/4, and rotation
    noise is fixed at 0.2.

    Returns (fac_trans (3,), fac_rot (3,)).
    """
    dt = jnp.maximum(dt_frames, 1e-6)
    vel = jnp.abs(prediction_matrix[0, 3]) / dt
    fac_t = jnp.clip(vel, 0.2, 1.0) / 4.0
    fac_trans = jnp.where(freshly_initialised, 1.0, fac_t) * jnp.ones((3,))
    fac_rot = jnp.where(freshly_initialised, 1.0, 0.2) * jnp.ones((3,))
    return fac_trans, fac_rot


def propagate(
    key: jax.Array,
    resampled_bank: jnp.ndarray,
    current_pose: jnp.ndarray,
    predicted_pose: jnp.ndarray,
    prediction_matrix: jnp.ndarray,
    cam_move_inv: jnp.ndarray,
    noise: NoiseBounds,
    fac_trans: jnp.ndarray,
    fac_rot: jnp.ndarray,
    tracking: jnp.ndarray,
    apply_prediction: jnp.ndarray,
    inflation: jnp.ndarray,
) -> jnp.ndarray:
    """One propagation sweep over the whole bank.

    resampled_bank : (N, 4, 4) last step's resampled particles
    tracking       : scalar bool — it_since_initialized_ > 1
    apply_prediction: scalar bool — also right-multiply predictionMatrix
                     (the reference's `iter % 10 != 0` rule, :555-560)
    inflation      : scalar — (1 + 0.025 * floor(iter/10)) noise inflation
    Returns (N, 4, 4).
    """
    n = resampled_bank.shape[0]
    dtype = resampled_bank.dtype
    k_rot, k_trans = jax.random.split(key)

    base_pred = cam_move_inv @ resampled_bank @ prediction_matrix
    base_nopred = cam_move_inv @ resampled_bank
    base = jnp.where(
        tracking,
        jnp.where(apply_prediction, base_pred, base_nopred),
        resampled_bank,
    )

    lo_a = jnp.asarray([noise.min_angular] * 3, dtype) * fac_rot * inflation
    hi_a = jnp.asarray([noise.max_angular] * 3, dtype) * fac_rot * inflation
    angles = jax.random.uniform(k_rot, (n, 3), dtype, lo_a, hi_a)
    lo_t = jnp.asarray([noise.min_translation] * 3, dtype) * fac_trans * inflation
    hi_t = jnp.asarray([noise.max_translation] * 3, dtype) * fac_trans * inflation
    dts = jax.random.uniform(k_trans, (n, 3), dtype, lo_t, hi_t)

    noisy = base @ rotation_rpy(angles)
    # Translation noise is additive on the *unrotated* base translation
    # (reference overwrites the column from PoseParticle_temp, :585-587).
    noisy = noisy.at[:, :3, 3].set(base[:, :3, 3] + dts)

    bank = noisy.at[0].set(current_pose).at[1].set(predicted_pose)
    return bank
