"""Stratified resampling as a parallel scan, not an O(N^2) loop.

Functional parity target: the resampling block of the reference
(pf_mpe_lib/src/pose_estimator.cpp:668-682): stratified draws
u_i = (i + U[0,1)) / N, each resolved by a linear cumulative-sum scan
(O(N^2) total).  Here the CDF is one `cumsum` and all N ancestors resolve
with one vectorised `searchsorted` — O(N log N), embarrassingly parallel,
and the building block the `parallel/` layer shards over the mesh.

The reference also counts how often each particle was resampled and
refines the most-resampled one (:684-690); `counts`/`argmax` reproduce
that choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_resample(key: jax.Array, weights: jnp.ndarray):
    """Stratified resampling over normalised weights.

    weights: (N,) — need not be normalised; zeros-safe.

    Returns:
      ancestors       : (N,) int32 index of the chosen parent per slot
      counts          : (N,) int32 times each particle was chosen
      most_resampled  : scalar int32 argmax(counts)
    """
    from .soa import chunked_cdf_norm, default_cdf_chunk

    n = weights.shape[0]
    # fixed-association chunked CDF shared with the SoA, Pallas and
    # distributed resamplers (pf.soa.chunked_cdf_norm) so every path
    # computes the same canonical assignment
    cdf = chunked_cdf_norm(weights, default_cdf_chunk(n))
    u = (jnp.arange(n, dtype=weights.dtype) + jax.random.uniform(key, (n,), weights.dtype)) / n
    # First index with cdf >= u — matches the reference's `>=` break
    # (pose_estimator.cpp:677).
    ancestors = jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, n - 1).astype(jnp.int32)
    counts = jnp.bincount(ancestors, length=n).astype(jnp.int32)
    return ancestors, counts, jnp.argmax(counts).astype(jnp.int32)


def effective_sample_size(weights: jnp.ndarray) -> jnp.ndarray:
    """ESS = (sum w)^2 / sum w^2 — the standard resampling trigger.

    Not present in the reference (it always resamples on success); exposed
    for the ESS-triggered mode of BASELINE.json's north star.
    """
    s = jnp.sum(weights)
    s2 = jnp.sum(weights * weights)
    return jnp.where(s2 > 0, (s * s) / s2, 0.0)
