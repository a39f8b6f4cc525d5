"""Distributed stratified resampling — explicit collectives, no bank gather.

SURVEY.md §7 hard-part 4.  Round 1 left resampling to GSPMD's default
partitioning of `cumsum` + `searchsorted` over the sharded weight
vector, which is free to all-gather both the weights and the whole
(16, N) bank.  This module implements the designed mechanism inside a
`shard_map` over the `particles` mesh axis:

  1. **Global offsets from scalar collectives.**  Each shard reduces its
     local weights to one scalar; one `all_gather` of P scalars (bytes:
     4·P) gives every shard the global total and its exclusive prefix
     `offset_s` — the shard's span [offset_s, offset_s + sum_s) in the
     global CDF.
  2. **Per-shard stratified draws with global positions.**  The global
     draw grid u_g = (g + eps[g]) / N · total is a pure function of a
     *replicated* PRNG key, so every shard evaluates any u_g locally
     (zero communication).  Closed-form inversion of the grid (count of
     draws ≤ x, see `_count_leq` below) gives each shard the
     exact number of global copies of each of its local particles, and
     `start_s = count_leq(offset_s)` gives the global output position of
     its first copy — again with no communication.
  3. **Ancestors via a reach-limited ppermute ring.**  The canonical
     stratified assignment (output slot g takes global ancestor A[g],
     A monotone) means output shard s draws only from input shards whose
     CDF span overlaps its output window — its neighbours, unless the
     per-shard weight imbalance exceeds a whole shard's worth of draws.
     Each shard therefore `ppermute`s its (16, S) bank block and local
     CDF to its 2R ring neighbours and fills its output slots by masked
     local gathers.  Traffic per shard: (2R+1)·17·S·4 bytes, independent
     of P — versus (P-1)·16·S·4 for an all-gathered bank.  Draws whose
     ancestor lies beyond the reach are clamped to the nearest covered
     particle and counted in the returned diagnostics (zero in any
     non-degenerate tracking state; `reach` is configurable).

With the same key, the canonical assignment makes the distributed
result IDENTICAL to `pf.soa.stratified_resample_soa` (same ancestors in
the same slot order), pinned by tests/test_distributed_resample.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


class DistResampleOut(NamedTuple):
    resampled: jnp.ndarray  # (16, N) sharded over 'particles'
    counts: jnp.ndarray  # (N,) global copy count per input particle
    most: jnp.ndarray  # replicated int32: global index of most-copied
    clipped: jnp.ndarray  # replicated int32: draws beyond the ring reach


def _count_leq(x_scaled: jnp.ndarray, eps: jnp.ndarray, n: int) -> jnp.ndarray:
    """Number of global draws u_g = (g + eps_g)/n (unit grid) with
    u_g <= x_scaled, where x_scaled = x / total * n is the CDF value in
    grid units.  Closed form: k + (eps_k <= x_scaled - k), k = floor."""
    k = jnp.clip(jnp.floor(x_scaled).astype(jnp.int32), 0, n - 1)
    frac = x_scaled - k.astype(x_scaled.dtype)
    return jnp.clip(k + (eps[k] <= frac).astype(jnp.int32), 0, n)


def _resample_shard(key, w, bank16, n: int, reach: int, axis: str):
    """shard_map body: w (S,), bank16 (16, S) are this shard's blocks."""
    p = jax.lax.axis_size(axis)
    s = w.shape[0]
    idx = jax.lax.axis_index(axis)
    dtype = w.dtype

    # -- 1. scalar collectives -> global total + my offset
    local_sum = jnp.sum(w)
    sums = jax.lax.all_gather(local_sum, axis)  # (P,) scalars
    total = jnp.sum(sums)
    # degenerate total -> uniform weights, as stratified_resample_soa
    w = jnp.where(total > 0, w, jnp.ones_like(w))
    sums = jnp.where(total > 0, sums, jnp.full_like(sums, float(s)))
    total = jnp.where(total > 0, total, jnp.asarray(float(s * p), dtype))
    offsets = jnp.cumsum(sums) - sums  # exclusive prefix, (P,)
    my_offset = offsets[idx]

    # -- 2. global draw grid (replicated key -> no communication)
    eps = jax.random.uniform(key, (n,), dtype)
    scale = n / total
    local_cdf = jnp.cumsum(w) + my_offset  # (S,) global CDF values
    cum_counts = _count_leq(local_cdf * scale, eps, n)  # (S,)
    start_s = _count_leq(my_offset * scale, eps, n)  # scalar
    counts = jnp.diff(cum_counts, prepend=start_s[None]).astype(jnp.int32)

    # -- 3. fill my S output slots from ring neighbours
    out_lo = idx * s  # my output window [out_lo, out_lo + s)
    g = out_lo + jnp.arange(s)
    u = (g.astype(dtype) + eps[g]) / n * total  # my draws' global CDF positions

    out = jnp.zeros_like(bank16)
    filled = jnp.zeros((s,), bool)
    anc_global = jnp.full((s,), -1, jnp.int32)

    deltas = [0] + [d for r in range(1, reach + 1) for d in (-r, r)]
    for delta in deltas:
        src = (idx - delta) % p  # shard whose block arrives here
        if delta == 0:
            nb_bank, nb_cdf = bank16, local_cdf
        else:
            perm = [(i, (i + delta) % p) for i in range(p)]
            nb_bank = jax.lax.ppermute(bank16, axis, perm)
            nb_cdf = jax.lax.ppermute(local_cdf, axis, perm)
        nb_offset = offsets[src]
        nb_sum = sums[src]
        in_span = (u > nb_offset) & (u <= nb_offset + nb_sum)
        # ancestor within the neighbour block: first local_cdf >= u
        local_anc = jnp.clip(
            jnp.searchsorted(nb_cdf, u, side="left", method="sort"), 0, s - 1
        )
        take = in_span & ~filled
        cols = jnp.take(nb_bank, local_anc, axis=1)  # (16, S)
        out = jnp.where(take[None, :], cols, out)
        anc_global = jnp.where(take, (src * s + local_anc).astype(jnp.int32), anc_global)
        filled = filled | take

    # draws beyond the reach: clamp to this shard's heaviest particle
    n_clipped = jnp.sum((~filled).astype(jnp.int32))
    fallback = jnp.argmax(counts)
    out = jnp.where(filled[None, :], out, bank16[:, fallback][:, None])
    clipped_total = jax.lax.psum(n_clipped, axis)

    # -- most-copied particle, globally (for the GN refinement pick)
    local_best = jnp.argmax(counts)
    local_max = counts[local_best]
    all_max = jax.lax.all_gather(local_max, axis)  # (P,)
    all_best = jax.lax.all_gather(local_best, axis)
    winner = jnp.argmax(all_max)
    most = (winner * s + all_best[winner]).astype(jnp.int32)

    return out, counts, most, clipped_total


def make_distributed_resampler(mesh: Mesh, n_particles: int, reach: int = 1, axis: str = "particles"):
    """Build `resample(key, weights, bank16) -> DistResampleOut` running
    the explicit scheme over `mesh`'s `axis`.  Call it inside or outside
    jit; weights (N,) and bank16 (16, N) should be sharded over `axis`.
    """
    body = partial(_resample_shard, n=n_particles, reach=reach, axis=axis)
    spec_w = P(axis)
    spec_b = P(None, axis)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), spec_w, spec_b),
        out_specs=(spec_b, spec_w, P(), P()),
        # `most`/`clipped` are replicated by construction (all_gather/psum
        # over the particles axis); varying-axis inference can't see that
        check_vma=False,
    )

    def resample(key, weights, bank16):
        out, counts, most, clipped = mapped(key, weights, bank16)
        return DistResampleOut(out, counts, most, clipped)

    return resample
