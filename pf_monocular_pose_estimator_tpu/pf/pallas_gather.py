"""Monotone resampling gather as a windowed one-hot MXU matmul.

XLA's gather for `bank[:, ancestors]` pays a 512 B random-access HBM
transaction per particle (the {0,1} layout pads each gathered column to
128 lanes), and its per-element cost COLLAPSES at large N — measured on
v5e: 135 us at N=100k but 6.3 ms at N=1M (6.3 ns/element), ~10x over
the padding floor.  Stratified-resampling ancestors are NON-DECREASING,
which XLA cannot exploit; this kernel does:

  * output block i (B lanes) needs input lanes
    [anc[iB], anc[(i+1)B-1]] — a narrow window because each distinct
    ancestor consumes at least one output slot;
  * the kernel DMAs that (16, W) window HBM->VMEM at a 128-aligned
    start lane (scalar-prefetched; lane tiling demands the alignment)
    and selects the
    B output columns as `window[:, :12] @ onehot(W, B)` on the MXU with
    `Precision.HIGHEST` — a one-hot contraction has exactly one nonzero
    term per output, and the bf16-split passes reconstruct the f32
    value exactly, so the result is BIT-IDENTICAL to the gather
    (pinned by tests/test_pallas_gather.py);
  * sequential reads replace random access: total window traffic is
    ~2x the bank read, streamed.

Coverage: a window covers its block iff anc[(i+1)B-1] - anc[iB] < W.
With healthy resampling the per-block ancestor span is ~B / survivor
fraction (~1.6B); W = 4B covers it with margin.  Degenerate frames
(weight mass on a few far-apart particles) can exceed any fixed W, so
`monotone_gather` wraps the kernel in a `lax.cond` against the measured
per-frame coverage and falls back to the pinned XLA gather
(`tracker/step.py`'s previous path) — same values either way.

Only rows 0-11 are gathered; rows 12-15 are the constant rigid bottom
row (see pf/pallas_step.py::bank_top_pin) and are re-synthesised.

MEASURED NEGATIVE RESULT (round 3, v5e, slope-timed on-device scans) —
kept unwired as evidence, like the closed-form resampler: the MXU pads
the 12-row operand to the 128-wide systolic dimension, so every
contraction does 10.7x its useful FLOPs (flipping the contraction pads
the other operand identically), and Precision.HIGHEST multiplies by
the bf16-split passes.  At N=1M the kernel ties the XLA gather
(7.1-7.3 ms either way, B/W in {256..1024}x{1024..4096}); at N=100k it
LOSES (252-270 us vs 173 us).  The bit-identity, the coverage
fallback and the unaligned->aligned DMA windowing all work (pinned by
tests/test_pallas_gather.py, verified bit-identical on hardware) —
the economics don't: a TPU gather of short columns is bounded by
padding whichever engine touches it, VPU lane-shuffles (no per-lane
dynamic source) and scatter (serialises) included.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_gather_kernel(b: int, w: int):
    def kernel(starts_ref, anc_ref, bank_ref, out_ref, win_ref, sem):
        i = pl.program_id(0)
        # starts are pre-aligned to 128 (the HBM memref's lane tiling);
        # the hint lets Mosaic prove the slice offset divisible
        start = pl.multiple_of(starts_ref[i], 128)
        dma = pltpu.make_async_copy(
            bank_ref.at[:, pl.ds(start, w)], win_ref, sem
        )
        dma.start()

        rel = anc_ref[0, :] - start  # (B,) int32, in [0, W) when covered
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
        dma.wait()
        onehot = (iota_w == rel[None, :]).astype(jnp.float32)  # (W, B)
        out12 = jax.lax.dot_general(
            win_ref[0:12, :],
            onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        out_ref[0:12, :] = out12
        z = jnp.zeros((1, b), jnp.float32)
        out_ref[12:13, :] = z
        out_ref[13:14, :] = z
        out_ref[14:15, :] = z
        out_ref[15:16, :] = z + 1.0

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "window", "interpret"))
def monotone_gather_pallas(
    bank16: jnp.ndarray,
    anc: jnp.ndarray,
    starts: jnp.ndarray,
    block: int = 512,
    window: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """(16, N) bank gathered at non-decreasing `anc` (N,), given
    per-block window starts (cdiv(N, block),) with
    anc[i*block : (i+1)*block] - starts[i] in [0, window) — the caller
    (`monotone_gather`) checks this and falls back otherwise."""
    _, n = bank16.shape
    nb = pl.cdiv(n, block)
    kernel = _make_gather_kernel(block, window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i, s: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # bank stays in HBM
        ],
        out_specs=pl.BlockSpec((16, block), lambda i, s: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((16, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.float32),
        interpret=interpret,
    )(starts, anc.reshape(1, n).astype(jnp.int32), bank16.astype(jnp.float32))


def monotone_gather(
    bank16: jnp.ndarray,
    anc: jnp.ndarray,
    fallback,
    block: int = 512,
    window: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Resampling gather `bank16[:, anc]` for non-decreasing anc:
    windowed MXU kernel when every block's ancestor span fits the
    window, else `fallback(bank16, anc)` (one `lax.cond`, one branch
    executes).  Requires the bank bottom-row invariant (rows 12-15 ==
    (0,0,0,1)); both paths return bit-identical values."""
    _, n = bank16.shape
    nb = -(-n // block)
    # per-block first/last ancestor (strided slices, cheap)
    pad = nb * block - n
    anc_p = jnp.concatenate([anc, jnp.full((pad,), anc[-1], anc.dtype)]) if pad else anc
    firsts = anc_p[::block]
    lasts = anc_p[block - 1 :: block]
    # 128-align window starts (HBM lane tiling); alignment costs at most
    # 127 lanes of effective window
    max_start = jnp.maximum((n - window) // 128 * 128, 0)
    starts = jnp.clip((firsts // 128) * 128, 0, max_start).astype(jnp.int32)
    covered = jnp.all((lasts - starts < window) & (firsts >= starts))
    if n < window:  # tiny banks: the window DMA would run past the array
        return fallback(bank16, anc)
    return jax.lax.cond(
        covered,
        lambda: monotone_gather_pallas(
            bank16, anc, starts, block=block, window=window, interpret=interpret
        ),
        lambda: fallback(bank16, anc),
    )
