"""Sort-free stratified resampling: probe ranks + a Pallas decode kernel.

OPT-IN fast path (`TrackerConfig.use_pallas_resample`, default OFF):
measured ~190 us vs ~520 us for the default sort+gather at N=100k on
v5e when the decode windows cover the weight profile — but production
steady-state weights (~40% zero lanes after the tolerance gate)
concentrate enough that blocks overflow the window and the built-in
`lax.cond` fallback runs the sort path anyway, so the default stays the
sort scheme (the honest negative result; commit 19b7089).  When
enabled, it replaces the two 2N-element sorts and the serialised XLA
bank gather of `pf.soa.stratified_resample_soa` + `jnp.take` (together
~520 us/frame at N=100k on v5e, ~38% of the tracked frame) with:

  1. **Probe-rank pre-pass (XLA, ~35 us).**  The normalised CDF is built
     with the SAME fixed-association chunked Hillis-Steele summation as
     the distributed resampler (`parallel.resample._resample_shard`
     step 1 at P=1, chunk = `_auto_chunk(n, 1)`), and the closed-form
     grid inversion (`parallel.resample._count_leq_norm`) turns it into
     `rank[j] = #{draws u_t <= cdf[j]}` with six elementwise threefry
     probes — no sort, no scatter, no gather (the round-2/3 negative
     results: XLA TPU scatter serialises at 857 us per N-scatter, and
     every scatter-free inversion used to need another sort).  A final
     seam repair (chunk-boundary prefix-max, the association-compatible
     replacement for a full `cummax`) removes the +-1 ulp rank pockets
     chunk-prefix seams can introduce (the merge-sort path repaired
     them implicitly by value-sorting the CDF).  Because the
     association is fixed by (n, chunk) alone, the assignment is THE
     SAME canonical map the distributed resampler computes — slot t
     takes the first CDF entry >= u_t — so single-chip and mesh-sharded
     runs resample identically.

  2. **Windowed decode kernel (Pallas, one pass over the bank).**  The
     inverse map `anc[t] = #{j : rank[j] <= t}` is monotone, so the
     ancestors of output block [bB, bB+B) live in a narrow input window.
     The window is placed at 128-lane granularity: its start chunk is
     exactly the chunk holding the block's FIRST ancestor (a count of
     chunk-boundary ranks <= bB, done in the XLA pre-pass and
     scalar-prefetched into per-chunk (16, 128) BlockSpec index maps —
     the windows auto-pipeline, and Pallas pads partial edge blocks
     safely).  Tight placement means a 12-chunk (1536-lane) window
     suffices for a 1024-slot output block (~50% consumption slack) vs
     the 24-chunk window a block-granular start needs — half the
     gather/select work and half the window DMA traffic.  Each output's
     ancestor is found by a per-chunk 7-step bisection over the f32
     rank chunk (all probes of a lane stay inside its own straddling
     chunk), and the bank columns are pulled with Mosaic's per-sublane
     in-vreg dynamic gather (`jnp.take_along_axis` on (8, 128) vregs —
     8 bank rows per op; the capability round 3's one-hot-MXU gather
     concluded didn't exist).  Everything is branch-free; a per-block
     coverage flag feeds one `lax.cond` that falls back to the
     sort+gather path on pathological weight concentration (a block
     consuming > window-tolerance inputs), so results are defined for
     ANY weights.  (A chunk-skipping variant with `pl.when` over the
     active chunk range measured 4x SLOWER — ~40 cycles per scf.if
     region x 216 regions/step — so the chains stay straight-line.)

Reference: the resampling loop at pose_estimator.cpp:668-682 (the
reference's O(N^2) scan, run serially per frame); this module is the
TPU-native inverse-CDF formulation of the same stratified scheme.

Bit-exactness: the gathered columns are exact copies (dyn-gather moves
bits); the assignment agrees with `stratified_resample_soa` everywhere
except measure-zero ulp pockets of the differing CDF associations
(pinned with the same tolerance class as the closed-form resampler in
tests/test_pallas_resample.py), and agrees with the distributed
resampler's canonical map exactly by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..parallel.resample import _auto_chunk, _count_leq_norm, _hillis_steele

# rank values are < 2^22 (the probe-exactness bound), exact in f32; the
# mask sentinel must exceed any valid rank AND any valid output index
# (Python float: a jnp constant would be captured by the kernel closure)
_BIG_RANK = float(1 << 23)


def _rep8(row):
    """(1, 128) -> (8, 128) sublane replication.  Spelled as a
    concatenate: Mosaic lowers it next to the dynamic gather, where a
    plain `broadcast_to` hits an unsupported replicated->dense relayout
    ("Invalid input layout" on v5e), and it also runs under
    interpret=True, unlike `pltpu.repeat`."""
    return jnp.concatenate([row] * 8, axis=0)


def _make_decode_kernel(block: int, win_chunks: int, n: int):
    w = win_chunks * 128
    groups = block // 128

    def kernel(q_ref, bnd_ref, *refs):
        rank_refs = refs[:win_chunks]
        bank_refs = refs[win_chunks : 2 * win_chunks]
        out_ref = refs[2 * win_chunks]
        ok_ref = refs[2 * win_chunks + 1]
        b = pl.program_id(0)
        base = q_ref[b] * 128  # global lane of the window's first entry
        tbase = b * block  # first output slot of this block

        # ---- src[t] = #{j in window : rank[j] <= T[t]} (rank monotone
        # after the pre-pass seam repair; all j below the window have
        # rank <= tbase by construction of the start chunk).  Two
        # levels:
        #   1. coarse straddling-chunk count against the chunk-LAST
        #      boundary values (scalar-prefetched i32, exact in f32:
        #      ranks < 2^22, sentinel 2^23);
        #   2. 7-step bisection within the straddling chunk (all probes
        #      of a lane provably stay inside it: posc starts at 0 and
        #      the step sum is 127). ----
        t_out = (
            tbase
            + 128 * jax.lax.broadcasted_iota(jnp.int32, (groups, 128), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (groups, 128), 1)
        ).astype(jnp.float32)
        coarse = jnp.zeros((groups, 128), jnp.int32)
        for c in range(win_chunks):
            bnd = bnd_ref[b * win_chunks + c].astype(jnp.float32)
            coarse = coarse + (bnd <= t_out).astype(jnp.int32)
        cs = jnp.minimum(coarse, win_chunks - 1)  # straddling chunk
        full = coarse >= win_chunks  # every chunk-last <= T: src = w

        del base  # window placement is fully encoded in the BlockSpecs;
        # the rank row arrives pre-padded with _BIG_RANK past n, so no
        # per-chunk lane masking is needed in-kernel
        pos = jnp.zeros((groups, 128), jnp.int32)
        for c in range(win_chunks):
            tab = _rep8(rank_refs[c][0:1, :])
            posc = jnp.zeros((groups, 128), jnp.int32)
            for s in range(6, -1, -1):
                stp = 1 << s
                val = jnp.take_along_axis(tab, posc + stp - 1, axis=1)
                posc = jnp.where(val <= t_out, posc + stp, posc)
            pos = jnp.where(cs == c, c * 128 + posc, pos)

        pos = jnp.where(full, w, pos)
        src = jnp.minimum(pos, w - 1)  # clamp only bites when uncovered

        # ---- coverage flag: the window must contain a rank beyond this
        # block's last valid output slot.  rank is monotone and masked
        # lanes (all at the tail) carry _BIG_RANK, so the window max IS
        # the last chunk's boundary value ----
        t_last = jnp.minimum(tbase + block, n) - 1
        ok_ref[0, b] = (
            bnd_ref[b * win_chunks + win_chunks - 1] > t_last
        ).astype(jnp.int32)

        # ---- bank gather: per 128-lane output group, 8 rows per op ----
        for g in range(groups):
            idx8 = _rep8(src[g : g + 1, :])
            cc = idx8 >> 7
            cr = idx8 & 127
            acc_lo = None
            acc_hi = None
            for c in range(win_chunks):
                br = bank_refs[c]
                glo = jnp.take_along_axis(br[0:8, :], cr, axis=1)
                ghi = jnp.take_along_axis(br[8:16, :], cr, axis=1)
                if acc_lo is None:
                    acc_lo, acc_hi = glo, ghi
                else:
                    hit = cc == c
                    acc_lo = jnp.where(hit, glo, acc_lo)
                    acc_hi = jnp.where(hit, ghi, acc_hi)
            out_ref[0:8, g * 128 : (g + 1) * 128] = acc_lo
            out_ref[8:16, g * 128 : (g + 1) * 128] = acc_hi

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block", "win_chunks", "interpret")
)
def _decode_pallas(rank_pad_f32, bank16, q128, bnd, block, win_chunks,
                   interpret=False):
    """rank_pad_f32: (nb128*128,) rank row padded to a 128 multiple with
    `_BIG_RANK` (so the kernel needs no lane masking)."""
    _, n = bank16.shape
    nb = pl.cdiv(n, block)
    kernel = _make_decode_kernel(block, win_chunks, n)
    rank_row = rank_pad_f32.reshape(1, -1)
    rank_specs = [
        pl.BlockSpec(
            (1, 128), (lambda c: (lambda i, s, bb: (0, s[i] + c)))(c)
        )
        for c in range(win_chunks)
    ]
    bank_specs = [
        pl.BlockSpec(
            (16, 128), (lambda c: (lambda i, s, bb: (0, s[i] + c)))(c)
        )
        for c in range(win_chunks)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=rank_specs + bank_specs,
        out_specs=[
            pl.BlockSpec((16, block), lambda i, s, bb: (0, i)),
            # single revisited SMEM block: every grid step writes its own
            # flag slot; Pallas keeps the block resident across steps
            pl.BlockSpec(
                (1, nb), lambda i, s, bb: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
    )
    out, ok = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, n), jnp.float32),
            jax.ShapeDtypeStruct((1, nb), jnp.int32),
        ],
        interpret=interpret,
    )(
        q128,
        bnd.reshape(-1),
        *([rank_row] * win_chunks),
        *([bank16.astype(jnp.float32)] * win_chunks),
    )
    return out, ok


def probe_rank(key, weights):
    """Fixed-association rank (the distributed resampler's canonical
    assignment at P=1): rank[j] = #{stratified draws u_t <= cdf[j]},
    monotone after the seam repair.  Returns (rank i32 (N,), counts
    i32 (N,), most i32 scalar)."""
    n = weights.shape[0]
    chunk = _auto_chunk(n, 1)
    total0 = jnp.sum(weights)
    w = jnp.where(total0 > 0, weights, jnp.ones_like(weights))
    within = _hillis_steele(w.reshape(n // chunk, chunk))
    chunk_sums = within[:, -1]
    prefix_incl = _hillis_steele(chunk_sums)
    total = prefix_incl[-1]
    prefix_excl = jnp.concatenate(
        [jnp.zeros((1,), w.dtype), prefix_incl[:-1]]
    )
    cdf_n = ((prefix_excl[:, None] + within) / total).reshape(n)
    rank2 = _count_leq_norm(cdf_n, key, n).reshape(n // chunk, chunk)
    # seam repair: the CDF is monotone WITHIN a chunk (inclusive
    # Hillis-Steele of non-negative terms) but the prefix offsets can
    # disagree by an ulp ACROSS chunk seams; a prefix-max of the
    # chunk-boundary ranks fixes every pocket a full `cummax` would
    # (and costs ~2 us instead of an 18 us reduce-window at 100k)
    boundary_max = jax.lax.cummax(rank2[:, -1])
    floor_ = jnp.concatenate(
        [jnp.zeros((1,), rank2.dtype), boundary_max[:-1]]
    )
    rank = jnp.maximum(rank2, floor_[:, None]).reshape(n)
    counts = jnp.diff(rank, prepend=jnp.zeros((1,), jnp.int32))
    most = jnp.argmax(counts).astype(jnp.int32)
    return rank, counts, most


def resample_bank_pallas(
    key,
    weights,
    bank16,
    fallback,
    block: int = 1024,
    win_chunks: int = 12,
    interpret: bool = False,
):
    """Stratified resampling of a (16, N) bank: returns
    (resampled16, most).  `fallback(key, weights, bank16) ->
    (resampled16, most)` runs instead (one lax.cond, one branch
    executes) when a window cannot cover its output block — weight
    concentration such that some `block` consecutive output slots
    consume more than ~`win_chunks*128 - 128` ancestors.

    The fast path needs chunked CDF divisibility and the probe bound;
    otherwise the fallback is returned unconditionally."""
    n = weights.shape[0]
    chunk = _auto_chunk(n, 1)
    if (
        n < win_chunks * 128
        or n < block
        or n % chunk != 0
        or not (8 <= n <= (1 << 22))
    ):
        return fallback(key, weights, bank16)

    rank, counts, most = probe_rank(key, weights)

    nb = -(-n // block)
    nb128 = -(-n // 128)
    pad = nb128 * 128 - n
    # pad with the sentinel: the kernel gathers the padded row directly,
    # with no per-lane masking (pad lanes read as _BIG_RANK > any slot)
    rank_p = (
        jnp.concatenate(
            [rank, jnp.full((pad,), int(_BIG_RANK), rank.dtype)]
        )
        if pad
        else rank
    )
    rank_pad_f32 = rank_p.astype(jnp.float32)
    # last rank per 128-lane chunk (contiguous reshape, no stride)
    rank128 = rank_p.reshape(nb128, 128)[:, -1]
    # window start chunk = #chunks wholly consumed before slot b*block:
    # rank128[c] <= t0 means every lane of chunk c has rank <= t0, so
    # the block's first ancestor sits at or after chunk c0 — and
    # rank[(c0)*128 - 1] <= t0 makes the in-window count exact
    t0 = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    c0 = jnp.sum((rank128[None, :] <= t0).astype(jnp.int32), axis=1)
    q128 = jnp.clip(c0, 0, nb128 - win_chunks).astype(jnp.int32)

    # per-(block, chunk) boundary values: rank at each window chunk's
    # last lane, _BIG_RANK once the lane runs past n — must match the
    # kernel's in-tab masking bit-for-bit (same literal, same ranks)
    cidx = q128[:, None] + jnp.arange(win_chunks, dtype=jnp.int32)[None, :]
    lane_last = cidx * 128 + 127
    bnd = jnp.where(
        lane_last < n,
        jnp.take(rank128, jnp.minimum(cidx, nb128 - 1)),
        jnp.int32(int(_BIG_RANK)),
    ).astype(jnp.int32)  # (nb, win_chunks); exact in f32 (< 2^23)

    out, ok = _decode_pallas(
        rank_pad_f32, bank16, q128, bnd, block=block, win_chunks=win_chunks,
        interpret=interpret,
    )
    covered = jnp.all(ok == 1)
    return jax.lax.cond(
        covered,
        lambda: (out, most),
        lambda: fallback(key, weights, bank16),
    )
