"""Pallas TPU kernel for the PF weight function — the per-frame hot loop.

`pf.soa.weight_particles_soa` (the XLA twin of the reference's
`calculateEstimationProbability`, pose_estimator.cpp:2385-2445) builds a
(K·M, N) squared-distance volume in HBM and sweeps it M times for the
greedy marker↔detection matching: at N=100k / K=16 / M=5 that is ~32 MB
live and ~400 MB of HBM traffic per PF iteration — the largest single
slice of the tracker's frame time, all of it memory-bound elementwise
work.

This kernel runs the whole weight function VMEM-resident over lane
chunks of the SoA bank: projection, the (K·M, C) distance block, the
M-step greedy matching with reuse/downgrade penalties, and the score
accumulation never leave VMEM.  Per chunk the only HBM traffic is the
(16, C) bank block in and the (1+2M+1, C) results out (~7 MB/frame
total at 100k particles instead of ~400 MB).

Semantics match `weight_particles_soa` exactly except argmin tie order:
the XLA path flattens the distance volume detection-major (k·M + m),
this kernel marker-major (m·K + k, so each marker's K detection rows
form one aligned VMEM block).  Ties at *different* distances cannot
occur (float equality), masked-out cells never win (both sides mask
with huge sentinels and gate on `d <= tol`), so the orders only diverge
when two real (detection, marker) cells have bit-identical distances —
measure-zero; pinned by tests/test_pallas_weight.py equivalence sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import Camera

_BIG = 3.0e37  # distance sentinel for invalid cells (~finfo.max/4, f32)


def _weight_from_rows(m_cap, k_cap, scal_ref, mark_ref, det_ref, detmask_ref,
                      downg_ref, rows, w_ref, pairs_ref, ncorr_ref,
                      dist2_ref, used_ref):
    """Greedy weight computation over the first 12 flat16 pose rows
    (`rows`, each a (1, C) value); shared by the standalone weight
    kernel and the fused propagate+weight kernel (pallas_step.py)."""
    km = m_cap * k_cap
    fx = scal_ref[0, 0]
    fy = scal_ref[0, 1]
    cx = scal_ref[0, 2]
    cy = scal_ref[0, 3]
    tol_pf = scal_ref[0, 4]
    tol_init = scal_ref[0, 5]
    nms = scal_ref[0, 6]  # num_markers_score

    c = rows[0].shape[1]
    r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11 = rows

    detx = det_ref[:, 0:1]  # (K, 1)
    dety = det_ref[:, 1:2]
    det_big = detmask_ref[:, 0:1]  # (K, 1): 0 valid, _BIG invalid

    # distance volume, marker-major: rows m*K..m*K+K-1 = marker m
    for m in range(m_cap):
        mx = mark_ref[0, 3 * m + 0]
        my = mark_ref[0, 3 * m + 1]
        mz = mark_ref[0, 3 * m + 2]
        mbig = mark_ref[0, 3 * m_cap + m]  # 0 valid / _BIG masked marker
        xc = r0 * mx + r1 * my + r2 * mz + r3
        yc = r4 * mx + r5 * my + r6 * mz + r7
        zc = r8 * mx + r9 * my + r10 * mz + r11
        safe_z = jnp.where(jnp.abs(zc) < 1e-12, 1e-12, zc)
        u = fx * xc / safe_z + cx  # (1, C)
        v = fy * yc / safe_z + cy
        du = detx - u  # (K, C) broadcast
        dv = dety - v
        dist2_ref[pl.ds(m * k_cap, k_cap), :] = du * du + dv * dv + det_big + mbig

    _greedy_match(m_cap, k_cap, scal_ref, downg_ref, c, w_ref, pairs_ref,
                  ncorr_ref, dist2_ref, used_ref)


def _greedy_match(m_cap, k_cap, scal_ref, downg_ref, c, w_ref, pairs_ref,
                  ncorr_ref, dist2_ref, used_ref):
    km = m_cap * k_cap
    tol_pf = scal_ref[0, 4]
    tol_init = scal_ref[0, 5]
    nms = scal_ref[0, 6]

    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (km, c), 0)
    m_of_row = iota_rows // k_cap
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k_cap, c), 0)

    weights = jnp.zeros((1, c), jnp.float32)
    ncorr = jnp.zeros((1, c), jnp.int32)
    nself = jnp.ones((1, c), jnp.float32)
    done = jnp.zeros((1, c), jnp.bool_)
    used_ref[:] = jnp.zeros((k_cap, c), jnp.float32)

    for step in range(m_cap):
        d2 = dist2_ref[:]  # (KM, C)
        minv = jnp.min(d2, axis=0, keepdims=True)  # (1, C)
        idx = jnp.min(
            jnp.where(d2 == minv, iota_rows, km), axis=0, keepdims=True
        )  # (1, C) first-minimum row id
        m_sel = idx // k_cap
        k_sel = idx - m_sel * k_cap
        d = jnp.sqrt(jnp.maximum(minv, 0.0))
        ok = (d <= tol_pf) & (~done)
        done = done | (~ok)

        score = nms + ((tol_init - d) / tol_init) ** 2
        used = used_ref[:]
        sel_onehot = k_iota == k_sel  # (K, C)
        reused = (
            jnp.max(jnp.where(sel_onehot, used, 0.0), axis=0, keepdims=True)
            > 0.0
        )
        occ_hit = ok & reused
        penal_occ = jnp.where(occ_hit, 3.0 * nself, 0.0)
        nself = nself + jnp.where(occ_hit, 1.0, 0.0)

        dpen = jnp.zeros((1, c), jnp.float32)
        for m in range(m_cap):
            dpen = dpen + jnp.where(m_sel == m, downg_ref[0, m], 0.0)
        penal_down = jnp.where(ok, dpen, 0.0)

        weights = weights + jnp.where(ok, score, 0.0) - penal_occ - penal_down
        ncorr = ncorr + ok.astype(jnp.int32)
        if pairs_ref is not None:
            pairs_ref[2 * step : 2 * step + 1, :] = jnp.where(ok, m_sel, -1)
            pairs_ref[2 * step + 1 : 2 * step + 2, :] = jnp.where(ok, k_sel, -1)
        used_ref[:] = used + jnp.where(sel_onehot & ok, 1.0, 0.0)
        # retire the matched marker's K rows (only where a pair formed)
        dist2_ref[:] = jnp.where((m_of_row == m_sel) & ok, _BIG, d2)

    w_ref[:] = weights
    if ncorr_ref is not None:
        ncorr_ref[:] = ncorr


def _make_weight_kernel(m_cap: int, k_cap: int):
    def kernel(scal_ref, mark_ref, det_ref, detmask_ref, downg_ref,
               bank_ref, w_ref, pairs_ref, ncorr_ref, dist2_ref, used_ref):
        rows = [bank_ref[i : i + 1, :] for i in range(12)]
        _weight_from_rows(m_cap, k_cap, scal_ref, mark_ref, det_ref,
                          detmask_ref, downg_ref, rows, w_ref, pairs_ref,
                          ncorr_ref, dist2_ref, used_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def weight_particles_pallas(
    camera: Camera,
    bank16: jnp.ndarray,
    markers_h: jnp.ndarray,
    marker_mask: jnp.ndarray,
    det_xy: jnp.ndarray,
    det_mask: jnp.ndarray,
    tol_pf,
    tol_init,
    downgrade: jnp.ndarray,
    num_markers_score=None,
    block: int = 8192,
    interpret: bool = False,
):
    """Drop-in twin of `pf.soa.weight_particles_soa` (same signature tail,
    same returns: weights (N,), pairs_soa (M, 2, N) i32, n_corr (N,)),
    computed by the fused Pallas kernel.  Tolerances / downgrade /
    num_markers_score are traced operands (runtime-tunable, no
    recompile).  Reference: pose_estimator.cpp:2385-2445."""
    m_cap = markers_h.shape[0]
    k_cap = det_xy.shape[0]
    n = bank16.shape[1]
    f32 = jnp.float32

    if num_markers_score is None:
        num_markers_score = jnp.sum(marker_mask.astype(f32))

    scal = jnp.stack(
        [
            jnp.asarray(camera.fx, f32),
            jnp.asarray(camera.fy, f32),
            jnp.asarray(camera.cx, f32),
            jnp.asarray(camera.cy, f32),
            jnp.asarray(tol_pf, f32),
            jnp.asarray(tol_init, f32),
            jnp.asarray(num_markers_score, f32),
            jnp.asarray(0.0, f32),
        ]
    ).reshape(1, 8)
    # markers packed [x0 y0 z0 x1 y1 z1 ... | mask0.._BIG..] in SMEM
    mark = jnp.concatenate(
        [
            markers_h[:, :3].reshape(-1).astype(f32),
            jnp.where(marker_mask, 0.0, _BIG).astype(f32),
        ]
    ).reshape(1, 4 * m_cap)
    det = det_xy.astype(f32)  # (K, 2) VMEM
    detmask = jnp.where(det_mask, 0.0, _BIG).astype(f32).reshape(k_cap, 1)
    downg = jnp.where(downgrade, 2.0, 0.0).astype(f32).reshape(1, m_cap)

    # never use a block wider than the (lane-aligned) bank: a small bank
    # (e.g. the 4k compile-check config) then runs as exactly one block
    block = min(block, ((n + 127) // 128) * 128)
    kernel = _make_weight_kernel(m_cap, k_cap)
    grid = (pl.cdiv(n, block),)
    space = pl.ANY if interpret else pltpu.VMEM
    w, pairs2, ncorr = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), f32),
            jax.ShapeDtypeStruct((2 * m_cap, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * m_cap), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k_cap, 2), lambda i: (0, 0), memory_space=space),
            pl.BlockSpec((k_cap, 1), lambda i: (0, 0), memory_space=space),
            pl.BlockSpec((1, m_cap), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block), lambda i: (0, i), memory_space=space),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=space),
            pl.BlockSpec((2 * m_cap, block), lambda i: (0, i), memory_space=space),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=space),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_cap * k_cap, block), f32),
            pltpu.VMEM((k_cap, block), f32),
        ],
        interpret=interpret,
    )(scal, mark, det, detmask, downg, bank16.astype(f32))

    pairs_soa = pairs2.reshape(m_cap, 2, n)
    return w[0], pairs_soa, ncorr[0]
