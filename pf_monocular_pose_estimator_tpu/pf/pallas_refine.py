"""Batched Gauss-Newton pose refinement as a single Pallas TPU kernel.

Functional parity target: PoseEstimator::optimisePose
(pf_mpe_lib/src/pose_estimator.cpp:1805-2009) — the same math as
`pf.refine.gauss_newton_refine`, which see for the semantics (Eade A.14
Jacobian, left-multiplicative update, divergence guard).

Why a kernel: the XLA version unrolls the iteration body ~25x and every
iteration is ~70 tiny HLO ops (6x6 solve, exp map, 4x4 compose), each
costing ~0.4-0.5 us of TPU issue overhead — ~800 us/frame of pure
dispatch for microseconds of math.  Here the whole refinement (all
hypotheses, all iterations) is ONE dispatch: hypotheses ride the
sublane axis, correspondence pairs ride lanes, and the iteration loop
is an in-kernel `fori_loop` over register-resident state.

Layout:
  * poses     (B, 16) — row-major flattened 4x4 per hypothesis
  * pair data (B, M)  — per-marker bound detection u/v + validity mask
  * scalars   SMEM (1, 8) — fx, fy, cx, cy, tol, max_iter
Outputs: refined poses (B, 16), stats (B, 8) [err0, errF, n_iter,
max_resid, converged, diverged], normal matrix (B, 36) at the final
pose (for the covariance, inverted outside with `refine.inv6_spd`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import Camera
from .refine import RefineResult, inv6_spd

_DAMPING = 1e-8
_EPS_THETA = 1e-8


def _solve6_rows(a, b):
    """Solve the Jacobi-scaled SPD 6x6 system per sublane row.

    a: dict {(i, j): (B, 1)} upper-triangle entries; b: list of 6 (B, 1).
    Mirrors refine.solve6_spd (refine=False) as pure scalar-row algebra.
    """
    s = [jax.lax.rsqrt(jnp.maximum(jnp.abs(a[(i, i)]), 1e-30)) for i in range(6)]

    def ah(i, j):
        i, j = (i, j) if i <= j else (j, i)
        return a[(i, j)] * s[i] * s[j]

    bh = [b[i] * s[i] for i in range(6)]

    # P = ah[0:3,0:3] (symmetric), Q = ah[0:3,3:6], S = ah[3:6,3:6]
    p00, p01, p02 = ah(0, 0), ah(0, 1), ah(0, 2)
    p11, p12, p22 = ah(1, 1), ah(1, 2), ah(2, 2)
    q = [[ah(i, 3 + j) for j in range(3)] for i in range(3)]
    s00, s01, s02 = ah(3, 3), ah(3, 4), ah(3, 5)
    s11, s12, s22 = ah(4, 4), ah(4, 5), ah(5, 5)

    def inv3sym(m00, m01, m02, m11, m12, m22):
        c00 = m11 * m22 - m12 * m12
        c01 = -(m01 * m22 - m12 * m02)
        c02 = m01 * m12 - m11 * m02
        c11 = m00 * m22 - m02 * m02
        c12 = -(m00 * m12 - m01 * m02)
        c22 = m00 * m11 - m01 * m01
        det = m00 * c00 + m01 * c01 + m02 * c02
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        inv = 1.0 / det
        return [
            [c00 * inv, c01 * inv, c02 * inv],
            [c01 * inv, c11 * inv, c12 * inv],
            [c02 * inv, c12 * inv, c22 * inv],
        ]

    pi = inv3sym(p00, p01, p02, p11, p12, p22)
    # W = Q^T @ Pi  (3x3)
    w = [[sum(q[k][i] * pi[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
    # Schur = S - W @ Q (symmetric)
    smat = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]
    sc = [
        [smat[i][j] - sum(w[i][k] * q[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    si = inv3sym(sc[0][0], sc[0][1], sc[0][2], sc[1][1], sc[1][2], sc[2][2])
    b1 = bh[:3]
    b2 = bh[3:]
    rhs2 = [b2[i] - sum(w[i][k] * b1[k] for k in range(3)) for i in range(3)]
    x2 = [sum(si[i][k] * rhs2[k] for k in range(3)) for i in range(3)]
    rhs1 = [b1[i] - sum(q[i][k] * x2[k] for k in range(3)) for i in range(3)]
    x1 = [sum(pi[i][k] * rhs1[k] for k in range(3)) for i in range(3)]
    return [(x1 + x2)[i] * s[i] for i in range(6)]


def _exp_se3_rows(dt):
    """exp map per sublane row: dt = 6 x (B, 1) [rho, omega] ->
    12 x (B, 1) row-major [R | t].  Mirrors geometry.se3.exp_se3."""
    rx, ry, rz, wx, wy, wz = dt
    th2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(jnp.maximum(th2, 0.0))
    small = th2 < _EPS_THETA
    safe_t = jnp.where(small, 1.0, theta)
    sin_t = jnp.sin(safe_t)
    cos_t = jnp.cos(safe_t)
    a = jnp.where(small, 1.0 - th2 / 6.0, sin_t / safe_t)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - cos_t) / jnp.maximum(th2, _EPS_THETA))
    c = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0,
        (safe_t - sin_t) / jnp.maximum(th2 * safe_t, _EPS_THETA),
    )
    wxx, wyy, wzz = wx * wx, wy * wy, wz * wz
    wxy, wxz, wyz = wx * wy, wx * wz, wy * wz
    r00 = 1.0 + b * (wxx - th2)
    r01 = -a * wz + b * wxy
    r02 = a * wy + b * wxz
    r10 = a * wz + b * wxy
    r11 = 1.0 + b * (wyy - th2)
    r12 = -a * wx + b * wyz
    r20 = -a * wy + b * wxz
    r21 = a * wx + b * wyz
    r22 = 1.0 + b * (wzz - th2)
    v00 = 1.0 + c * (wxx - th2)
    v01 = -b * wz + c * wxy
    v02 = b * wy + c * wxz
    v10 = b * wz + c * wxy
    v11 = 1.0 + c * (wyy - th2)
    v12 = -b * wx + c * wyz
    v20 = -b * wy + c * wxz
    v21 = b * wx + c * wyz
    v22 = 1.0 + c * (wzz - th2)
    tx = v00 * rx + v01 * ry + v02 * rz
    ty = v10 * rx + v11 * ry + v12 * rz
    tz = v20 * rx + v21 * ry + v22 * rz
    return [r00, r01, r02, tx, r10, r11, r12, ty, r20, r21, r22, tz]


def _make_gn_kernel(max_iterations: int, tol: float):
    def kernel(scal_ref, pose_ref, mark_ref, du_ref, dv_ref, mask_ref,
               out_pose_ref, stats_ref, amat_ref):
        fx = scal_ref[0, 0]
        fy = scal_ref[0, 1]
        mx = mark_ref[0:1, :]  # (1, M)
        my = mark_ref[1:2, :]
        mz = mark_ref[2:3, :]
        du = du_ref[...]  # (B, M)
        dv = dv_ref[...]
        mask = mask_ref[...]  # (B, M) f32 1/0

        def residuals(p):
            """p: (B, 16) flattened poses -> per-pair residuals/jacobian."""
            def col(i):
                return p[:, i : i + 1]
            pcx = col(0) * mx + col(1) * my + col(2) * mz + col(3)
            pcy = col(4) * mx + col(5) * my + col(6) * mz + col(7)
            pcz = col(8) * mx + col(9) * my + col(10) * mz + col(11)
            z = jnp.where(jnp.abs(pcz) < 1e-12, 1e-12, pcz)
            cx = scal_ref[0, 2]
            cy = scal_ref[0, 3]
            u = fx * pcx / z + cx
            v = fy * pcy / z + cy
            ru = (du - u) * mask
            rv = (dv - v) * mask
            return pcx, pcy, z, ru, rv

        def normal_eqs(p):
            pcx, pcy, z, ru, rv = residuals(p)
            iz = 1.0 / z
            x_z = pcx * iz
            y_z = pcy * iz
            ju = [
                fx * iz,
                jnp.zeros_like(z),
                -fx * x_z * iz,
                -fx * x_z * y_z,
                fx * (1.0 + x_z * x_z),
                -fx * y_z,
            ]
            jv = [
                jnp.zeros_like(z),
                fy * iz,
                -fy * y_z * iz,
                -fy * (1.0 + y_z * y_z),
                fy * x_z * y_z,
                fy * x_z,
            ]
            ju = [j * mask for j in ju]
            jv = [j * mask for j in jv]
            a = {}
            for i in range(6):
                for j in range(i, 6):
                    a[(i, j)] = jnp.sum(
                        ju[i] * ju[j] + jv[i] * jv[j], axis=1, keepdims=True
                    )
            b = [
                jnp.sum(ju[i] * ru + jv[i] * rv, axis=1, keepdims=True)
                for i in range(6)
            ]
            err = jnp.sum(ru * ru + rv * rv, axis=1, keepdims=True)
            return a, b, err, ru, rv

        pose0 = pose_ref[...]  # (B, 16)
        _, _, err0, _, _ = normal_eqs(pose0)

        def body(_, carry):
            # single (B, 18) carry: [pose16 | done | n_iter] — separate
            # (B, 1) carry arrays trip a Mosaic relayout bug (replicated
            # lane layout mismatch at the loop back-edge) on real TPUs
            p = carry[:, :16]
            done = carry[:, 16:17]
            n_iter = carry[:, 17:18]
            a, b, _, _, _ = normal_eqs(p)
            for i in range(6):
                a[(i, i)] = a[(i, i)] + _DAMPING
            dt = _solve6_rows(a, b)
            # NaN/inf scrub (matches refine.py's isfinite guard)
            dt = [jnp.where((d == d) & (jnp.abs(d) < 1e30), d, 0.0) for d in dt]
            e = _exp_se3_rows(dt)

            def col(arr, i):
                return arr[:, i : i + 1]

            # new = E @ P (rotation/translation rows only)
            newcols = []
            for r in range(3):
                er = [e[4 * r + 0], e[4 * r + 1], e[4 * r + 2], e[4 * r + 3]]
                for cc in range(3):
                    newcols.append(
                        er[0] * col(p, cc)
                        + er[1] * col(p, 4 + cc)
                        + er[2] * col(p, 8 + cc)
                    )
                newcols.append(
                    er[0] * col(p, 3) + er[1] * col(p, 7) + er[2] * col(p, 11) + er[3]
                )
            newp = jnp.concatenate(newcols + [col(p, 12), col(p, 13), col(p, 14), col(p, 15)], axis=1)

            step = jnp.abs(dt[0])
            for d in dt[1:]:
                step = jnp.maximum(step, jnp.abs(d))
            now_done = jnp.maximum(done, (step <= tol).astype(p.dtype))
            p = jnp.where(done > 0, p, newp)
            n_iter = n_iter + (1.0 - done)
            return jnp.concatenate([p, now_done, n_iter], axis=1)

        zeros1 = jnp.zeros_like(err0)
        carry0 = jnp.concatenate([pose0, zeros1, zeros1], axis=1)
        carry = jax.lax.fori_loop(0, max_iterations, body, carry0)
        p = carry[:, :16]
        done = carry[:, 16:17]
        n_iter = carry[:, 17:18]

        a_f, _, err_f, ru_f, rv_f = normal_eqs(p)
        resid = jnp.sqrt(ru_f * ru_f + rv_f * rv_f)
        max_resid = jnp.max(resid, axis=1, keepdims=True)
        diverged = (err_f > err0).astype(p.dtype)
        p = jnp.where(diverged > 0, pose0, p)
        err_out = jnp.where(diverged > 0, err0, err_f)

        out_pose_ref[...] = p
        stats = [err0, err_out, n_iter, max_resid, done, diverged,
                 zeros1, zeros1]
        stats_ref[...] = jnp.concatenate(stats, axis=1)
        acols = []
        for i in range(6):
            for j in range(6):
                ii, jj = (i, j) if i <= j else (j, i)
                acols.append(a_f[(ii, jj)])
        amat_ref[...] = jnp.concatenate(acols, axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "convergence_tol", "interpret")
)
def gauss_newton_refine_pallas(
    camera: Camera,
    poses0: jnp.ndarray,  # (B, 4, 4)
    markers_h: jnp.ndarray,  # (M, 4)
    det_xy: jnp.ndarray,  # (K, 2)
    dfm: jnp.ndarray,  # (B, M) int32 detection index per marker, -1 unbound
    corr_mask: jnp.ndarray,  # (B, M) bool
    max_iterations: int = 25,
    convergence_tol: float = 1e-4,
    interpret: bool = False,
) -> RefineResult:
    """Drop-in batched replacement for vmapped `gauss_newton_refine`
    when correspondences are per-marker detection bindings."""
    f32 = jnp.float32
    b, _ = dfm.shape
    m = markers_h.shape[0]
    b_pad = max(8, ((b + 7) // 8) * 8)

    poses_flat = poses0.reshape(b, 16).astype(f32)
    poses_flat = jnp.pad(poses_flat, ((0, b_pad - b), (0, 0)))
    mark = jnp.concatenate(
        [markers_h[:, :3].T.astype(f32), jnp.zeros((5, m), f32)], axis=0
    )  # (8, M) rows [mx, my, mz, 0...]
    d_idx = jnp.clip(dfm, 0, det_xy.shape[0] - 1)
    du = jnp.take(det_xy[:, 0], d_idx, axis=0).astype(f32)
    dv = jnp.take(det_xy[:, 1], d_idx, axis=0).astype(f32)
    maskf = corr_mask.astype(f32)
    du = jnp.pad(du, ((0, b_pad - b), (0, 0)))
    dv = jnp.pad(dv, ((0, b_pad - b), (0, 0)))
    maskf = jnp.pad(maskf, ((0, b_pad - b), (0, 0)))
    scal = jnp.stack(
        [
            camera.fx.astype(f32),
            camera.fy.astype(f32),
            camera.cx.astype(f32),
            camera.cy.astype(f32),
            jnp.zeros((), f32),
            jnp.zeros((), f32),
            jnp.zeros((), f32),
            jnp.zeros((), f32),
        ]
    ).reshape(1, 8)

    kernel = _make_gn_kernel(max_iterations, convergence_tol)
    space = pl.ANY if interpret else pltpu.VMEM
    smem = pltpu.SMEM
    out_pose, stats, amat = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 16), f32),
            jax.ShapeDtypeStruct((b_pad, 8), f32),
            jax.ShapeDtypeStruct((b_pad, 36), f32),
        ],
        in_specs=[
            pl.BlockSpec((1, 8), lambda: (0, 0), memory_space=smem),
            pl.BlockSpec((b_pad, 16), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((8, m), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((b_pad, m), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((b_pad, m), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((b_pad, m), lambda: (0, 0), memory_space=space),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, 16), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((b_pad, 8), lambda: (0, 0), memory_space=space),
            pl.BlockSpec((b_pad, 36), lambda: (0, 0), memory_space=space),
        ],
        interpret=interpret,
    )(scal, poses_flat, mark, du, dv, maskf)

    out_pose = out_pose[:b].reshape(b, 4, 4)
    stats = stats[:b]
    a_mat = amat[:b].reshape(b, 6, 6)
    eye = jnp.eye(6, dtype=f32) * _DAMPING
    cov = jax.vmap(lambda a: inv6_spd(a + eye))(a_mat)
    dtype = poses0.dtype
    return RefineResult(
        pose=out_pose.astype(dtype),
        covariance=cov.astype(dtype),
        num_iterations=stats[:, 2].astype(jnp.int32),
        final_error=stats[:, 1].astype(dtype),
        initial_error=stats[:, 0].astype(dtype),
        converged=stats[:, 4] > 0,
        max_residual=stats[:, 3].astype(dtype),
    )
