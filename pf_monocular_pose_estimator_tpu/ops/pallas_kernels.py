"""Pallas TPU kernels for the detection front-end.

SURVEY.md §2 mandates Pallas image kernels for the reference's OpenCV
threshold/blur pipeline (led_detector.cpp:57-67).  The whole 752x480
frame fits in VMEM (~1.4 MB of f32 against ~16 MB), so the kernel runs as
a single program: threshold (TOZERO / BINARY_INV), ROI mask and the
separable Gaussian blur execute in one pass with no HBM round-trips
between stages — one 1.4 MB read, one 1.4 MB write.

Boundary handling: the blur uses zero padding at the frame border instead
of the reference's reflect-101 (OpenCV BORDER_DEFAULT).  The two differ
only within `kernel//2` pixels of the border; LED blobs there are clipped
anyway, and the pure-JAX fallback (`ops.blob._blur`) keeps exact reflect
semantics for parity testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blob import _gaussian_kernel_1d


def _shift2d(x, dy: int, dx: int):
    """Shift a 2D array by (dy, dx) with zero fill, static offsets."""
    h, w = x.shape
    out = x
    if dy:
        if dy > 0:
            out = jnp.concatenate([jnp.zeros((dy, w), x.dtype), out[:-dy]], axis=0)
        else:
            out = jnp.concatenate([out[-dy:], jnp.zeros((-dy, w), x.dtype)], axis=0)
    if dx:
        if dx > 0:
            out = jnp.concatenate([jnp.zeros((h, dx), x.dtype), out[:, :-dx]], axis=1)
        else:
            out = jnp.concatenate([out[:, -dx:], jnp.zeros((h, -dx), x.dtype)], axis=1)
    return out


def _make_kernel(taps: np.ndarray, active: bool):
    half = taps.size // 2

    def kernel(img_ref, roi_ref, out_ref):
        img = img_ref[:]
        h, w = img.shape
        # Mosaic requires integer iota; convert after.
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
        x0 = roi_ref[0, 0]
        y0 = roi_ref[0, 1]
        rw = roi_ref[0, 2]
        rh = roi_ref[0, 3]
        in_roi = (xs >= x0) & (xs < x0 + rw) & (ys >= y0) & (ys < y0 + rh)
        thr = roi_ref[0, 4]  # traced (dynamic_reconfigure tier, cfg:12)
        if active:
            tz = jnp.where(img > thr, img, 0.0)  # THRESH_TOZERO
        else:
            tz = jnp.where(img > thr, 0.0, 255.0)  # THRESH_BINARY_INV
        tz = jnp.where(in_roi, tz, 0.0)

        # separable blur: rows then columns, unrolled static taps
        acc = jnp.zeros_like(tz)
        for i, t in enumerate(taps.tolist()):
            acc = acc + jnp.float32(t) * _shift2d(tz, i - half, 0)
        out = jnp.zeros_like(acc)
        for i, t in enumerate(taps.tolist()):
            out = out + jnp.float32(t) * _shift2d(acc, 0, i - half)
        out_ref[:] = out

    return kernel


def _make_detect_kernel(taps: np.ndarray, active: bool, sweeps: int,
                        second_moments: bool = True, topk: int = 0):
    """Fused detection front-end: threshold -> blur -> connected-component
    label propagation -> per-label moment/bbox accumulation, one VMEM pass.

    Replaces the XLA chain of 12 reduce_window sweeps + a (K, H*W)
    membership matmul + 4 masked min/max bbox reductions
    (ops/blob.py:189-247) with register-resident shifts: the reference's
    findContours + cv::moments equivalent (led_detector.cpp:72-94) as a
    single Pallas program.

    Moment trick: at each candidate root pixel p, component moments are
    windowed same-label sums over offsets d in [-2*sweeps..0]x[-2s..2s]
    (row-major max-label roots are bottom-right, so dy <= 0):
        area  = sum [lab(p+d) == lab(p)]
        m10   = x_p * area + sum [same] * dx      (x(p+d) = x_p + dx)
    so only count / sum(dx) / sum(dy) / bbox extrema accumulate — no
    per-label gather or matmul anywhere.
    """
    half = taps.size // 2
    # A label value propagates at most 1 pixel per sweep from the pixel
    # that owns it, so every pixel carrying label L sits within Chebyshev
    # distance `sweeps` of L's root — converged or not.  The moment
    # window therefore needs reach == sweeps exactly (2*sweeps would
    # quadruple the accumulation loop for nothing).
    reach = sweeps

    def kernel(img_ref, roi_ref, lab_ref, cnt_ref, sx_ref, sy_ref,
               xmin_ref, xmax_ref, ymin_ref, ymax_ref,
               *rest_refs):
        if second_moments:
            sxx_ref, syy_ref, sxy_ref = rest_refs[:3]
            rest_refs = rest_refs[3:]
        if topk:
            (topk_ref,) = rest_refs
        img = img_ref[:]
        h, w = img.shape
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
        x0 = roi_ref[0, 0]
        y0 = roi_ref[0, 1]
        rw = roi_ref[0, 2]
        rh = roi_ref[0, 3]
        in_roi = (xs >= x0) & (xs < x0 + rw) & (ys >= y0) & (ys < y0 + rh)
        thr = roi_ref[0, 4]  # traced (dynamic_reconfigure tier, cfg:12)
        if active:
            tz = jnp.where(img > thr, img, 0.0)
        else:
            tz = jnp.where(img > thr, 0.0, 255.0)
        tz = jnp.where(in_roi, tz, 0.0)

        acc = jnp.zeros_like(tz)
        for i, t in enumerate(taps.tolist()):
            acc = acc + jnp.float32(t) * _shift2d(tz, i - half, 0)
        blurred = jnp.zeros_like(acc)
        for i, t in enumerate(taps.tolist()):
            blurred = blurred + jnp.float32(t) * _shift2d(acc, 0, i - half)

        fg = blurred > jnp.float32(1e-3)
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            + 1
        )
        lab = jnp.where(fg, flat, 0)
        for _ in range(sweeps):
            # separable 3x3 max: max over rows of the row-wise max
            mx = jnp.maximum(lab, jnp.maximum(_shift2d(lab, 0, 1), _shift2d(lab, 0, -1)))
            m = jnp.maximum(mx, jnp.maximum(_shift2d(mx, 1, 0), _shift2d(mx, -1, 0)))
            lab = jnp.where(fg, m, 0)

        # Bias background labels to unique negatives so same-component
        # tests are a single compare (no `& lab > 0`): background pixels
        # never match each other (distinct negatives), never match
        # foreground (positive), and zero-filled shift borders (0) match
        # nothing.
        lab_b = jnp.where(fg, lab, -(flat))

        # Windowed same-label accumulation via dynamic rolls inside
        # fori_loops (unrolling the (reach+1)x(2*reach+1) window would
        # emit ~10k ops and blow up Mosaic compile time).  Rolls wrap,
        # but a wrapped-in pixel carries a biased label from a different
        # position, so the single-compare equality rejects it.
        zeros = jnp.zeros((h, w), jnp.float32)
        init = (zeros, zeros, zeros)
        if second_moments:
            init = init + (zeros, zeros, zeros)

        # The dy loop stays dynamic but the dx sweep is UNROLLED with
        # static rolls, and the dy-dependent coefficients are factored
        # out: the row pass accumulates only Sum(same), Sum(dx*same)
        # [, Sum(dx^2*same)], which the dy level folds into the six
        # global accumulators with scalar fdy coefficients.  Per window
        # row that is (2r+1) x (roll + eq + 2-3 FMA) + a handful of
        # row-level FMAs — ~2.3x fewer vector ops than accumulating all
        # six moments per (dy, dx) offset.
        rolled_y0 = pltpu.roll(lab_b, reach, 0)  # lab_b[p + (-reach, 0)]

        def dy_body(iy, carry):
            rolled_y = carry[0]  # lab_b[p + (dy, 0)], dy = iy - reach
            dy = iy - reach  # dy in [-reach, 0]
            fdy = dy.astype(jnp.float32)
            cnt, sx, sy = carry[1:4]
            if second_moments:
                sxx, syy, sxy = carry[4:]
            r_cnt = jnp.zeros((h, w), jnp.float32)
            r_sx = jnp.zeros((h, w), jnp.float32)
            r_sxx = jnp.zeros((h, w), jnp.float32) if second_moments else None
            for ix in range(2 * reach + 1):
                dx = ix - reach
                nb = pltpu.roll(rolled_y, (w - dx) % w, 1)  # lab_b[p + (dy, dx)]
                samef = (nb == lab_b).astype(jnp.float32)
                fdx = jnp.float32(dx)
                r_cnt = r_cnt + samef
                r_sx = r_sx + fdx * samef
                if second_moments:
                    r_sxx = r_sxx + (fdx * fdx) * samef
            cnt = cnt + r_cnt
            sx = sx + r_sx
            sy = sy + fdy * r_cnt
            out = (cnt, sx, sy)
            if second_moments:
                sxx = sxx + r_sxx
                syy = syy + (fdy * fdy) * r_cnt
                sxy = sxy + fdy * r_sx
                out = out + (sxx, syy, sxy)
            return (pltpu.roll(rolled_y, h - 1, 0),) + out

        acc_out = jax.lax.fori_loop(0, reach + 1, dy_body, (rolled_y0,) + init)
        acc_out = acc_out[1:]
        cnt, sx, sy = acc_out[:3]
        if second_moments:
            sxx, syy, sxy = acc_out[3:]

        # BBox extrema by same-label min/max propagation (post-
        # convergence): extrema flow along in-component paths, and every
        # member reached the root's label in <= `sweeps` steps, so
        # `sweeps` more sweeps deliver every member's coordinates to the
        # root.  8 ops per direction instead of 8 per window offset
        # (~2.6x fewer vector ops than accumulating bbox inside the
        # window loop above).  Values are ABSOLUTE pixel coordinates;
        # consumers only use differences / root-relative offsets.
        big = jnp.float32(1e9)
        xmin = jnp.where(fg, xs, big)
        xmax = jnp.where(fg, xs, -big)
        ymin = jnp.where(fg, ys, big)
        ymax = jnp.where(fg, ys, -big)

        def bbox_body(_, carry):
            xmin, xmax, ymin, ymax = carry
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                           (1, 1), (1, -1), (-1, 1), (-1, -1)):
                same = _shift2d(lab_b, dy, dx) == lab_b
                xmin = jnp.where(same, jnp.minimum(xmin, _shift2d(xmin, dy, dx)), xmin)
                xmax = jnp.where(same, jnp.maximum(xmax, _shift2d(xmax, dy, dx)), xmax)
                ymin = jnp.where(same, jnp.minimum(ymin, _shift2d(ymin, dy, dx)), ymin)
                ymax = jnp.where(same, jnp.maximum(ymax, _shift2d(ymax, dy, dx)), ymax)
            return (xmin, xmax, ymin, ymax)

        xmin, xmax, ymin, ymax = jax.lax.fori_loop(
            0, sweeps, bbox_body, (xmin, xmax, ymin, ymax)
        )

        lab_ref[:] = lab
        cnt_ref[:] = cnt
        sx_ref[:] = sx
        sy_ref[:] = sy
        xmin_ref[:] = xmin
        xmax_ref[:] = xmax
        ymin_ref[:] = ymin
        ymax_ref[:] = ymax
        if second_moments:
            sxx_ref[:] = sxx
            syy_ref[:] = syy
            sxy_ref[:] = sxy

        if topk:
            # In-kernel component top-k (replaces the XLA lax.top_k sort
            # over H*W elements, ~50 us at 192x256): iterative max with
            # lowest-flat-index tie-break — exactly lax.top_k's ordering
            # — over the root-ranking score blob.py builds (in-range
            # components lifted by +1e6, everything non-root scores 0).
            # k_cap serial reductions over a VMEM-resident map cost ~5 us.
            flat0 = flat - 1  # 0-based flat index
            min_area = roi_ref[0, 5]
            max_area = roi_ref[0, 6]
            is_root = lab == flat
            area_map = jnp.where(is_root, cnt, 0.0)
            in_range = (
                (area_map >= min_area) & (area_map <= max_area) & (area_map > 0)
            )
            score = jnp.where(in_range, area_map + jnp.float32(1e6), area_map)
            oob = jnp.int32(h * w)

            col = jax.lax.broadcasted_iota(jnp.int32, (1, topk), 1)

            def pick(t, carry):
                score, acc = carry
                m = jnp.max(score)
                cand = jnp.where(score == m, flat0, oob)
                idx_t = jnp.min(cand)
                score = jnp.where(flat0 == idx_t, jnp.float32(-1.0), score)
                acc = jnp.where(col == t, idx_t, acc)
                return score, acc

            _, acc = jax.lax.fori_loop(
                0, topk, pick, (score, jnp.zeros((1, topk), jnp.int32))
            )
            topk_ref[...] = acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "active", "sweeps", "interpret", "second_moments", "topk"
    ),
)
def detect_stats_pallas(
    image: jnp.ndarray,
    roi: jnp.ndarray,
    threshold: float,
    sigma: float,
    active: bool = True,
    sweeps: int = 12,
    interpret: bool = False,
    second_moments: bool = True,
    topk: int = 0,
    min_area=None,
    max_area=None,
):
    """Fused threshold+blur+CC+moments.  Returns
    (labels i32, cnt, sum_dx, sum_dy, xmin, xmax, ymin, ymax) plus,
    when second_moments=True, (sum_dx2, sum_dy2, sum_dxdy) — all (H, W);
    component statistics are valid AT ROOT PIXELS (label == own index),
    offsets relative to the root (second moments feed the merged-blob
    splitter).  With topk > 0 (requires min_area/max_area, traced), a
    final (1, topk) i32 output holds the top-k component root indices
    under blob.py's ranking score — lax.top_k semantics, computed
    in-kernel."""
    taps = _gaussian_kernel_1d(sigma)
    kernel = _make_detect_kernel(
        taps, bool(active), int(sweeps), bool(second_moments), int(topk)
    )
    if topk:
        extras = jnp.stack(
            [jnp.asarray(min_area, jnp.float32), jnp.asarray(max_area, jnp.float32)]
        )
    else:
        extras = jnp.zeros((2,), jnp.float32)
    roi_smem = jnp.concatenate(
        [
            roi.astype(jnp.float32).reshape(4),
            jnp.asarray(threshold, jnp.float32).reshape(1),
            extras,
        ]
    ).reshape(1, 7)
    h, w = image.shape
    f32 = jnp.float32
    space = pl.ANY if interpret else pltpu.VMEM
    n_f32 = 10 if second_moments else 7
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.int32)] + [
        jax.ShapeDtypeStruct((h, w), f32) for _ in range(n_f32)
    ]
    out_specs = [pl.BlockSpec(memory_space=space) for _ in range(1 + n_f32)]
    if topk:
        out_shape.append(jax.ShapeDtypeStruct((1, topk), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=space))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec((1, 7), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(image.astype(jnp.float32), roi_smem)


@functools.partial(jax.jit, static_argnames=("sigma", "active", "interpret"))
def threshold_blur_pallas(
    image: jnp.ndarray,
    roi: jnp.ndarray,
    threshold: float,
    sigma: float,
    active: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ROI-mask + threshold + Gaussian blur.

    image: (H, W) float32; roi: (4,) [x0, y0, w, h].
    `interpret=True` runs the Pallas interpreter (for CPU tests).
    """
    taps = _gaussian_kernel_1d(sigma)
    kernel = _make_kernel(taps, bool(active))
    roi_smem = jnp.concatenate(
        [roi.astype(jnp.float32).reshape(4), jnp.asarray(threshold, jnp.float32).reshape(1)]
    ).reshape(1, 5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(image.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(image.astype(jnp.float32), roi_smem)
