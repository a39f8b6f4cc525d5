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


def _make_kernel(taps: np.ndarray, threshold: float, active: bool):
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
        thr = jnp.float32(threshold)
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


@functools.partial(jax.jit, static_argnames=("threshold", "sigma", "active", "interpret"))
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
    kernel = _make_kernel(taps, float(threshold), bool(active))
    roi_smem = roi.astype(jnp.float32).reshape(1, 4)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(image.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(image.astype(jnp.float32), roi_smem)
