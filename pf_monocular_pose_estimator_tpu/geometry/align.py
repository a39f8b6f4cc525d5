"""Rigid point-cloud alignment (Umeyama / Kabsch), batched.

Functional parity target: computeTransformation
(pose_estimator.cpp:2139-2161) — SVD fit of R, t between an object-frame
marker cloud and its mean reprojected camera-frame cloud.

Delta vs. the reference (documented, intentional): the reference computes
R = V U^T without the determinant sign correction, so a degenerate input
can return a reflection.  We apply the standard det-correction, which is a
strict robustness improvement and identical on all proper inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama_rigid(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Find T (..., 4, 4) with dst ~= R @ src + t.

    src, dst: (..., N, 3); weights: optional (..., N) non-negative mask.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    mu_src = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    mu_dst = jnp.sum(dst * w, axis=-2, keepdims=True) / wsum
    src_c = (src - mu_src) * jnp.sqrt(w)
    dst_c = (dst - mu_dst) * jnp.sqrt(w)
    # Cross-covariance (3,3): src_c^T @ dst_c, batched.
    h = jnp.einsum("...ni,...nj->...ij", src_c, dst_c)
    u, _, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(v @ ut)
    d = jnp.ones_like(v[..., :1, :]).at[..., 0, -1].set(det)
    rot = (v * d) @ ut
    t = mu_dst[..., 0, :] - (rot @ mu_src[..., 0, :, None])[..., 0]
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
