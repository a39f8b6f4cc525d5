"""Pinhole camera with plumb-bob distortion, batched JAX ops.

Functional parity targets in the reference:
  * pinhole projection  K @ T @ X      — pose_estimator.cpp:1017-1034
  * forward distortion (plumb bob)     — led_detector.cpp:371-414
  * undistortion (cv::undistortPoints) — led_detector.cpp:198-199
  * pixel -> unit bearing rays         — pose_estimator.cpp:1072-1085

Convention: `T` is the object->camera transform (the reference's
`predicted_pose_`); image points are *undistorted* pixel coordinates, as in
the reference where detections are undistorted right after blob extraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + plumb-bob distortion.

    fx, fy, cx, cy : scalars (float arrays)
    dist           : (5,) [k1, k2, p1, p2, k3]
    width, height  : static ints (image size in pixels)
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray
    width: int = 752
    height: int = 480

    @classmethod
    def create(cls, fx, fy, cx, cy, dist=None, width=752, height=480, dtype=jnp.float32):
        if dist is None:
            dist = jnp.zeros((5,), dtype=dtype)
        return cls(
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype),
            cy=jnp.asarray(cy, dtype),
            dist=jnp.asarray(dist, dtype),
            width=int(width),
            height=int(height),
        )

    @property
    def k_matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


def project(camera: Camera, transform: jnp.ndarray, points_h: jnp.ndarray) -> jnp.ndarray:
    """Project homogeneous object points to undistorted pixels.

    transform: (..., 4, 4) object->camera;  points_h: (..., M, 4)
    returns (..., M, 2).  Mirrors project2d (pose_estimator.cpp:1017-1034).
    Leading dims of transform and points broadcast: a particle bank
    (N, 4, 4) against shared markers (M, 4) yields (N, M, 2).
    """
    cam_pts = jnp.einsum("...ij,...mj->...mi", transform[..., :3, :], points_h)
    z = cam_pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = camera.fx * cam_pts[..., 0] / safe_z + camera.cx
    v = camera.fy * cam_pts[..., 1] / safe_z + camera.cy
    return jnp.stack([u, v], axis=-1)


def project_points(camera: Camera, transform: jnp.ndarray, points_xyz: jnp.ndarray) -> jnp.ndarray:
    """Same as `project` for non-homogeneous (..., M, 3) points."""
    ones = jnp.ones_like(points_xyz[..., :1])
    return project(camera, transform, jnp.concatenate([points_xyz, ones], axis=-1))


def _distort_normalized(camera: Camera, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply plumb-bob model to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (camera.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_pixels(camera: Camera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel coords -> distorted pixel coords (..., 2).

    The manual forward plumb-bob model of led_detector.cpp:371-414.
    """
    x = (pixels[..., 0] - camera.cx) / camera.fx
    y = (pixels[..., 1] - camera.cy) / camera.fy
    xy_d = _distort_normalized(camera, jnp.stack([x, y], axis=-1))
    u = xy_d[..., 0] * camera.fx + camera.cx
    v = xy_d[..., 1] * camera.fy + camera.cy
    return jnp.stack([u, v], axis=-1)


def undistort_pixels(camera: Camera, pixels: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted pixel coords (..., 2).

    Replaces cv::undistortPoints (led_detector.cpp:198-199) with the same
    fixed-point iteration OpenCV uses: repeatedly divide out the radial
    term and subtract the tangential term.  `iters` is static so the loop
    unrolls under jit (shape-stable, no host sync).
    """
    k1, k2, p1, p2, k3 = (camera.dist[i] for i in range(5))
    xd = (pixels[..., 0] - camera.cx) / camera.fx
    yd = (pixels[..., 1] - camera.cy) / camera.fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        safe = jnp.where(jnp.abs(radial) < 1e-12, 1e-12, radial)
        x = (xd - dx) / safe
        y = (yd - dy) / safe
    u = x * camera.fx + camera.cx
    v = y * camera.fy + camera.cy
    return jnp.stack([u, v], axis=-1)


def bearing_vectors(camera: Camera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels (..., 2) -> unit bearing rays (..., 3).

    Mirrors calculateImageVectors (pose_estimator.cpp:1072-1085).
    """
    x = (pixels[..., 0] - camera.cx) / camera.fx
    y = (pixels[..., 1] - camera.cy) / camera.fy
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
