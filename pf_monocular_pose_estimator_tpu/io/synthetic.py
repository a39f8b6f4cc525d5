"""Synthetic LED-sequence generation (replaces rosbag replay).

The reference verifies by replaying recorded bags of a real LED-carrying
UAV against Vicon ground truth (SURVEY.md §4).  This module renders the
same kind of data synthetically: given a ground-truth trajectory and the
marker YAML cloud, it draws Gaussian LED splats at the *distorted* pixel
positions (the renderer inverts the detector's undistortion, so the full
detect -> undistort -> estimate chain is exercised end-to-end).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera, distort_pixels, project
from ..geometry.se3 import exp_se3


def render_frame(
    camera: Camera,
    pose: jnp.ndarray,
    markers_h: jnp.ndarray,
    blob_sigma: float = 1.6,
    intensity: float = 255.0,
    background: float = 0.0,
    marker_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render one (H, W) float32 frame of LED splats.

    pose: (4, 4) object->camera; markers_h: (M, 4) homogeneous.
    A splat's peak is `intensity` and its support comfortably exceeds the
    default detection threshold (240) within ~1.5 sigma.
    """
    uv = project(camera, pose, markers_h)  # undistorted
    uv_d = distort_pixels(camera, uv)  # where the sensor actually sees them
    in_front = (pose[:3, :] @ markers_h.T)[2] > 0.05
    if marker_mask is not None:
        in_front = in_front & marker_mask

    h, w = camera.height, camera.width
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    dx = xs - uv_d[:, 0][:, None, None]
    dy = ys - uv_d[:, 1][:, None, None]
    r2 = dx * dx + dy * dy
    splats = intensity * jnp.exp(-r2 / (2.0 * blob_sigma**2))
    splats = jnp.where(in_front[:, None, None], splats, 0.0)
    frame = background + jnp.sum(splats, axis=0)
    return jnp.clip(frame, 0.0, 255.0)


class SyntheticSequence(NamedTuple):
    """A rendered sequence with ground truth."""

    frames: jnp.ndarray  # (T, H, W) float32
    poses: jnp.ndarray  # (T, 4, 4) object->camera ground truth
    times: jnp.ndarray  # (T,)
    markers_h: jnp.ndarray  # (M, 4)


def make_orbit_sequence(
    camera: Camera,
    markers_h: jnp.ndarray,
    num_frames: int = 60,
    fps: float = 50.0,
    distance: float = 1.5,
    orbit_radius: float = 0.25,
    spin_rate: float = 0.8,
    blob_sigma: float = 1.6,
    seed: int = 0,
) -> SyntheticSequence:
    """A smooth orbit-and-spin trajectory in front of the camera.

    Mimics the UAV-vs-Vicon experiment geometry (~1-2 m range, 752x480,
    cf. BASELINE.md camera/resolution rows) with fully known ground truth.
    """
    t = np.arange(num_frames) / fps
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi)

    poses = []
    for ti in t:
        ang = 2 * np.pi * 0.15 * ti + phase
        twist = np.array(
            [
                orbit_radius * np.cos(ang),
                orbit_radius * 0.6 * np.sin(ang),
                0.15 * np.sin(0.7 * ang),
                0.25 * np.sin(spin_rate * ti),
                0.25 * np.cos(spin_rate * ti * 0.9),
                spin_rate * ti * 0.3,
            ],
            dtype=np.float32,
        )
        pose = np.array(exp_se3(jnp.asarray(twist)))
        pose[2, 3] += distance
        poses.append(pose)
    poses = jnp.asarray(np.stack(poses), jnp.float32)

    frames = jax.vmap(lambda p: render_frame(camera, p, markers_h, blob_sigma))(poses)
    return SyntheticSequence(
        frames=frames,
        poses=poses,
        times=jnp.asarray(t, jnp.float32),
        markers_h=markers_h,
    )


def demo_markers(dtype=jnp.float32) -> jnp.ndarray:
    """A 5-LED non-coplanar cloud in the demo YAML's size class
    (pf_mpe/marker_positions/demo_marker_positions.yaml; first four points
    from that file).  The fifth marker was chosen to maximise the minimum
    wrong-permutation reprojection residual (~4.4 px RMS at 1.4 m) — LED
    constellations must be asymmetric or pose recovery is ambiguous, as
    the reference README also stresses."""
    pts = np.array(
        [
            [0.0714, 0.0800, 0.0622],
            [0.0400, -0.0912, 0.0317],
            [-0.0647, -0.0879, 0.0830],
            [-0.0558, -0.0165, 0.0534],
            [0.0, 0.12, 0.0],
        ],
        dtype=np.float32,
    )
    return jnp.asarray(np.concatenate([pts, np.ones((5, 1), np.float32)], axis=1), dtype)


def default_camera(dtype=jnp.float32) -> Camera:
    """752x480 mvBlueFOX-class intrinsics (README.md:137-143)."""
    return Camera.create(
        fx=621.75,
        fy=621.39,
        cx=404.95,
        cy=238.26,
        dist=[-0.36, 0.13, 0.0005, -0.0005, 0.0],
        width=752,
        height=480,
        dtype=dtype,
    )
