"""Annotated-frame rendering (host-side numpy).

Functional parity target: Visualization::createVisualizationImage
(pf_mpe_lib/src/visualization.cpp:39-289): per-particle orientation
trivectors scaled by normalised weight, body-frame axes of the estimated
pose, the ROI rectangle, detection circles colour-coded
true/false/occluded, and a "lost track" banner.

Output is an (H, W, 3) uint8 RGB array — the equivalent of the
`image_with_detections` topic, renderable only when requested (the
reference draws lazily when subscribed, monocular_pose_estimator.cpp:426).
"""

from __future__ import annotations

import numpy as np

from ..geometry.camera import Camera


_COLORS = {
    # Detection circles use the reference's colour code
    # (visualization.cpp:264-274): true detections green (radius 5),
    # injected/fake yellow (radius 8), occluded red (radius 8).
    "detection": (0, 255, 0),
    "injected": (255, 255, 0),
    "occluded": (255, 0, 0),
    "axis_x": (255, 0, 0),
    "axis_y": (0, 255, 0),
    "axis_z": (0, 0, 255),
    "roi": (0, 255, 255),
    "particle": (0, 160, 255),
}


def _draw_line(img, p0, p1, color):
    h, w, _ = img.shape
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1)
    ys = np.linspace(p0[1], p1[1], n + 1)
    xs = np.clip(np.round(xs).astype(int), 0, w - 1)
    ys = np.clip(np.round(ys).astype(int), 0, h - 1)
    img[ys, xs] = color


def _draw_circle(img, centre, radius, color):
    h, w, _ = img.shape
    ang = np.linspace(0, 2 * np.pi, max(int(radius * 6), 12))
    xs = np.clip(np.round(centre[0] + radius * np.cos(ang)).astype(int), 0, w - 1)
    ys = np.clip(np.round(centre[1] + radius * np.sin(ang)).astype(int), 0, h - 1)
    img[ys, xs] = color


def render_overlay(
    frame: np.ndarray,
    camera: Camera,
    result,
    particles: np.ndarray | None = None,
    weights: np.ndarray | None = None,
    max_particles: int = 64,
    axis_length: float = 0.1,
) -> np.ndarray:
    """Render the diagnostic overlay for one frame result.

    frame: (H, W) grayscale; result: tracker FrameResult;
    particles/weights: optional (N, 4, 4)/(N,) bank for trivectors.
    """
    img = np.stack([np.asarray(frame, np.uint8)] * 3, axis=-1)

    # ROI rectangle (visualization.cpp:237)
    x0, y0, w, h = np.asarray(result.roi)
    for a, b in [
        ((x0, y0), (x0 + w, y0)),
        ((x0 + w, y0), (x0 + w, y0 + h)),
        ((x0 + w, y0 + h), (x0, y0 + h)),
        ((x0, y0 + h), (x0, y0)),
    ]:
        _draw_line(img, a, b, _COLORS["roi"])

    # Detection circles, colour-coded as the reference does
    # (visualization.cpp:260-275): true=green r5, fake=yellow r8,
    # occluded=red r8.  Occluded detections have mask=False but their
    # coordinates remain in detections_xy, so they stay drawable.
    xy = np.asarray(result.detections_xy)
    mask = np.asarray(result.detections_mask)
    occluded = np.asarray(getattr(result, "detections_occluded", np.zeros_like(mask)))
    injected = np.asarray(getattr(result, "detections_injected", np.zeros_like(mask)))
    for i in range(xy.shape[0]):
        if occluded[i]:
            _draw_circle(img, xy[i], 8.0, _COLORS["occluded"])
        elif mask[i] and injected[i]:
            _draw_circle(img, xy[i], 8.0, _COLORS["injected"])
        elif mask[i]:
            _draw_circle(img, xy[i], 5.0, _COLORS["detection"])

    pose_ok = bool(np.asarray(result.pose_updated))
    if pose_ok:
        pose = np.asarray(result.pose)
        origin_h = np.array([0.0, 0.0, 0.0, 1.0])

        def proj(p4):
            pc = pose @ p4
            u = float(camera.fx) * pc[0] / pc[2] + float(camera.cx)
            v = float(camera.fy) * pc[1] / pc[2] + float(camera.cy)
            return (u, v)

        o = proj(origin_h)
        for axis, color in zip(np.eye(3) * axis_length, ("axis_x", "axis_y", "axis_z")):
            _draw_line(img, o, proj(np.append(axis, 1.0)), _COLORS[color])

        # particle orientation trivectors (visualization.cpp:162-222)
        if particles is not None and weights is not None:
            particles = np.asarray(particles)[:max_particles]
            wts = np.asarray(weights)[:max_particles]
            wmax = wts.max() if wts.size and wts.max() > 0 else 1.0
            for p, wt in zip(particles, wts):
                scale = axis_length * 0.5 * float(wt / wmax)
                if scale <= 0:
                    continue
                pc = p @ origin_h
                if pc[2] <= 0.05:
                    continue
                u = float(camera.fx) * pc[0] / pc[2] + float(camera.cx)
                v = float(camera.fy) * pc[1] / pc[2] + float(camera.cy)
                tip = p @ np.array([0.0, 0.0, scale, 1.0])
                tu = float(camera.fx) * tip[0] / tip[2] + float(camera.cx)
                tv = float(camera.fy) * tip[1] / tip[2] + float(camera.cy)
                _draw_line(img, (u, v), (tu, tv), _COLORS["particle"])
    else:
        # "Lost track" banner (visualization.cpp:283-286): red top border
        img[:6, :] = (255, 0, 0)

    return img
