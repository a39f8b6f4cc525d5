from .synthetic import render_frame, SyntheticSequence, make_orbit_sequence
from .markers import load_marker_positions, load_camera_calibration
from .metrics import absolute_trajectory_error, orientation_error_deg
from .viz import render_overlay

__all__ = [
    "render_frame",
    "SyntheticSequence",
    "make_orbit_sequence",
    "load_marker_positions",
    "load_camera_calibration",
    "absolute_trajectory_error",
    "orientation_error_deg",
    "render_overlay",
]
