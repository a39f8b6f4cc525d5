from .se3 import skew, exp_se3, log_se3, inverse, compose, rotation_rpy
from .camera import (
    Camera,
    project,
    project_points,
    distort_pixels,
    undistort_pixels,
    bearing_vectors,
)
from .align import umeyama_rigid

__all__ = [
    "skew",
    "exp_se3",
    "log_se3",
    "inverse",
    "compose",
    "rotation_rpy",
    "Camera",
    "project",
    "project_points",
    "distort_pixels",
    "undistort_pixels",
    "bearing_vectors",
    "umeyama_rigid",
]
