from .blob import BlobParams, Detections, find_leds, determine_roi
from .faults import inject_faults
from .exposure import ExposureState, exposure_control

__all__ = [
    "BlobParams",
    "Detections",
    "find_leds",
    "determine_roi",
    "inject_faults",
    "ExposureState",
    "exposure_control",
]
