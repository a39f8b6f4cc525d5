from .state import TargetState, FrameResult
from .init_search import brute_force_histogram, correspondences_from_histogram
from .check import check_correspondences
from .initialise import initialise
from .short_p3p import short_p3p
from .step import tracker_step, make_tracker

__all__ = [
    "TargetState",
    "FrameResult",
    "brute_force_histogram",
    "correspondences_from_histogram",
    "check_correspondences",
    "initialise",
    "short_p3p",
    "tracker_step",
    "make_tracker",
]
